"""Fan-beam filtered back-projection on TPU.

Rebuild of the reference's (missing) ``xtomosim.back_project.get_recon``
(interface pinned at /root/reference/main.py:134; algorithm per README.md:31
and SURVEY.md §3.4): cos(gamma) pre-weighting, FFT ramp/sinc filtering, and
distance-weighted backprojection with linear channel interpolation
(Kak & Slaney ch. 3.4, equiangular geometry).

TPU design: filtering is a batched real FFT over views (XLA); the
backprojection accumulates over view blocks with a ``lax.scan`` whose body
vmaps all image pixels — gathers hit a per-view 1-D filtered profile that
fits in VMEM.  No host round-trips between views (BASELINE.json north star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import filter_frequency_response

__all__ = ["filter_sinogram", "fan_backproject", "fbp_recon", "hu_image"]


def filter_sinogram(sino, geometry, ramp=0.8, window="sinc",
                    dtype=jnp.float32):
    """cos-weight + windowed-ramp filter each view (host-built response).

    sino: [N_proj, N_channels] log sinogram.  Returns same shape, filtered,
    scaled by dgamma (the discrete convolution measure).
    """
    n_ch = geometry.N_channels
    dgamma = geometry.dgamma
    H, m = filter_frequency_response(n_ch, dgamma, ramp, window, "fan")
    gammas = jnp.asarray(geometry.gammas, dtype)
    w = jnp.cos(gammas) * geometry.SID
    Hj = jnp.asarray(H, dtype)  # real windowed-ramp response
    return _filter_jit(jnp.asarray(sino, dtype), w, Hj, m, dgamma)


@functools.partial(jax.jit, static_argnames=("m",))
def _filter_jit(sino, w, H, m, dgamma):
    n_ch = sino.shape[-1]
    pw = sino * w  # [V, C] pre-weighted
    spec = jnp.fft.rfft(pw, n=m, axis=-1)
    filt = jnp.fft.irfft(spec * H, n=m, axis=-1)[..., :n_ch]
    return (filt * dgamma).astype(sino.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_matrix", "view_block")
)
def fan_backproject(q, betas, sid, dgamma, n_matrix, fov, *, view_block=64,
                    dbeta=None):
    """Distance-weighted equiangular backprojection.

    q:     [N_proj, N_channels] filtered sinogram
    betas: [N_proj] view angles
    dbeta: view angular spacing; defaults to 2 pi / N_proj.  Pass the
        GLOBAL spacing when backprojecting a view shard under shard_map
        (each shard then contributes its wedge and partial images psum).
    Returns image [n_matrix, n_matrix] in the phantom index convention
    (image[iy, ix] at world x=(ix+0.5-N/2)*px, y=(iy+0.5-N/2)*px).
    """
    dtype = q.dtype
    n_proj, n_ch = q.shape
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix))
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix))

    # pad views to a multiple of the block size with zero weight
    n_blocks = -(-n_proj // view_block)
    pad = n_blocks * view_block - n_proj
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    bp = jnp.pad(betas.astype(dtype), (0, pad))
    valid = jnp.pad(jnp.ones((n_proj,), dtype), (0, pad))
    qb = qp.reshape(n_blocks, view_block, n_ch)
    bb = bp.reshape(n_blocks, view_block)
    vb = valid.reshape(n_blocks, view_block)

    def view_contrib(qv, beta, v):
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        # pixel position relative to the source, in the source frame
        vr = X * cb + Y * sb - sid  # radial (along e_r)
        vt = -X * sb + Y * cb  # tangential (along e_t)
        gamma = jnp.arctan2(-vt, -vr)
        L2 = vr * vr + vt * vt
        c = gamma / dgamma - 0.5 + n_ch / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, n_ch - 2).astype(jnp.int32)
        fc = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= n_ch - 1.0)
        qi = qv[c0] * (1.0 - fc) + qv[c0 + 1] * fc
        return jnp.where(inside, qi / L2, 0.0) * v

    def block(acc, args):
        qv, bv, vv = args
        contrib = jax.vmap(view_contrib)(qv, bv, vv)  # [B, N, N]
        return acc + contrib.sum(0), None

    init = jnp.zeros((n_matrix, n_matrix), dtype)
    img, _ = jax.lax.scan(block, init, (qb, bb, vb))
    if dbeta is None:
        dbeta = 2.0 * jnp.pi / n_proj if n_proj else 0.0
    return img * dbeta


def parker_weights(geometry):
    """Short-scan redundancy weights W[view, channel] (Parker 1982).

    A fan-beam scan over pi + gamma_fan measures part of Radon space twice;
    Parker's smooth weights make the doubly-covered region sum to one so
    FBP stays quantitative.  Full scans (2 pi) return uniform 1/1 weights
    scaled for double coverage handled by dbeta; scans shorter than
    pi + gamma_fan raise (insufficient data).
    """
    two_pi = 2.0 * np.pi
    rot = float(geometry.rotation_total)
    gam_fan = float(geometry.gamma_fan)
    if rot >= two_pi - 1e-6:
        return np.ones((geometry.N_proj, geometry.N_channels))
    short = np.pi + gam_fan
    if rot < short - 1e-6:
        raise ValueError(
            f"rotation_total={rot:.4f} < pi + fan angle ({short:.4f}): "
            "not enough data for fan-beam FBP"
        )
    betas = geometry.betas  # [V], starting at 0
    gammas = geometry.gammas  # [C]
    B, G = np.meshgrid(betas, gammas, indexing="ij")
    gm = gam_fan / 2.0
    w = np.ones_like(B)
    # start-of-scan wedge: beta in [0, gamma_fan - 2 gamma)
    lo = gam_fan - 2.0 * G
    with np.errstate(invalid="ignore", divide="ignore"):
        ws = np.sin(np.pi / 4.0 * B / np.maximum(gm - G, 1e-9)) ** 2
        we = np.sin(np.pi / 4.0 * (np.pi + gam_fan - B)
                    / np.maximum(gm + G, 1e-9)) ** 2
    w = np.where(B < lo, ws, w)
    w = np.where(B > np.pi - 2.0 * G, we, w)
    w = np.clip(w, 0.0, 1.0)
    # views beyond the short-scan range contribute nothing
    w = np.where(B > np.pi + gam_fan, 0.0, w)
    # dbeta in the backprojector assumes full-2pi double coverage
    # (img * dbeta with dbeta = rot/V and each line counted twice over
    # 2pi); short scans count each line once, so weights double
    return 2.0 * w


def hu_image(recon_raw, mu_water_eff):
    """cm^-1 -> Hounsfield units (formula pinned at plots.py:140-143)."""
    return 1000.0 * (recon_raw - mu_water_eff) / mu_water_eff


def fbp_recon(sino_log, geometry, n_matrix, fov, ramp=0.8, window="sinc",
              mu_water_eff=None, dtype=jnp.float32):
    """Full FBP: returns (recon_raw [1/cm], recon_HU or None).

    Dispatches on the geometry type: equiangular fan beam (the reference's
    scanner) or parallel beam (this framework's extension).  The reference
    signature ``get_recon(sino_log, ct, spec, N_matrix, FOV, ramp)``
    (main.py:134) is provided in :mod:`dexct_tpu.pipeline.api`; this is
    the array-level op.
    """
    from ..system.geometry import ParallelBeamGeometry

    if isinstance(geometry, ParallelBeamGeometry):
        img = parallel_fbp(sino_log, geometry, n_matrix, fov, ramp,
                           window, dtype)
    elif getattr(geometry, "ffs", "none") != "none":
        # deflected-spot views break the uniform-gamma fan assumption of
        # the direct backprojector (a ~0.8-channel effective shift);
        # FFS data reconstructs through the interleaved parallel rebin
        from .ffs import ffs_fbp_recon

        img = ffs_fbp_recon(sino_log, geometry, n_matrix, fov, ramp,
                            window, dtype=dtype)
    else:
        sino_log = jnp.asarray(sino_log, dtype)
        if geometry.rotation_total < 2.0 * np.pi - 1e-6:
            # short-scan redundancy weighting (Parker)
            sino_log = sino_log * jnp.asarray(parker_weights(geometry),
                                              dtype)
        q = filter_sinogram(sino_log, geometry, ramp, window, dtype)
        img = fan_backproject(
            q,
            jnp.asarray(geometry.betas, dtype),
            float(geometry.SID),
            float(geometry.dgamma),
            int(n_matrix),
            float(fov),
            dbeta=float(geometry.rotation_total) / geometry.N_proj,
        )
    if mu_water_eff is None:
        return img, None
    return img, hu_image(img, mu_water_eff)


def parallel_fbp(sino_log, geometry, n_matrix, fov, ramp=0.8,
                 window="sinc", dtype=jnp.float32):
    """Parallel-beam FBP over the geometry's angular coverage."""
    from .fbp_fast import pack_filtered, parallel_backproject_multi

    nt = geometry.N_channels
    ds = geometry.ds
    H, m = filter_frequency_response(nt, ds, ramp, window, "parallel")
    q = _filter_jit(jnp.asarray(sino_log, dtype)[None],
                    jnp.ones((nt,), dtype), jnp.asarray(H, dtype), m, ds)
    t0 = float(geometry.s_positions[0])
    # each line is counted rotation_total/pi times over the scan
    dtheta = float(geometry.rotation_total) / geometry.N_proj \
        * (jnp.pi / geometry.rotation_total)
    img = parallel_backproject_multi(
        pack_filtered(q), 1, jnp.asarray(geometry.betas, dtype), t0,
        float(ds), nt, int(n_matrix), float(fov), float(dtheta),
    )
    return img[0]
