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
    else:
        q = filter_sinogram(sino_log, geometry, ramp, window, dtype)
        img = fan_backproject(
            q,
            jnp.asarray(geometry.betas, dtype),
            float(geometry.SID),
            float(geometry.dgamma),
            int(n_matrix),
            float(fov),
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
