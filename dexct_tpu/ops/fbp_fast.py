"""Packed multi-image fan-beam backprojection — the TPU fast path.

All sinograms of a DE study (two log sinograms + two basis-material
sinograms) share identical backprojection geometry.  This op computes the
per-(view, pixel) channel coordinate ONCE and fetches, with a single
row-slice gather, both linear-interpolation taps of ALL K images: the
packed table row (v, c) holds ``(q_k[c] ..., q_k[c+1] ...)`` for k < K.
Row-slice gathers on this TPU cost the same as scalar gathers (~1e9 idx/s,
measured in tools/bench_gather.py), so the whole 4-image reconstruction
costs ~N_proj * N_matrix^2 gathers instead of 8x that many.

Same math as ops/fbp.fan_backproject (Kak & Slaney equiangular weighting);
validated against it in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_filtered",
    "fan_backproject_multi",
    "parallel_rebin_plan",
    "rebin_to_parallel",
    "parallel_backproject_multi",
]


def pack_filtered(qs):
    """[K, V, C] filtered sinograms -> packed [V*C, 2K] tap table."""
    K, V, C = qs.shape
    q_next = jnp.concatenate([qs[..., 1:], qs[..., -1:]], axis=-1)
    # row (v, c) = (q_0[c..], .., q_{K-1}[c], q_0[c+1], .., q_{K-1}[c+1])
    packed = jnp.concatenate([qs, q_next], axis=0)  # [2K, V, C]
    return packed.transpose(1, 2, 0).reshape(V * C, 2 * K)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "n_channels", "n_matrix", "view_block"),
)
def fan_backproject_multi(packed, n_images, betas, sid, dgamma, n_channels,
                          n_matrix, fov, dbeta, *, view_block=32):
    """Backproject K images from a packed tap table.

    packed: [V*C, 2K] from :func:`pack_filtered` (K = n_images static).
    Returns [K, n_matrix, n_matrix].
    """
    K = n_images
    dtype = packed.dtype
    V = betas.shape[0]
    C = n_channels
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix)).reshape(-1)
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix)).reshape(-1)

    n_blocks = -(-V // view_block)
    pad = n_blocks * view_block - V
    bp = jnp.pad(betas.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((V,), dtype), (0, pad))
    bb = bp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(V, 1))).reshape(n_blocks, view_block) * C

    def block(acc, args):
        beta, wv, vo = args  # [B], [B], [B]
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        vr = X[None, :] * cb[:, None] + Y[None, :] * sb[:, None] - sid
        vt = -X[None, :] * sb[:, None] + Y[None, :] * cb[:, None]
        gamma = jnp.arctan2(-vt, -vr)
        inv_l2 = 1.0 / (vr * vr + vt * vt)
        c = gamma / dgamma - 0.5 + C / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, C - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= C - 1.0)
        w = jnp.where(inside, inv_l2, 0.0) * wv[:, None]  # [B, P]
        idx = vo[:, None] + c0.astype(jnp.int32)  # [B, P]
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (2 * K,))
        taps = rows[..., :K] * (1.0 - f)[..., None] \
            + rows[..., K:] * f[..., None]  # [B, P, K]
        acc = acc + jnp.einsum("bp,bpk->kp", w, taps,
                               precision=jax.lax.Precision.HIGHEST)
        return acc, None

    acc0 = jnp.zeros((K, n_matrix * n_matrix), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, wb, voff))
    return (acc * dbeta).reshape(K, n_matrix, n_matrix)


# ---------------------------------------------------------------------------
# Rebinned parallel-beam reconstruction (the fastest recon path)
# ---------------------------------------------------------------------------
#
# A full 2π equiangular fan acquisition samples every line twice; rebinning
# to parallel coordinates (θ = β + γ - π/2 ∈ [0, π), t = SID sin γ) halves
# the backprojected views and averages the redundant copies.  Parallel
# backprojection needs no arctan/1/L² — the channel coordinate is AFFINE in
# the pixel coordinates — so the per-view cost collapses to one packed
# gather plus a handful of VPU ops.  This is the standard rebinned-FBP of
# commercial scanners (slight resolution trade documented in tests).


def parallel_rebin_plan(geometry, n_theta=512, nt=1024, t_max=None):
    """Host tables mapping a fan sinogram onto a (θ, t) parallel grid.

    Returns (idx [nθ*nt, 8], w [nθ*nt, 8], t0, dt): for each parallel bin,
    the two redundant fan samples (bilinear in β and γ, averaged).
    """
    if abs(geometry.rotation_total - 2.0 * np.pi) > 1e-3:
        raise ValueError(
            "parallel rebinning requires a full 2*pi fan acquisition "
            f"(rotation_total={geometry.rotation_total}); use the direct "
            "fan backprojector for partial scans"
        )
    sid = geometry.SID
    v, c = geometry.N_proj, geometry.N_channels
    dgamma = geometry.dgamma
    dbeta = geometry.rotation_total / v
    gam_lim = geometry.gamma_fan / 2.0
    if t_max is None:
        t_max = sid * np.sin(gam_lim)
    dt = 2.0 * t_max / nt
    t0 = -t_max + 0.5 * dt
    thetas = np.arange(n_theta) * (np.pi / n_theta)
    ts = t0 + dt * np.arange(nt)

    tt, th = np.meshgrid(ts, thetas)  # [nθ, nt]
    sin_g = np.clip(tt / sid, -1.0, 1.0)
    gam = np.arcsin(sin_g)
    valid = np.abs(gam) <= gam_lim

    def fan_taps(beta, gamma):
        """Bilinear taps of (beta [wraps], gamma [clamped]) -> idx, w x4."""
        fb = np.mod(beta, 2.0 * np.pi) / dbeta
        ib0 = np.floor(fb).astype(np.int64)
        wb1 = fb - ib0
        ib1 = np.mod(ib0 + 1, v)
        ib0 = np.mod(ib0, v)
        fg = gamma / dgamma - 0.5 + c / 2.0
        ig0 = np.clip(np.floor(fg), 0, c - 2).astype(np.int64)
        wg1 = np.clip(fg - ig0, 0.0, 1.0)
        idx = np.stack([
            ib0 * c + ig0, ib0 * c + ig0 + 1,
            ib1 * c + ig0, ib1 * c + ig0 + 1,
        ], -1)
        w = np.stack([
            (1 - wb1) * (1 - wg1), (1 - wb1) * wg1,
            wb1 * (1 - wg1), wb1 * wg1,
        ], -1)
        return idx, w

    # copy A: (β = θ - γ + π/2, γ); copy B: the conjugate ray
    # (β' = θ + γ + 3π/2, γ' = -γ)
    idx_a, w_a = fan_taps(th - gam + np.pi / 2.0, gam)
    idx_b, w_b = fan_taps(th + gam + 1.5 * np.pi, -gam)
    idx = np.concatenate([idx_a, idx_b], -1).reshape(-1, 8)
    w = 0.5 * np.concatenate([w_a, w_b], -1).reshape(-1, 8)
    w = w * valid.reshape(-1, 1)
    return (idx.astype(np.int32), w.astype(np.float32), float(t0),
            float(dt))


@functools.partial(jax.jit, static_argnames=("nt",))
def rebin_to_parallel(sinos, idx, w, nt):
    """[K, V, C] fan sinograms -> [K, nθ, nt] parallel sinograms.

    nθ is inferred from the table length (idx rows / nt), so θ-sharded
    tables under shard_map produce the local wedge.
    """
    k = sinos.shape[0]
    n_theta = idx.shape[0] // nt
    table = sinos.reshape(k, -1).T  # [V*C, K]
    rows = table[idx.reshape(-1)].reshape(-1, 8, k)
    vals = jnp.einsum("rt,rtk->rk", w, rows,
                     precision=jax.lax.Precision.HIGHEST)
    return vals.T.reshape(k, n_theta, nt)


@functools.partial(
    jax.jit,
    static_argnames=("n_images", "nt", "n_matrix", "fov", "view_block",
                     "fov_mask"),
)
def parallel_backproject_multi(packed, n_images, thetas, t0, dt, nt,
                               n_matrix, fov, dtheta, *, view_block=64,
                               fov_mask=True):
    """Backproject K images from packed parallel-beam taps.

    packed: [nθ*nt, 2K] from :func:`pack_filtered` of the filtered
    parallel sinograms.  Channel coordinate per (θ, pixel) is affine:
    c = (x cosθ + y sinθ - t0) / dt.

    fov_mask=True backprojects only pixels inside the scan FOV circle
    (r <= fov/2; ~21% fewer gathers on the inscribed square) and zeroes
    the corners — the standard circular-FOV convention.
    """
    K = n_images
    dtype = packed.dtype
    n_th = thetas.shape[0]
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix)).reshape(-1)
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix)).reshape(-1)

    pix_idx = None
    if fov_mask:
        # static in-circle pixel list (host-computed from static shapes)
        c_np = (np.arange(n_matrix) + 0.5 - half) * px_size
        rr = np.hypot(c_np[None, :], c_np[:, None]).reshape(-1)
        inside = np.nonzero(rr <= fov / 2.0)[0]
        pad_to = -(-len(inside) // 8) * 8
        pix = np.pad(inside, (0, pad_to - len(inside)),
                     constant_values=inside[-1] if len(inside) else 0)
        pix_idx = jnp.asarray(pix.astype(np.int32))
        X = X[pix_idx]
        Y = Y[pix_idx]

    n_blocks = -(-n_th // view_block)
    pad = n_blocks * view_block - n_th
    thp = jnp.pad(thetas.astype(dtype), (0, pad))
    vw = jnp.pad(jnp.ones((n_th,), dtype), (0, pad))
    tb = thp.reshape(n_blocks, view_block)
    wb = vw.reshape(n_blocks, view_block)
    voff = (jnp.arange(n_blocks * view_block, dtype=jnp.int32)
            % jnp.int32(max(n_th, 1))).reshape(n_blocks, view_block) * nt

    def block(acc, args):
        th, wv, vo = args
        ct_, st_ = jnp.cos(th), jnp.sin(th)
        c = (X[None, :] * ct_[:, None] + Y[None, :] * st_[:, None]
             - t0) / dt
        c0 = jnp.clip(jnp.floor(c), 0, nt - 2)
        f = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= nt - 1.0)
        w = jnp.where(inside, 1.0, 0.0) * wv[:, None]
        idx = vo[:, None] + c0.astype(jnp.int32)
        rows = packed[idx.reshape(-1)].reshape(idx.shape + (2 * K,))
        taps = rows[..., :K] * (1.0 - f)[..., None] \
            + rows[..., K:] * f[..., None]
        return acc + jnp.einsum("bp,bpk->kp", w, taps,
                               precision=jax.lax.Precision.HIGHEST), None

    acc0 = jnp.zeros((K, X.shape[0]), dtype)
    acc, _ = jax.lax.scan(block, acc0, (tb, wb, voff))
    acc = acc * dtheta
    if pix_idx is not None:
        full = jnp.zeros((K, n_matrix * n_matrix), dtype)
        acc = full.at[:, pix_idx].set(acc)
    return acc.reshape(K, n_matrix, n_matrix)
