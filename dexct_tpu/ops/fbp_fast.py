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

__all__ = ["pack_filtered", "fan_backproject_multi"]


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
        acc = acc + jnp.einsum("bp,bpk->kp", w, taps)
        return acc, None

    acc0 = jnp.zeros((K, n_matrix * n_matrix), dtype)
    acc, _ = jax.lax.scan(block, acc0, (bb, wb, voff))
    return (acc * dbeta).reshape(K, n_matrix, n_matrix)
