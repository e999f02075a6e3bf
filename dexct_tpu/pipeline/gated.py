"""Gated (4-D) reconstruction: phase-binned weighted FBP for periodic
motion over multi-rotation scans.

Cardiac/respiratory CT acquires SEVERAL rotations while the object
moves quasi-periodically, then reconstructs each motion PHASE from the
views acquired near it — trading dose/time for frozen-motion frames.
The framework pieces compose directly: the motion module simulates the
periodic pose, the acquisition is one long `rotation_total = R * 2*pi`
scan, and this module adds the gating:

* ``gate_weights`` — a raised-cosine window on the per-view phase;
* ``gated_fbp_recon`` — filtered backprojection with per-view gate
  weights and PER-PIXEL accumulated-weight normalization (the same
  num/den device pattern as the helical gFDK): each pixel divides by
  the gate weight that actually reached it, so non-contiguous view
  subsets and fan-edge coverage normalize instead of shading.  With
  all-ones weights it reduces to the standard full-scan FBP average
  over the rotations.

The gate window must be chosen against the rotation period: views of
one gate spread over all angles only when the motion period is
incommensurate with the rotation (else the gate sees a fixed angular
wedge — the classic limited-angle gating artifact, demonstrable here
by setting ``period_views`` equal to the views per rotation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fbp import filter_sinogram

__all__ = ["view_phases", "gate_weights", "gated_fbp_recon",
           "gated_series"]


def view_phases(n_views, period_views, phase0=0.0):
    """Motion phase in [0, 1) per view for a ``period_views``-periodic
    signal."""
    return np.mod(np.arange(n_views) / float(period_views) + phase0,
                  1.0)


def gate_weights(phases, center, width=0.2):
    """Raised-cosine gate [V]: weight 1 at ``center`` falling to 0 at
    phase distance ``width/2`` (circular distance)."""
    d = np.abs(np.mod(phases - center + 0.5, 1.0) - 0.5)
    return 0.5 * (1.0 + np.cos(np.pi * np.clip(2.0 * d / width, 0.0,
                                               1.0)))


def gated_fbp_recon(sino_log, geometry, n_matrix, fov, weights,
                    ramp=0.8, window="sinc", dtype=jnp.float32,
                    view_block=64):
    """Weighted fan-beam FBP with accumulated-weight normalization.

    weights: [V] per-view gate weights.  Filtering is per view (gate
    weights scale whole views, so they commute with the channel-axis
    ramp); backprojection accumulates ``w * q / L^2`` and normalizes
    per pixel by the accumulated ``w`` over in-fan views, scaled so the
    all-ones gate over ``R`` rotations equals the standard single-turn
    FBP (the multi-rotation average).
    """
    ct = geometry
    q = filter_sinogram(jnp.asarray(sino_log, dtype), ct, ramp, window,
                        dtype)
    return _gated_backproject(
        q, jnp.asarray(ct.betas, dtype), jnp.asarray(weights, dtype),
        float(ct.SID), float(ct.dgamma), int(n_matrix), float(fov),
        view_block=int(view_block))


@functools.partial(
    jax.jit, static_argnames=("n_matrix", "fov", "view_block"))
def _gated_backproject(q, betas, w, sid, dgamma, n_matrix, fov, *,
                       view_block=64):
    # NOTE: intentionally mirrors ops/fbp.fan_backproject's geometry
    # (same gamma/clip/bilinear conventions) plus per-view weights and
    # the num/den normalization; the production backprojector is kept
    # untouched because its bit-identical outputs are pinned
    dtype = q.dtype
    n_proj, n_ch = q.shape
    px_size = float(fov) / int(n_matrix)
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix))
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix))

    n_blocks = -(-n_proj // view_block)
    pad = n_blocks * view_block - n_proj
    qb = jnp.pad(q, ((0, pad), (0, 0))).reshape(n_blocks, view_block,
                                                n_ch)
    bb = jnp.pad(betas, (0, pad)).reshape(n_blocks, view_block)
    wb = jnp.pad(w, (0, pad)).reshape(n_blocks, view_block)

    def view_contrib(qv, beta, wv):
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        vr = X * cb + Y * sb - sid
        vt = -X * sb + Y * cb
        gamma = jnp.arctan2(-vt, -vr)
        L2 = vr * vr + vt * vt
        c = gamma / dgamma - 0.5 + n_ch / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, n_ch - 2).astype(jnp.int32)
        fc = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= n_ch - 1.0)
        qi = qv[c0] * (1.0 - fc) + qv[c0 + 1] * fc
        contrib = jnp.where(inside, qi / L2, 0.0) * wv
        den = jnp.where(inside, 1.0, 0.0) * wv
        return contrib, den

    def block(carry, args):
        num, den = carry
        qv, bv, wv = args
        cn, cd = jax.vmap(view_contrib)(qv, bv, wv)
        return (num + cn.sum(0), den + cd.sum(0)), None

    acc0 = (jnp.zeros((n_matrix, n_matrix), dtype),
            jnp.zeros((n_matrix, n_matrix), dtype))
    (num, den), _ = jax.lax.scan(block, acc0, (qb, bb, wb))
    # scale: num/den is the weighted MEAN per-view contribution; x 2*pi
    # recovers the angular integral — with all-ones weights over R full
    # rotations this is exactly the standard single-turn dbeta sum
    # (the R-fold redundancy averages out in the mean)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0) \
        * (2.0 * jnp.pi)


def gated_series(sino_log, geometry, n_matrix, fov, period_views, *,
                 n_gates=4, width=0.3, phase0=0.0, ramp=0.8,
                 window="sinc"):
    """Reconstruct ``n_gates`` phase frames: [G, N, N]."""
    ph = view_phases(geometry.N_proj, period_views, phase0)
    frames = []
    for g in range(n_gates):
        wgt = gate_weights(ph, g / n_gates, width)
        frames.append(gated_fbp_recon(sino_log, geometry, n_matrix,
                                      fov, wgt, ramp, window))
    return jnp.stack(frames)
