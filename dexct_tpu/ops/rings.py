"""Detector gain nonuniformity: ring artifact simulation, air-scan
calibration, and sinogram-domain ring correction.

The reference's forward model assumes perfectly uniform detector
channels.  Real scanners don't: a per-channel gain error g_c multiplies
every view of channel c identically, which after log + backprojection
becomes a concentric RING centered on isocenter — the classic CT
artifact.  Scanners handle it with (a) air-scan gain calibration and
(b) residual sinogram-domain ring correction; both are implemented here
as framework-level ops.

TPU mapping: gains are a broadcast multiply on the counts; calibration
is a view-axis mean; the corrector is a channel-axis high-pass of the
view-averaged log sinogram (one mean + one box smooth + one subtract —
all fused elementwise/reduction ops, jit-able inside any pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_channel_gains", "apply_channel_gains",
           "air_calibration_gains", "ring_correct_sinogram",
           "apply_channel_defects", "detect_defective_channels",
           "inpaint_defective_channels"]


def sample_channel_gains(key, n_channels, sigma=0.003, drift=0.0):
    """Per-channel multiplicative gains g_c ~ 1 + N(0, sigma) (+ an
    optional smooth drift component of relative amplitude ``drift``
    across the array — miscalibration that survives air correction
    less well than white gain noise)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key)
                              if isinstance(key, int) else key)
    g = 1.0 + sigma * jax.random.normal(k1, (n_channels,))
    if drift:
        phase = jax.random.uniform(k2, (), minval=0.0, maxval=2 * np.pi)
        c = jnp.arange(n_channels) / max(n_channels - 1, 1)
        g = g * (1.0 + drift * jnp.sin(2 * np.pi * 3 * c + phase))
    return g


def apply_channel_gains(counts, gains):
    """Measured counts with per-channel gains: counts[..., v, c] * g_c."""
    return counts * gains


def air_calibration_gains(counts_air, i0_expected):
    """Estimate per-channel gains from an air scan.

    ``counts_air``: [V, C] measured air counts; ``i0_expected``: the
    forward model's air counts per channel (scalar or [C]).  The
    view-axis mean averages the air-scan's own noise down by sqrt(V) —
    exactly the scanner calibration procedure.
    """
    return jnp.mean(counts_air, axis=0) / i0_expected


def ring_correct_sinogram(sino_log, half_width=2, clip=0.05):
    """Residual ring correction in the log-sinogram domain.

    Air calibration (:func:`air_calibration_gains`) is the PRIMARY
    gain fix — its precision is 1/sqrt(V * i0_air), orders better than
    any image-domain estimate.  This corrector targets the residual
    drift a stale calibration leaves behind: a per-channel offset h_c
    that is VIEW-INDEPENDENT while the object's structures move across
    channels as the gantry rotates.  Estimator: high-pass each view
    with a sliding channel MEDIAN (edge-preserving; a box mean rings
    catastrophically at the object boundary — measured 20x worse than
    no correction), then take the MEDIAN ACROSS VIEWS per channel —
    an object edge crosses a given channel in only a few views, so the
    view-median rejects it, leaving the constant h_c.  The correction
    clips at ``clip`` (log units) as a final guard.

    A windowed estimator of a WHITE gain profile can only capture it
    down to the in-window median leak (~0.45 sigma at half_width=2),
    i.e. ring POWER drops ~2x per application — the physics of the
    method, not an implementation limit; rerun calibration for more.
    Rolls + medians over [V, C] — fused VPU work, jit-able anywhere.
    """
    hw = int(half_width)
    w = 2 * hw + 1

    def slide_med(x):
        padded = jnp.concatenate(
            [jnp.repeat(x[..., :1], hw, axis=-1), x,
             jnp.repeat(x[..., -1:], hw, axis=-1)], axis=-1)
        wins = jnp.stack(
            [padded[..., k:k + x.shape[-1]] for k in range(w)], axis=0)
        return jnp.median(wins, axis=0)

    resid = sino_log - slide_med(sino_log)          # per-view high-pass
    h_hat = jnp.median(resid, axis=-2, keepdims=True)  # view-constant
    return sino_log - jnp.clip(h_hat, -clip, clip)


def apply_channel_defects(counts, *, dead=None, flicker=None,
                          flicker_sigma=0.2, key=None):
    """Simulate DEFECTIVE channels on measured counts [..., V, C].

    dead: index array — channels that read (near) zero at every view.
    flicker: index array — channels whose gain fluctuates view-to-view
    by ``1 + N(0, flicker_sigma)`` (an unstable channel: air-cal gain
    correction cannot fix it because the error is not constant).
    """
    c = jnp.asarray(counts)
    n_ch = c.shape[-1]
    if dead is not None and len(np.atleast_1d(dead)):
        mask = jnp.zeros((n_ch,), bool).at[jnp.asarray(dead)].set(True)
        c = jnp.where(mask, 1e-6 * c, c)
    if flicker is not None and len(np.atleast_1d(flicker)):
        if key is None:
            raise ValueError("flicker needs a PRNG key")
        g = 1.0 + flicker_sigma * jax.random.normal(
            key, c.shape[:-1] + (len(np.atleast_1d(flicker)),))
        g = jnp.clip(g, 0.05, None)
        full = jnp.ones(c.shape, c.dtype)
        full = full.at[..., jnp.asarray(flicker)].set(g)
        c = c * full
    return c


def detect_defective_channels(air_counts, *, dead_floor=0.5,
                              flicker_factor=6.0):
    """Defective-channel mask [C] from an air scan [V, C].

    dead: view-mean response below ``dead_floor`` x the median channel.
    flicker: view-axis variance above ``flicker_factor`` x the median
    channel variance (a model-free threshold: the healthy channels'
    variance sets the scale whatever the counting statistics are, so
    EID energy weighting needs no special-casing).
    """
    a = jnp.asarray(air_counts)
    m = a.mean(axis=-2)
    v = a.var(axis=-2)
    dead = m < dead_floor * jnp.median(m)
    flicker = v > flicker_factor * jnp.maximum(jnp.median(v), 1e-30)
    return dead | flicker


def inpaint_defective_channels(sino_log, bad_mask):
    """Replace defective channels by linear interpolation from their
    nearest healthy neighbors (per view, channel axis).

    Reuses the MAR sinogram bridge (`ops/mar.interpolate_sinogram`) —
    a dead channel is exactly a one-channel metal trace present in
    every view.  Uncorrected, a dead channel's log signal backprojects
    to the classic sharp ring; interpolation removes it to the local
    interpolation error.
    """
    from .mar import interpolate_sinogram

    s = jnp.asarray(sino_log)
    trace = jnp.broadcast_to(jnp.asarray(bad_mask, bool), s.shape)
    return interpolate_sinogram(s, trace)
