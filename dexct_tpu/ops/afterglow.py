"""Scintillator afterglow (detector lag): view-axis temporal blur
simulation and its exact recursive correction.

The reference's EID model is instantaneous (a pure eta(E) weighting,
matdecomp.py:146-148).  Real scintillators (GOS, CdWO4) store a few
percent of each pulse in trap states that re-emit over milliseconds —
comparable to the view time — so each measured view carries decaying
contributions from earlier views.  On a rotating gantry that temporal
lag becomes AZIMUTHAL blur: comet tails behind high-contrast edges,
shading after air->object transitions, and a contrast-dependent smear
the classic Hsieh recursive correction removes in hardware.

Discrete model (the standard multi-exponential lag parametrization):
with per-view decay factors ``b_i = exp(-T_view / tau_i)`` and trap
fractions ``a_i``, the measured signal is

    y_i[v] = b_i y_i[v-1] + (1 - b_i) x[v]        (trap state i)
    m[v]   = (1 - sum_i a_i) x[v] + sum_i a_i y_i[v]

which preserves DC gain exactly (constant input -> constant output).
The inversion is algebraic, not a deconvolution:
``m[v] = x[v] (1 - s) + sum_i a_i b_i y_i[v-1]`` with
``s = sum_i a_i b_i``, so ``x[v]`` follows from the measured sample and
the running trap states — one `lax.scan` over views, exact to
rounding, streaming in O(K) state per channel.

TPU mapping: both directions are a single scan over the view axis with
[K, C]-shaped carries — fused VPU work, jit-able inside any pipeline
(counts domain, before the log).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decay_per_view", "apply_afterglow", "correct_afterglow",
           "lag_impulse_response", "fit_lag_parameters"]


def decay_per_view(tau_ms, view_time_ms):
    """Per-view decay factor(s) b = exp(-T_view / tau)."""
    return np.exp(-np.asarray(view_time_ms, np.float64)
                  / np.asarray(tau_ms, np.float64))


def _check(fractions, decay):
    a = np.atleast_1d(np.asarray(fractions, np.float64))
    b = np.atleast_1d(np.asarray(decay, np.float64))
    if a.shape != b.shape or a.ndim != 1:
        raise ValueError("fractions and decay must be matching 1-D")
    if a.sum() >= 1.0 or np.any(a < 0.0):
        raise ValueError("trap fractions must be >= 0 and sum < 1")
    if np.any((b < 0.0) | (b >= 1.0)):
        raise ValueError("decay factors must be in [0, 1)")
    return a, b


def apply_afterglow(counts, fractions, decay, *, warm_start=False):
    """Lagged measurement from the true per-view signal.

    counts: [V, ...] true (instantaneous) detector signal per view;
    fractions / decay: [K] trap fractions a_i and per-view decays b_i.
    ``warm_start`` initializes the trap states in equilibrium with the
    first view (a scanner running before the acquisition window)
    instead of empty traps (first views after power-on).
    """
    a, b = _check(fractions, decay)
    # force a float dtype: integer count arrays would truncate the trap
    # fractions to zero and silently degenerate the model to a gain
    x = jnp.asarray(counts)
    x = x.astype(jnp.result_type(x.dtype, jnp.float32))
    aj = jnp.asarray(a, x.dtype)
    bj = jnp.asarray(b, x.dtype)
    prompt = 1.0 - a.sum()
    k = len(a)
    shape = (k,) + x.shape[1:]
    y0 = jnp.broadcast_to(x[0], shape) if warm_start \
        else jnp.zeros(shape, x.dtype)
    bcast = bj.reshape((k,) + (1,) * (x.ndim - 1))
    acast = aj.reshape((k,) + (1,) * (x.ndim - 1))

    def step(y, xv):
        y = bcast * y + (1.0 - bcast) * xv[None]
        return y, prompt * xv + jnp.sum(acast * y, axis=0)

    _, m = jax.lax.scan(step, y0, x)
    return m


def correct_afterglow(measured, fractions, decay, *, warm_start=False):
    """Exact inversion of :func:`apply_afterglow` (same parameters,
    same ``warm_start`` convention): recovers the instantaneous signal
    by peeling the known trap-state contribution off each view."""
    a, b = _check(fractions, decay)
    m = jnp.asarray(measured)
    m = m.astype(jnp.result_type(m.dtype, jnp.float32))
    aj = jnp.asarray(a, m.dtype)
    bj = jnp.asarray(b, m.dtype)
    k = len(a)
    s = float((a * b).sum())
    gain = 1.0 - s  # coefficient of x[v] in m[v]
    bcast = bj.reshape((k,) + (1,) * (m.ndim - 1))
    acast = aj.reshape((k,) + (1,) * (m.ndim - 1))

    if warm_start:
        # y[-1] = x[0] and m[0] = x[0] exactly (equilibrium): seed from
        # the first measured view
        y0 = jnp.broadcast_to(m[0], (k,) + m.shape[1:])
    else:
        y0 = jnp.zeros((k,) + m.shape[1:], m.dtype)

    def step(y, mv):
        xv = (mv - jnp.sum(acast * bcast * y, axis=0)) / gain
        y = bcast * y + (1.0 - bcast) * xv[None]
        return y, xv

    _, x = jax.lax.scan(step, y0, m)
    return x


def lag_impulse_response(fractions, decay, n=32):
    """Discrete impulse response h[0..n-1] of the lag model (host):
    ``h[0] = 1 - sum a_i b_i``, ``h[k] = sum a_i (1-b_i) b_i^(k-1) b_i``
    — normalized to sum -> 1 as n -> inf (DC gain one)."""
    a, b = _check(fractions, decay)
    h = np.zeros(n)
    h[0] = 1.0 - a.sum() + (a * (1.0 - b)).sum()
    kk = np.arange(1, n)
    h[1:] = ((a * (1.0 - b))[None, :] * (b[None, :] ** kk[:, None])).sum(1)
    return h


def fit_lag_parameters(decay_tail, n_exp=2):
    """Calibrate the lag model from a measured shutter-off decay tail
    (host, float64) — the scanner's lag-calibration procedure.

    ``decay_tail``: h[1..n] — the mean detector signal on the views
    AFTER the beam turns off, normalized so that the on-beam steady
    signal was 1 (i.e. the tail of the impulse response,
    :func:`lag_impulse_response` [1:]).  Fits ``sum_i a_i (1-b_i)
    b_i^k`` by Prony's method: the decay factors ``b_i`` are the roots
    of the linear recurrence the tail satisfies (an [n-p, p] linear
    solve), and the amplitudes follow from one linear LS on the
    Vandermonde of the recovered roots — no nonlinear iteration.

    Returns ``(fractions [n_exp], decay [n_exp])`` ready for
    :func:`correct_afterglow`.  Exact on noiseless model tails;
    with measurement noise, average many channels/repeats first
    (the tail is tiny — percent-level of the on-signal).
    """
    h = np.asarray(decay_tail, np.float64)
    p = int(n_exp)
    if len(h) < 2 * p + 1:
        raise ValueError(f"need >= {2 * p + 1} tail samples for "
                         f"{p} exponentials")
    # Prony: h[k+p] = -sum_j c_j h[k+p-1-j]  ->  solve for c
    rows = len(h) - p
    A = np.stack([h[p - 1 - j:p - 1 - j + rows] for j in range(p)], -1)
    rhs = h[p:p + rows]
    c, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    roots = np.roots(np.concatenate([[1.0], -c]))
    b = np.clip(np.real(roots), 0.0, 1.0 - 1e-9)
    b = np.sort(b)
    # amplitudes: h[k] = sum_i w_i b_i^k  (k = 1..) with w = a (1-b)
    kk = np.arange(1, len(h) + 1)
    V = b[None, :] ** kk[:, None]
    w, *_ = np.linalg.lstsq(V, h, rcond=None)
    a = w / np.maximum(1.0 - b, 1e-12)
    a = np.clip(a, 0.0, None)
    return a, b
