"""Tiny shared optimizer steps for the in-jit fitting loops.

One canonical Adam update used by every autodiff fitting loop in the
package (one-step spectral MBIR, joint motion inversion) so tuning or
correctness fixes land once.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["adam_step"]


def adam_step(p, g, m, v, i, lr, *, b1=0.9, b2=0.999, eps=1e-8):
    """One Adam update with bias correction.

    p, g, m, v: parameter, gradient, first/second moment (same shape);
    i: 0-based iteration counter (float or int scalar); lr: step size.
    Returns (p_new, m_new, v_new).
    """
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    mh = m / (1.0 - b1 ** (i + 1.0))
    vh = v / (1.0 - b2 ** (i + 1.0))
    return p - lr * mh / (jnp.sqrt(vh) + eps), m, v
