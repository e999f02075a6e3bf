"""Detector truncation (limited FOV) and projection data completion.

When the patient extends past the fan, every truncated projection ends
mid-object: the ramp filter sees a step at the detector edge and the
reconstruction grows a bright rim plus a global DC/cupping bias inside
the FOV.  The reference's model never truncates (its phantoms fit the
fan).  Scanners complete the data by extrapolating each truncated edge
with a smooth, mass-plausible profile before filtering — here the
classic water-cylinder-style taper: the measured edge value decays to
zero over a width set by the edge attenuation itself (a thicker edge
implies more unseen object).

`pad_truncated_sinogram` returns BOTH the channel-extended log sinogram
and the matching extended equiangular geometry (same dgamma, wider
gamma_fan), so the standard FBP runs unchanged on the completed data.
Elementwise per view + a static pad — jit-able when an explicit
``n_pad`` is passed (the ``n_pad=None`` default sizes the pad from the
data on the host and cannot trace); completion is usually a host-side
preprocessing step anyway.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["pad_truncated_sinogram", "truncation_severity"]


def truncation_severity(sino_log, thresh=0.05):
    """Fraction of views whose edge channels still carry signal above
    ``thresh`` (log units) — 0 means the scan is not truncated."""
    s = np.asarray(sino_log)
    edge = np.maximum(s[..., 0], s[..., -1])
    return float(np.mean(edge > thresh))


def pad_truncated_sinogram(sino_log, ct, n_pad=None, mu_ref=0.2):
    """Complete truncated projections by the water-cylinder edge fit.

    A cylinder of attenuation ``mu_ref`` at offset u from a ray gives
    ``p(u) = 2 mu sqrt(R^2 - u^2)``; matching the measured edge VALUE
    and SLOPE solves the fit in closed form —
    ``u = -p p' / (4 mu^2)``, ``R^2 = u^2 + p^2/(4 mu^2)`` — and the
    extension follows the cylinder profile down to zero at its rim
    (Ohnesorge/Hsieh-style completion).  The slope comes from the last
    three channels (channel spacing at isocenter ``ds = SID*dgamma``);
    outward-increasing edges fall back to a gentle half-width decay.
    ``n_pad`` defaults to the largest fitted remaining width (rounded
    up to 8, capped at 4x the detector).

    Returns ``(padded_log [V, C + 2*n_pad], padded_ct)`` where
    ``padded_ct`` is ``ct`` with the detector extended symmetrically at
    the same dgamma — feed both straight to ``get_recon``.
    """
    s = jnp.asarray(sino_log)
    c_n = s.shape[-1]
    ds = ct.SID * ct.dgamma
    mu = float(mu_ref)

    def edge_fit(p_e, slope_out):
        """(u, R) of the fitted cylinder; slope_out = dp/du moving
        OUTWARD off the detector [per cm]."""
        p_e = jnp.maximum(p_e, 0.0)
        g = jnp.minimum(slope_out, -1e-6)  # decaying outward
        u = -p_e * g / (4.0 * mu * mu)
        r2 = u * u + p_e * p_e / (4.0 * mu * mu)
        return u, jnp.sqrt(r2)

    # edge values and outward slopes (3-channel one-sided difference)
    p_lo = jnp.maximum(s[..., 0], 0.0)
    p_hi = jnp.maximum(s[..., -1], 0.0)
    # moving outward at the LOW edge means decreasing channel index:
    # dp/du_out = (p[0] - p[1]) / ds, smoothed over two steps
    g_lo = (s[..., 0] - 0.5 * (s[..., 1] + s[..., 2])) / (1.5 * ds)
    g_hi = (s[..., -1] - 0.5 * (s[..., -2] + s[..., -3])) / (1.5 * ds)
    u_lo, r_lo = edge_fit(p_lo, g_lo)
    u_hi, r_hi = edge_fit(p_hi, g_hi)

    w_lo = jnp.where(p_lo > 0, r_lo - u_lo, 0.0) / ds  # channels
    w_hi = jnp.where(p_hi > 0, r_hi - u_hi, 0.0) / ds
    if n_pad is None:
        wmax = float(jnp.maximum(w_lo.max(), w_hi.max()))
        n_pad = min(max(8, int(-(-wmax // 8) * 8)), 4 * c_n)
    k = jnp.arange(1, n_pad + 1, dtype=s.dtype)

    def extend(p_e, u, r):
        uu = u[..., None] + k[None, :] * ds
        val = 2.0 * mu * jnp.sqrt(jnp.clip(r[..., None] ** 2 - uu * uu,
                                           0.0, None))
        # scale so the profile is continuous at the edge sample
        p0 = 2.0 * mu * jnp.sqrt(jnp.clip(
            r ** 2 - u ** 2, 1e-30, None))[..., None]
        return jnp.where(p_e[..., None] > 0,
                         val * p_e[..., None] / p0, 0.0)

    lo = extend(p_lo, u_lo, r_lo)[..., ::-1]
    hi = extend(p_hi, u_hi, r_hi)
    padded = jnp.concatenate([lo, s, hi], axis=-1)

    pct = dataclasses.replace(
        ct, N_channels=c_n + 2 * n_pad,
        gamma_fan=ct.gamma_fan * (c_n + 2 * n_pad) / c_n)
    return padded, pct
