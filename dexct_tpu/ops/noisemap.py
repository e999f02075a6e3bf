"""Analytic FBP noise maps: per-pixel reconstruction variance without
ensembles.

FBP is linear in the log sinogram, so the recon variance at every pixel
is an exact quadratic propagation of the per-ray measurement variance
(rays independent; the filter correlates *channels within a view*,
views stay independent):

1. **log stage** (delta method): ``var(log) = var(counts) / counts²``
   — Poisson (var = counts) or the compound-EID second moment.
2. **filter stage**: ``q = dγ · h ⊛ (SID cosγ · sino)`` makes
   ``var(q_c) = dγ² Σ_k h²[c−k] (SID cosγ)²_k var_k`` and the adjacent-
   channel covariance ``cov(q_c, q_{c+1})`` the same convolution with
   the lag-1 kernel ``h[d]h[d+1]`` — both one FFT each.
3. **backprojection stage**: the bilinear interpolation
   ``(1−f) q_{c0} + f q_{c0+1}`` contributes
   ``(1−f)² var_0 + f² var_1 + 2f(1−f) cov_01`` (the tap covariance is
   NOT negligible — the filtered sinogram is strongly correlated at
   lag 1), weighted ``(dβ / L²)²`` per view.

Ignoring the tap covariance (the common shortcut) biases the map; the
ensemble test pins this implementation to ~5 % on the interior.

Uses: predicted noise maps for protocol/dose planning (pair with
``ops/dose.py``), analytic NPS cross-checks, per-pixel statistical
weights.  Fan-beam full-scan geometry (the production recon path).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["log_variance", "fbp_variance_map"]


def log_variance(counts, var_counts=None):
    """Delta-method variance of the log sinogram.

    var_counts defaults to ``counts`` (Poisson); pass the compound-EID
    per-ray variance (``counts_from_paths`` of the second-moment
    fluence, ops/spectral.py) for energy-integrating detectors.
    """
    c = jnp.maximum(jnp.asarray(counts), 1e-30)
    v = c if var_counts is None else jnp.asarray(var_counts)
    return v / (c * c)


@functools.partial(jax.jit, static_argnames=("m",))
def _cov_filter(s, k0, k1, m, dgamma):
    """Variance and lag-1 covariance of the filtered sinogram.

    s: [V, C] (pre-weight² · log-variance); k0/k1: [m] spatial kernels
    (h², h·h₊₁) in the filter's rolled layout.  Returns (r0, r1) [V, C].
    """
    n_ch = s.shape[-1]
    spec = jnp.fft.rfft(s, n=m, axis=-1)
    r0 = jnp.fft.irfft(spec * jnp.fft.rfft(k0), n=m, axis=-1)[..., :n_ch]
    r1 = jnp.fft.irfft(spec * jnp.fft.rfft(k1), n=m, axis=-1)[..., :n_ch]
    scale = dgamma * dgamma
    return r0 * scale, r1 * scale


@functools.partial(jax.jit, static_argnames=("n_matrix", "view_block"))
def _fan_backproject_var(r0, r1, betas, sid, dgamma, n_matrix, fov, *,
                         view_block=64, dbeta=None):
    """Squared-weight backprojection of (variance, lag-1 covariance)."""
    dtype = r0.dtype
    n_proj, n_ch = r0.shape
    px_size = fov / n_matrix
    half = n_matrix / 2.0
    coord = (jnp.arange(n_matrix, dtype=dtype) + 0.5 - half) * px_size
    X = jnp.broadcast_to(coord[None, :], (n_matrix, n_matrix))
    Y = jnp.broadcast_to(coord[:, None], (n_matrix, n_matrix))

    n_blocks = -(-n_proj // view_block)
    pad = n_blocks * view_block - n_proj
    r0p = jnp.pad(r0, ((0, pad), (0, 0))).reshape(n_blocks, view_block,
                                                  n_ch)
    r1p = jnp.pad(r1, ((0, pad), (0, 0))).reshape(n_blocks, view_block,
                                                  n_ch)
    bp = jnp.pad(betas.astype(dtype), (0, pad)).reshape(n_blocks,
                                                        view_block)
    vp = jnp.pad(jnp.ones((n_proj,), dtype), (0, pad)).reshape(
        n_blocks, view_block)

    def view_contrib(v0, v1, beta, v):
        cb, sb = jnp.cos(beta), jnp.sin(beta)
        vr = X * cb + Y * sb - sid
        vt = -X * sb + Y * cb
        gamma = jnp.arctan2(-vt, -vr)
        L2 = vr * vr + vt * vt
        c = gamma / dgamma - 0.5 + n_ch / 2.0
        c0 = jnp.clip(jnp.floor(c), 0, n_ch - 2).astype(jnp.int32)
        fc = jnp.clip(c - c0, 0.0, 1.0)
        inside = (c >= 0.0) & (c <= n_ch - 1.0)
        var_i = ((1.0 - fc) ** 2 * v0[c0] + fc * fc * v0[c0 + 1]
                 + 2.0 * fc * (1.0 - fc) * v1[c0])
        return jnp.where(inside, var_i / (L2 * L2), 0.0) * v

    def block(acc, args):
        b0, b1, bv, vv = args
        contrib = jax.vmap(view_contrib)(b0, b1, bv, vv)
        return acc + contrib.sum(0), None

    init = jnp.zeros((n_matrix, n_matrix), dtype)
    img, _ = jax.lax.scan(block, init, (r0p, r1p, bp, vp))
    if dbeta is None:
        dbeta = 2.0 * jnp.pi / n_proj if n_proj else 0.0
    return img * (dbeta * dbeta)


def fbp_variance_map(counts, geometry, n_matrix, fov, ramp=0.8,
                     window="sinc", *, var_counts=None, mu_water_eff=None,
                     dtype=jnp.float32):
    """Predicted per-pixel variance of the fan-beam FBP reconstruction.

    counts: [V, C] detected counts (noise source); var_counts: per-ray
    count variance (default Poisson = counts).  Returns the variance
    map of ``recon_raw`` [1/cm²]; pass ``mu_water_eff`` to get the
    variance of ``recon_HU`` instead (scaled by (1000/mu_w)²).

    Full-scan equiangular fan geometry (the production 2-D recon);
    short-scan/parallel/FFS paths are not modeled here.
    """
    from ..system.geometry import FanBeamGeometry, ParallelBeamGeometry
    from .filters import filter_frequency_response

    if isinstance(geometry, ParallelBeamGeometry) or \
            getattr(geometry, "ffs", "none") != "none":
        raise ValueError("variance map models the direct fan-beam FBP "
                         "path only")
    n_ch = geometry.N_channels
    dgamma = geometry.dgamma
    H, m = filter_frequency_response(n_ch, dgamma, ramp, window, "fan")
    # spatial kernel in the filter's rolled layout; variance kernels are
    # h^2 (lag 0) and h*h_{+1} (lag 1).  Passed as REAL spatial arrays —
    # complex host->device transfers are unimplemented here (CLAUDE.md)
    h_sp = np.fft.irfft(H, m)
    k0 = h_sp * h_sp
    k1 = h_sp * np.roll(h_sp, -1)

    var_log = log_variance(counts, var_counts).astype(dtype)
    w_pre = (float(geometry.SID)
             * np.cos(np.asarray(geometry.gammas))) ** 2
    s = var_log * jnp.asarray(w_pre, dtype)[None, :]
    r0, r1 = _cov_filter(s, jnp.asarray(k0, dtype), jnp.asarray(k1, dtype),
                         m, float(dgamma))
    var = _fan_backproject_var(
        r0, r1, jnp.asarray(geometry.betas, dtype), float(geometry.SID),
        float(dgamma), int(n_matrix), float(fov),
        dbeta=float(geometry.rotation_total) / geometry.N_proj)
    if mu_water_eff is not None:
        var = var * (1000.0 / float(mu_water_eff)) ** 2
    return var
