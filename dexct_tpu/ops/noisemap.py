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

__all__ = ["log_variance", "fbp_variance_map", "decomposition_covariance",
           "basis_variance_maps", "vmi_variance_map"]


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


# ---------------------------------------------------------------------------
# Dual-energy extension: basis-image noise + analytic VMI noise curves
# ---------------------------------------------------------------------------

def decomposition_covariance(a_sinos, geometry, spec1, spec2, *,
                             basis=None, compound=False):
    """Per-ray CRLB covariance of the 2-basis decomposition.

    a_sinos: [V, C, 2] basis-coefficient sinogram (the noiseless
    decomposition or the exact basis projections — the linearization
    point).  Returns ``cov [V, C, 2, 2]`` — the asymptotic (Fisher)
    covariance the Poisson-MLE GN solve attains:

        I_mn = sum_i (dc_i/da_m)(dc_i/da_n) / var_i,   cov = I^{-1}

    with ``var_i = c_i`` (Poisson) or the compound-EID second moment
    when ``compound=True``.  The classic DE anticorrelation
    (cov_12 < 0) falls out.
    """
    from .matdecomp import DEFAULT_BASIS, prepare_decomposition
    from .spectral import second_moment_fluence

    basis = DEFAULT_BASIS if basis is None else basis
    ee, i0, mus = prepare_decomposition(geometry, spec1, spec2, basis)
    a = jnp.asarray(a_sinos, jnp.float32)
    mus_j = jnp.asarray(mus, jnp.float32)  # [2, E]
    i0_j = jnp.asarray(i0, jnp.float32)  # [2, E]
    hi = jax.lax.Precision.HIGHEST
    L = jnp.einsum("vck,ke->vce", a, mus_j, precision=hi)
    att = jnp.exp(-jnp.clip(L, 0.0, 700.0))  # [V, C, E]
    c = jnp.einsum("vce,ie->vci", att, i0_j, precision=hi)  # [V, C, 2]
    # J[v,c,i,m] = -sum_E i0_iE mu_mE att_E
    J = -jnp.einsum("vce,ie,me->vcim", att, i0_j, mus_j, precision=hi)
    if compound:
        # var_i = sum_E n_E w_E^2 att_E with the union-grid tables:
        # approximate via the per-spectrum second-moment ratio
        i2 = []
        for spec in (spec1, spec2):
            r = second_moment_fluence(spec, geometry)
            n = spec.I0 * spec.bin_widths()
            # mean per-detected-unit weight: fold into the union grid
            w_eff = float(np.sum(r)) / max(float(np.sum(
                n * geometry.detector_response(spec.E))), 1e-300)
            i2.append(w_eff)
        var_c = c * jnp.asarray(i2, jnp.float32)[None, None, :]
    else:
        var_c = c
    w = 1.0 / jnp.maximum(var_c, 1e-30)  # [V, C, 2]
    info = jnp.einsum("vcim,vci,vcin->vcmn", J, w, J, precision=hi)
    det = (info[..., 0, 0] * info[..., 1, 1]
           - info[..., 0, 1] * info[..., 1, 0])
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    cov = jnp.stack([
        jnp.stack([info[..., 1, 1], -info[..., 0, 1]], -1),
        jnp.stack([-info[..., 1, 0], info[..., 0, 0]], -1)], -2)
    return cov / det[..., None, None]


def basis_variance_maps(cov_rays, geometry, n_matrix, fov, ramp=0.8,
                        window="sinc", dtype=jnp.float32):
    """FBP-propagate the per-ray basis covariance to image space.

    cov_rays: [V, C, 2, 2] from :func:`decomposition_covariance`.
    Returns (var1, var2, cov12) image maps — the linear FBP applies the
    SAME weights to both basis sinograms, so the cross-covariance
    propagates through the identical quadratic form as the variances.
    """
    from .filters import filter_frequency_response

    n_ch = geometry.N_channels
    dgamma = geometry.dgamma
    H, m = filter_frequency_response(n_ch, dgamma, ramp, window, "fan")
    h_sp = np.fft.irfft(H, m)
    k0 = jnp.asarray(h_sp * h_sp, dtype)
    k1 = jnp.asarray(h_sp * np.roll(h_sp, -1), dtype)
    w_pre = jnp.asarray(
        (float(geometry.SID) * np.cos(np.asarray(geometry.gammas))) ** 2,
        dtype)
    betas = jnp.asarray(geometry.betas, dtype)
    dbeta = float(geometry.rotation_total) / geometry.N_proj
    cov = jnp.asarray(cov_rays, dtype)
    out = []
    for field in (cov[..., 0, 0], cov[..., 1, 1], cov[..., 0, 1]):
        s = field * w_pre[None, :]
        r0, r1 = _cov_filter(s, k0, k1, m, float(dgamma))
        out.append(_fan_backproject_var(
            r0, r1, betas, float(geometry.SID), float(dgamma),
            int(n_matrix), float(fov), dbeta=dbeta))
    return tuple(out)


def vmi_variance_map(var1, var2, cov12, e0_keV, *, basis=None):
    """Predicted VMI variance map [HU^2] at energy ``e0_keV``.

    The VMI is the linear combination ``mu = a_1 m_1(E0) + a_2 m_2(E0)``
    (plots.py:136-144), so its variance is the quadratic form over the
    basis-image covariance — including the (negative) cross term that
    produces the classic VMI noise minimum between the kVp energies.
    """
    from ..physics import xcom
    from .matdecomp import DEFAULT_BASIS

    basis = DEFAULT_BASIS if basis is None else basis
    e = np.atleast_1d(np.float64(e0_keV))
    m1 = float(basis[0].mass_atten(e)[0])
    m2 = float(basis[1].mass_atten(e)[0])
    mu_w = float(xcom.mixatten("H(11.2)O(88.8)", e)[0])
    var_mu = (m1 * m1 * jnp.asarray(var1) + m2 * m2 * jnp.asarray(var2)
              + 2.0 * m1 * m2 * jnp.asarray(cov12))
    return var_mu * (1000.0 / mu_w) ** 2
