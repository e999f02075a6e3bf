"""Empirical (calibration-based) dual-energy decomposition.

The projection-domain Poisson-MLE solve (`ops/matdecomp.py`, the
reference's matdecomp.py:130-164) needs the spectra and the basis
attenuation curves.  A real scanner often has neither to sufficient
accuracy — the clinical workaround is EMPIRICAL decomposition
(Stenner/Kachelriess-style): scan a step-wedge grid of KNOWN basis
thicknesses, record the two log measurements per (t1, t2) combination,
and fit the inverse map

    t_k = P_k(L1, L2),   P_k a 2-D polynomial through the origin,

then decompose object scans by evaluating P on every ray.  No spectrum,
detector response, or attenuation table enters the application path.

This module is beyond-reference (the reference ships only the
model-based solver) and completes the measured-calibration story of
`physics/spectrum_calibration.py`: with both, the full DE chain runs
from measured wedge data alone.

TPU notes: application is a Vandermonde feature matrix times a [T, 2]
coefficient matrix — one MXU matmul over all rays, jit-safe and free to
fuse into the recon program.  Calibration is host-side float64 lstsq on
a few hundred wedge points (repo convention: all calibration math in
f64 NumPy, only packed device arrays enter jit).

Accuracy (pinned in tests/test_empirical.py): noiseless held-out wedge
points recover to <0.2 % of range at degree 5; on a full pelvis
sinogram the empirical basis projections match the MLE to ~1 % of
range, and the decomposed tissue image agrees with the MLE image.
Limits (documented, also pinned): the polynomial is only valid inside
the calibrated thickness hull — rays through materials far outside the
basis span (metal implants) extrapolate and must be handled by MAR or
a wider calibration; L values are clipped to the calibration box to
keep extrapolation bounded.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .matdecomp import DEFAULT_BASIS, prepare_decomposition

__all__ = [
    "EmpiricalDEModel",
    "wedge_log_measurements",
    "fit_empirical_de",
    "apply_empirical_de",
]


def _poly_exponents(degree):
    """Exponent pairs (p, q) with 1 <= p+q <= degree (no constant term:
    zero path length must map to exactly zero thickness)."""
    return [(p, q) for total in range(1, degree + 1)
            for p in range(total + 1) for q in [total - p]]


@dataclass(frozen=True)
class EmpiricalDEModel:
    """Fitted inverse map (L1, L2) -> (t1, t2) [g/cm^2].

    coeffs [n_terms, 2] acts on features (L1/s1)^p (L2/s2)^q; L_max
    is the calibration-box corner used for scaling AND for clipping at
    application time (extrapolation guard).
    """

    exponents: tuple  # ((p, q), ...)
    coeffs: np.ndarray  # [n_terms, 2] float64
    L_max: np.ndarray  # [2] float64
    fit_residual: float  # rms over the calibration grid [g/cm^2]

    def features(self, L1, L2):
        """Scaled polynomial features, shape [..., n_terms] (jnp)."""
        u1 = jnp.clip(L1, 0.0, self.L_max[0]) / self.L_max[0]
        u2 = jnp.clip(L2, 0.0, self.L_max[1]) / self.L_max[1]
        cols = [u1 ** p * u2 ** q for (p, q) in self.exponents]
        return jnp.stack(cols, axis=-1)


def wedge_log_measurements(geometry, spec1, spec2, t1, t2,
                           basis=DEFAULT_BASIS):
    """Noiseless log measurements of basis slabs (host, float64).

    t1, t2: area densities [g/cm^2] of the two basis materials
    (broadcastable arrays).  Returns L [2, ...] matching the pipeline's
    sino_log convention, L_m = -ln(sum_E i0_m e^{-mu.t} / sum_E i0_m),
    with i0 evaluated by the pipeline's own quadrature
    (`spectral.effective_fluence` on each spectrum's NATIVE grid, no
    pruning).  Both details matter: union-grid interpolation or
    detectable-bin pruning shift every calibration L relative to the
    measured sino_log by a per-spectrum constant — measured as a
    ~0.17 g/cm^2 thickness bias before this was matched.  (The MLE is
    immune: it consumes raw counts, not L.)
    """
    from .spectral import effective_fluence
    from ..physics import xcom

    t1 = np.asarray(t1, np.float64)
    t2 = np.asarray(t2, np.float64)
    L = []
    for spec in (spec1, spec2):
        i0 = np.asarray(effective_fluence(spec, geometry), np.float64)
        mus = np.stack([xcom.mixatten(m.matcomp, spec.E) for m in basis])
        path = t1[..., None] * mus[0] + t2[..., None] * mus[1]  # [..., E]
        L.append(-np.log(np.tensordot(np.exp(-path), i0, axes=(-1, 0))
                         / i0.sum()))
    return np.stack(L)


def fit_empirical_de(geometry, spec1, spec2, *, basis=DEFAULT_BASIS,
                     t1_max=50.0, t2_max=35.0, n_grid=14, degree=5,
                     L_meas=None, T_grid=None):
    """Fit the empirical inverse map from a wedge-calibration grid.

    By default the wedge measurements are SIMULATED from the spectral
    model (the framework acts as its own calibration bench).  A real
    calibration substitutes measured data: pass ``L_meas`` [2, N] and
    ``T_grid`` [2, N] and the spectra are never consulted.

    t1_max/t2_max bound the calibrated thickness hull [g/cm^2]; objects
    must stay inside it (measured pelvis protocol: paths reach
    ~40 g/cm^2 tissue and ~30 g/cm^2 bone through the iliac wings —
    hence the wide default box).  degree=5 is the held-out optimum:
    deg 4 doubles the error, deg 6 over-fits the f32 application path
    (measured ladder in tests/test_empirical.py).
    """
    if (L_meas is None) != (T_grid is None):
        raise ValueError("pass both L_meas and T_grid, or neither")
    if L_meas is None:
        g1 = np.linspace(0.0, t1_max, n_grid)
        g2 = np.linspace(0.0, t2_max, n_grid)
        T1, T2 = np.meshgrid(g1, g2, indexing="ij")
        L = wedge_log_measurements(geometry, spec1, spec2, T1, T2,
                                   basis=basis)
        T = np.stack([T1, T2])
    else:
        L = np.asarray(L_meas, np.float64)
        T = np.asarray(T_grid, np.float64)

    L = L.reshape(2, -1)
    T = T.reshape(2, -1)
    L_max = np.maximum(L.max(axis=1), 1e-12)
    exponents = tuple(_poly_exponents(degree))
    u = L / L_max[:, None]
    A = np.stack([u[0] ** p * u[1] ** q for (p, q) in exponents], axis=1)
    coeffs, *_ = np.linalg.lstsq(A, T.T, rcond=None)
    resid = float(np.sqrt(np.mean((A @ coeffs - T.T) ** 2)))
    return EmpiricalDEModel(exponents=exponents, coeffs=coeffs,
                            L_max=L_max, fit_residual=resid)


def apply_empirical_de(model, sino_log1, sino_log2):
    """Decompose a log-sinogram pair -> basis area densities [2, ...].

    Pure jax (one feature build + one matmul); jit/vmap/shard-safe.
    Zero log signal maps to exactly zero thickness (no constant term),
    so air rays need no mask.
    """
    F = model.features(jnp.asarray(sino_log1), jnp.asarray(sino_log2))
    C = jnp.asarray(model.coeffs, jnp.float32)
    # HIGHEST: on TPU the default f32 matmul runs bf16 passes — a ~1e-3
    # relative error on thicknesses up to ~45 g/cm^2 would swamp the
    # polynomial's own inversion error (repo rule: every new matmul on a
    # physics path is explicit about precision)
    return jnp.einsum("...t,tk->k...", F.astype(jnp.float32), C,
                      precision=jax.lax.Precision.HIGHEST)
