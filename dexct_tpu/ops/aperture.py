"""Finite detector aperture: sub-ray integration and the nonlinear
partial-volume effect.

The reference (and this framework's default) models each detector
channel as ONE infinitely thin line (SURVEY §2.1 C7).  A real channel
subtends ``dgamma`` of fan angle and averages the transmitted
INTENSITY over that aperture:

    counts = mean_s  sum_E i0(E) exp(-L_s(E))      (s = sub-rays)

which by Jensen's inequality is always >= the single-center-ray counts
through a heterogeneous aperture — the nonlinear partial-volume (NLPV)
/ exponential-edge-gradient effect: at sharp high-contrast edges
(bone/metal boundaries) the measured log attenuation is LESS than the
mean line integral, producing the classic dark bands off edges that no
line-sampled simulator can reproduce.

TPU mapping: sub-rays are a leading batch axis over the SAME exact
tracers (each offset is just a fractional ``det_offset_ch`` shift of
the whole fan), and the intensity average is one extra mean in the
spectral forward — the energy matmuls stay fused.  Cost is linear in
``n_sub``; 4 sub-rays capture the effect to ~percent level (the
aperture profile is smooth).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .siddon import material_path_sinogram

__all__ = ["finite_aperture_paths", "aperture_counts",
           "nlpv_bias_sinogram"]


def finite_aperture_paths(phantom, geometry, n_sub=4, *,
                          dtype=jnp.float32, method="auto"):
    """Exact material paths at ``n_sub`` sub-aperture ray offsets:
    [S, V, C, M].

    Sub-ray s samples fan angle ``gamma_c + off_s * dgamma`` with
    midpoint offsets ``off_s = (s + 0.5)/S - 0.5`` — a uniform aperture
    quadrature implemented as fractional ``det_offset_ch`` shifts of
    the whole geometry (so every projector fast path applies
    unchanged).  ``n_sub=1`` reproduces the standard center-line paths
    exactly.
    """
    if n_sub < 1:
        raise ValueError("n_sub must be >= 1")
    offs = (np.arange(n_sub) + 0.5) / n_sub - 0.5
    out = []
    for off in offs:
        g = dataclasses.replace(
            geometry, det_offset_ch=geometry.det_offset_ch + float(off))
        out.append(material_path_sinogram(phantom, g, dtype=dtype,
                                          method=method))
    return jnp.stack(out)


def aperture_counts(paths_sub, mu_table, i0_eff):
    """Aperture-integrated detected counts [V, C]: the sub-ray
    INTENSITIES average (the physical detector), not the line
    integrals."""
    from .spectral import counts_from_paths

    c = counts_from_paths(paths_sub, mu_table, i0_eff)  # [S, V, C]
    return jnp.mean(c, axis=0)


def nlpv_bias_sinogram(paths_sub, mu_table, i0_eff):
    """The nonlinear partial-volume bias in log units [V, C]:
    ``mean_s(L_eff) - (-ln(mean_s exp(-L_eff)))`` — zero through
    homogeneous apertures, positive (Jensen) at edges.  Useful as a
    simulation diagnostic and as the ground truth for edge-artifact
    studies."""
    from .spectral import counts_from_paths

    c = counts_from_paths(paths_sub, mu_table, i0_eff)  # [S, V, C]
    air = jnp.sum(jnp.asarray(i0_eff))
    log_mean = -jnp.log(jnp.maximum(jnp.mean(c, 0), 1e-30) / air)
    mean_log = jnp.mean(-jnp.log(jnp.maximum(c, 1e-30) / air), 0)
    return mean_log - log_mean
