"""Anode heel effect: row-dependent source intensity and hardness.

X-rays are produced a few micrometres inside the tungsten target and
exit through the anode bevel; a ray emitted at cone angle ``kappa``
toward the ANODE side sees a self-filtration path ``d0 / tan(alpha -
kappa)`` (anode angle ``alpha``, effective production depth ``d0``), so
the beam both dims and HARDENS along the z (detector-row) axis — the
longitudinal analog of the bowtie's in-plane channel dependence
(:mod:`dexct_tpu.ops.bowtie`).  The reference has no heel (one spectrum
per scan, /root/reference/matdecomp.py:149-151); real multi-row
scanners must either orient the anode axis along the scan plane or
correct for it, and cone-beam simulation studies routinely include it.

Captured effects:

* per-row effective fluence ``[R, E]`` (intensity falloff toward the
  anode side, hard cutoff past the anode angle);
* per-row AIR normalization (the scanner's air calibration removes the
  intensity profile but NOT the hardening — peripheral-row HU bias);
* exact per-row decomposition: the Gauss-Newton solve vmaps over rows
  with per-row fluence tables (zero spectral-model mismatch), the same
  grouped-solve discipline as the bowtie's thickness groups.

TPU-native notes: the spectral contraction stays MXU work — the per-row
fluence enters as one ``[R, E]`` einsum against the attenuation cube
(``"vrce,re->vrc"``), and the decomposition is ONE vmapped fused GN
solve over the row axis.  The heel transmission itself is host-side
float64 (all calibration-grade physics stays on host, CLAUDE.md).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..physics.materials import Material
from . import matdecomp as md_ops
from . import spectral as sp_ops

__all__ = ["TUNGSTEN", "HeelEffect", "heel_fluence",
           "heel_second_moment", "counts_from_paths_heel",
           "cone_sinogram_heel", "decompose_cone_sinograms_heel"]

TUNGSTEN = Material("tungsten", 19.3, "W(100.0)")


@dataclasses.dataclass(frozen=True)
class HeelEffect:
    """Target self-filtration model of the heel effect.

    anode_angle: target bevel angle [rad] (clinical tubes ~7-16 deg).
    d0_cm:       effective x-ray production depth in the target [cm]
                 (electron range at tube potential, ~5-20 um; sets the
                 heel's strength).
    toward_positive_z: True when the anode sits on the +z (positive
                 cone-angle) side, i.e. rows with kappa > 0 harden.
    material:    target material (tungsten).

    The per-row EXCESS path is referenced to the central ray,
    ``d0*(1/tan(alpha - kappa) - 1/tan(alpha))`` — a ``kappa = 0`` row
    sees exactly the nominal spectrum, so a zero-depth (or single-row
    central) scan reproduces the heel-free simulation bit for bit.
    """

    anode_angle: float = np.deg2rad(12.0)
    d0_cm: float = 10e-4  # 10 um
    toward_positive_z: bool = True
    material: Material = TUNGSTEN

    def excess_path(self, geometry):
        """Per-row extra target path [cm], shape [N_rows]."""
        kap = np.arctan2(np.asarray(geometry.z_iso, np.float64),
                         float(geometry.SID))
        if not self.toward_positive_z:
            kap = -kap
        a = float(self.anode_angle)
        if np.any(kap >= a - 1e-6):
            raise ValueError(
                "detector rows reach past the anode angle (the beam is "
                f"cut off there): max kappa {np.max(kap):.4f} rad vs "
                f"anode angle {a:.4f} rad")
        t = self.d0_cm * (1.0 / np.tan(a - kap) - 1.0 / np.tan(a))
        return t

    def transmission(self, geometry, energy_keV):
        """Per-row spectral transmission [R, E] (host, float64)."""
        mu = self.material.linear_atten(np.asarray(energy_keV))  # [E]
        return np.exp(-np.outer(self.excess_path(geometry), mu))


def heel_fluence(spec, geometry, heel):
    """Per-row effective fluence [N_rows, E] (the heel analog of
    :func:`~dexct_tpu.ops.spectral.effective_fluence`)."""
    i0 = sp_ops.effective_fluence(spec, geometry)  # [E]
    return i0[None, :] * heel.transmission(geometry, spec.E)


def heel_second_moment(spec, geometry, heel):
    """Per-row second-moment table [N_rows, E] for compound EID noise
    (transmission scales the photon count linearly; the per-photon
    weight is unchanged — same convention as
    :func:`~dexct_tpu.ops.bowtie.bowtie_second_moment`)."""
    base = sp_ops.second_moment_fluence(spec, geometry)
    return heel.transmission(geometry, spec.E) * base[None, :]


def counts_from_paths_heel(paths, mu_table, i0_rows, *, dtype=None):
    """Detected counts [V, R, C] for per-row fluence ``i0_rows [R, E]``
    (the heel analog of
    :func:`~dexct_tpu.ops.spectral.counts_from_paths`)."""
    dtype = paths.dtype if dtype is None else dtype
    hi = jax.lax.Precision.HIGHEST
    L = jnp.matmul(paths, mu_table.astype(dtype), precision=hi)
    atten = jnp.exp(jnp.clip(-L, -700.0, 2.0))
    return jnp.einsum("vrce,re->vrc", atten,
                      jnp.asarray(i0_rows, dtype), precision=hi)


def cone_sinogram_heel(phantom, geometry, spectrum, heel, *,
                       dtype=jnp.float32, view_block=None):
    """Polyenergetic cone-beam acquisition with the heel effect.

    Mirrors :func:`~dexct_tpu.ops.conebeam.cone_sinogram` ([V, R, C]
    counts + log sinogram) with the per-row fluence table and PER-ROW
    air normalization — the scanner's air calibration, which removes
    the heel's intensity profile from the log data but leaves its
    hardening (the quantity the tests pin).  ``heel=None`` or
    ``d0_cm=0`` reproduces the heel-free path exactly.
    """
    from .conebeam import cone_material_paths

    paths = cone_material_paths(phantom, geometry, dtype=dtype,
                                view_block=view_block)
    mu_t = jnp.asarray(phantom.materials.mu_table(spectrum.E), dtype)
    if heel is None or heel.d0_cm == 0.0:
        i0 = sp_ops.effective_fluence(spectrum, geometry)
        counts = sp_ops.counts_from_paths(paths, mu_t,
                                          jnp.asarray(i0, dtype))
        return counts, sp_ops.log_sinogram(counts, float(np.sum(i0)))
    i0_r = heel_fluence(spectrum, geometry, heel)  # [R, E]
    counts = counts_from_paths_heel(paths, mu_t, i0_r, dtype=dtype)
    air_r = jnp.asarray(i0_r.sum(-1), dtype)  # per-row air counts
    sino_log = sp_ops.log_sinogram(counts, air_r[None, :, None])
    return counts, sino_log


def decompose_cone_sinograms_heel(geometry, sino1, sino2, spec1, spec2,
                                  heel, *, n_iters=30, mask_thresh=0.95,
                                  basis=md_ops.DEFAULT_BASIS,
                                  dtype=jnp.float32, pixel_block=65536):
    """Heel-aware GN decomposition of a cone-beam DE pair.

    ``sino1/sino2``: raw counts [V, R, C].  Rows are the natural
    spectral groups (each row has its own exact fluence table), so the
    solve is ONE ``vmap`` of the fused
    :func:`~dexct_tpu.ops.matdecomp.gauss_newton_solve` over the row
    axis — the forward model inside the solver matches the heel-
    filtered acquisition exactly.  Air rays are masked per row (raw
    air counts are row-dependent under the heel).

    Returns ``(mat1, mat2)`` [V, R, C] in g/cm^2.
    """
    ee, i0_base, mus = md_ops.prepare_decomposition(
        geometry, spec1, spec2, basis)
    tr = np.exp(-np.outer(heel.excess_path(geometry),
                          heel.material.linear_atten(ee)))  # [R, E']
    i0_r = i0_base[None] * tr[:, None, :]  # [R, 2, E']

    s1 = jnp.asarray(sino1, dtype)
    s2 = jnp.asarray(sino2, dtype)
    V, R, C = s1.shape
    y = jnp.stack([s1, s2], 0).transpose(2, 0, 1, 3)  # [R, 2, V, C]
    y = y.reshape(R, 2, V * C)

    solve = jax.vmap(
        lambda yy, ii: md_ops.gauss_newton_solve(
            yy, ii, jnp.asarray(mus, dtype), n_iters=n_iters,
            pixel_block=pixel_block),
        in_axes=(0, 0))
    a = solve(y, jnp.asarray(i0_r, dtype))  # [R, V*C, K]
    a = a.reshape(R, V, C, -1).transpose(1, 0, 2, 3)  # [V, R, C, K]

    # per-row air mask anchored to the KNOWN per-row air counts (the
    # model is available here, unlike the reference's data-max
    # heuristic, matdecomp.py:194-196): a per-row data max would
    # misclassify through-object rays as air on any row the object
    # covers completely
    air1 = heel_fluence(spec1, geometry, heel).sum(-1)  # [R]
    mask = s1 >= mask_thresh * jnp.asarray(air1, dtype)[None, :, None]
    mat1 = jnp.where(mask, 0.0, a[..., 0])
    mat2 = jnp.where(mask, 0.0, a[..., 1])
    return mat1, mat2
