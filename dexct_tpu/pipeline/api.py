"""Reference-compatible pipeline API.

The three public entry points the reference pipeline is built from —
``get_sino`` (/root/reference/main.py:120), ``get_recon`` (main.py:134),
``get_basismat_sinos`` (main.py:153 / matdecomp.py:167) — plus the fused
single-jit dual-energy pipeline that is this framework's flagship path.

A deliberate TPU-side efficiency win over the reference: the ray trace is
*per-geometry*, not per-spectrum.  ``simulate_dect`` traces the phantom once
and reuses the material-path sinogram for every spectrum (the reference
re-traces per acquisition, SURVEY.md §3.1), so a DE pair costs one traversal
plus two matmul re-weightings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fbp as fbp_ops
from ..ops import matdecomp as md_ops
from ..ops import spectral as sp_ops
from ..ops.siddon import material_path_sinogram
from ..physics.spectrum import Spectrum

__all__ = [
    "get_sino",
    "get_recon",
    "get_basismat_sinos",
    "effective_water_mu",
    "simulate_dect",
    "DectResult",
]


def effective_water_mu(spec, geometry, calibration_cm=10.0):
    """Effective water attenuation [1/cm] for HU conversion of
    polyenergetic reconstructions (SURVEY.md §3.4; HU formula pinned at
    plots.py:140-143).

    Defined through a finite calibration thickness:
    ``mu_eff = -ln( sum i0 exp(-mu_w t) / sum i0 ) / t`` with the
    detector-weighted fluence — i.e. the slope the scanner actually
    measures through ``calibration_cm`` of water.  ``calibration_cm -> 0``
    recovers the thin-sample (fluence-mean) limit; a finite default centers
    body-sized water objects near 0 HU despite beam hardening (residual
    cupping is removed by the BHC stage, ops/bhc.py).
    """
    w = sp_ops.effective_fluence(spec, geometry)
    mu_w = _water_mu(spec.E)
    t = max(float(calibration_cm), 1e-6)
    trans = float(np.sum(w * np.exp(-mu_w * t)) / np.sum(w))
    return -np.log(max(trans, 1e-300)) / t


def _water_mu(e):
    from ..physics import xcom

    return xcom.mixatten("H(11.2)O(88.8)", e)


def get_sino(ct, phantom, spec, *, noise="none", key=None, paths=None,
             bowtie=None, tcm=None, sigma_e=0.0):
    """Forward project one polyenergetic acquisition.

    Reference signature/return (main.py:120): ``(sino_raw, sino_log)``,
    both [N_proj, N_channels]; ``sino_raw`` in detected counts, ``sino_log``
    the log-normalized line-integral sinogram.

    ``paths`` lets callers reuse a precomputed material-path sinogram
    (the DE driver traces once for both spectra).  ``bowtie``
    (ops/bowtie.py) applies channel-dependent beam-shaping filtration;
    the log normalization then uses the per-channel air counts.
    ``tcm`` (pipeline/tcm.py) modulates the tube output per view.
    """
    if paths is None:
        paths = material_path_sinogram(phantom, ct)
    return sp_ops.forward_counts(paths, phantom, spec, ct, noise=noise,
                                 key=key, bowtie=bowtie, tcm=tcm,
                                 sigma_e=sigma_e)


def get_recon(sino_log, ct, spec, N_matrix, FOV, ramp, *, window="sinc"):
    """Fan-beam FBP reconstruction.

    Reference signature/return (main.py:134): ``(recon_raw, recon_HU)`` —
    raw in cm^-1, HU via the spectrum's effective water attenuation.  For
    basis-material sinograms the reference passes a filler spectrum and
    discards recon_HU (main.py:168); passing ``spec=None`` here skips the
    HU conversion and returns ``(recon_raw, None)``.
    """
    mu_w = None if spec is None else effective_water_mu(spec, ct)
    return fbp_ops.fbp_recon(jnp.asarray(sino_log), ct, int(N_matrix),
                             float(FOV), float(ramp), window,
                             mu_water_eff=mu_w)


def get_basismat_sinos(ct, sino_raw_1, sino_raw_2, spec1, spec2, n_iters=30,
                       mask_thresh=0.95, **kw):
    """Dual-energy basis material decomposition.

    Reference signature/return (matdecomp.py:167-207): two basis-material
    sinograms [N_proj, N_channels] in g/cm^2 (ICRU tissue, ICRU bone), with
    air rays masked to zero.
    """
    return md_ops.decompose_sinograms(
        ct, sino_raw_1, sino_raw_2, spec1, spec2, n_iters=n_iters,
        mask_thresh=mask_thresh, **kw,
    )


@dataclasses.dataclass
class DectResult:
    """All artifacts of one dual-energy acquisition (SURVEY.md §3.1)."""

    sino_raw: tuple  # (raw1, raw2) counts
    sino_log: tuple  # (log1, log2)
    recon_raw: tuple  # (raw1, raw2) [cm^-1]
    recon_HU: tuple  # (HU1, HU2)
    mat_sinos: tuple  # (mat1, mat2) [g/cm^2]
    mat_recons: tuple  # (mat1, mat2) [g/cm^3]


def simulate_dect(ct, phantom, spec1, spec2, N_matrix, FOV, ramp, *,
                  n_iters=50, noise="none", key=None, window="sinc",
                  do_recon=True):
    """The full DE pipeline: trace once -> two acquisitions -> GN
    decomposition -> FBP of everything.

    Mirrors the reference main loop (main.py:101-176) as a function; the
    compute path stays on device end to end with no host round-trips
    between views (BASELINE.json north star).
    """
    paths = material_path_sinogram(phantom, ct)
    keys = (jax.random.split(key, 2) if key is not None else (None, None))
    raw1, log1 = get_sino(ct, phantom, spec1, noise=noise, key=keys[0],
                          paths=paths)
    raw2, log2 = get_sino(ct, phantom, spec2, noise=noise, key=keys[1],
                          paths=paths)
    mat1, mat2 = get_basismat_sinos(ct, raw1, raw2, spec1, spec2,
                                    n_iters=n_iters)
    if not do_recon:
        return DectResult((raw1, raw2), (log1, log2), (None, None),
                          (None, None), (mat1, mat2), (None, None))
    r1, h1 = get_recon(log1, ct, spec1, N_matrix, FOV, ramp, window=window)
    r2, h2 = get_recon(log2, ct, spec2, N_matrix, FOV, ramp, window=window)
    m1r, _ = get_recon(mat1, ct, None, N_matrix, FOV, ramp, window=window)
    m2r, _ = get_recon(mat2, ct, None, N_matrix, FOV, ramp, window=window)
    return DectResult((raw1, raw2), (log1, log2), (r1, r2), (h1, h2),
                      (mat1, mat2), (m1r, m2r))


def load_spectrum(spec_id, dose, ct, spectrum_dir="./input/spectrum"):
    """Load a ``{spec_id}_1mGy_float32.bin`` spectrum and scale to the
    acquisition dose — the reference's convenience loader
    (main.py:64-69): counts per channel per view = fluence/mGy * A_iso *
    dose / N_proj."""
    fname = f"{spectrum_dir}/{spec_id}_1mGy_float32.bin"
    spec = Spectrum.from_file(fname, spec_id)
    spec.rescale_counts(ct.A_iso * dose / ct.N_proj)
    return spec
