"""Dual-source dual-energy acquisition.

The fourth clinically deployed DE geometry (completing dual-scan =
the reference's mode, dual-layer, and fast kV-switching): TWO
tube/detector pairs mounted on one gantry ~90 deg apart, acquiring both
spectra SIMULTANEOUSLY — full DE data in a single rotation with no
per-view spectrum switching.  Its characteristic physics:

* **Angular offset** — tube B leads tube A by ``offset_views`` view
  spacings; after the full rotation each spectrum has a complete view
  set and aligning B onto A's angular grid is an EXACT ring roll (no
  interpolation — scanners pick the mount angle as an integer number
  of view spacings for exactly this reason).
* **Cross-scatter** — the mode's signature artifact: photons from tube
  A scattered in the patient land on detector B (which has no line of
  sight to tube A's primary beam) and vice versa.  Modeled with the
  framework's kernel-superposition machinery (ops/scatter.py): the
  cross term seeds from the OTHER tube's same-time-instant
  interaction profile, spread by a wide detector kernel, scaled by
  ``cross_spr``.  Correction is the coupled fixed point of the same
  model.

TPU mapping: one shared trace for both tubes (the view axis is a batch
dim), alignment is a roll, cross-scatter is two FFT-free channel
convolutions per view — everything fuses into the existing jitted DE
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral as sp_ops
from ..ops.scatter import _conv_channels, scatter_kernel
from .api import (DectResult, get_basismat_sinos, get_recon, get_sino,
                  material_path_sinogram)

__all__ = ["align_tube_b", "add_cross_scatter", "correct_cross_scatter",
           "simulate_dualsource_dect"]


def align_tube_b(sino_b_time, offset_views):
    """Map tube B's time-indexed sinogram onto tube A's angular grid.

    At time index v tube B points at ``beta_v + offset``; the sample it
    records there belongs at angular index ``v + offset_views`` of the
    common grid — a ring roll over the full rotation.
    """
    return jnp.roll(sino_b_time, int(offset_views), axis=0)


def add_cross_scatter(counts_a, counts_b, air_a, air_b, kernel, *,
                      cross_spr=0.1):
    """Measured counts of both detectors with cross-scatter added.

    ``counts_a`` / ``counts_b``: same-TIME-index primary counts [V, C]
    of the two tubes; the cross term on detector A seeds from tube B's
    simultaneous interaction profile ``counts_b * (1 - T_b)`` (photons
    removed from B's beam), spread by ``kernel`` and scaled by
    ``cross_spr`` — and symmetrically.  A wide kernel is physical: the
    scatter travels ~90 deg around the patient to the other detector.
    """
    t_a = counts_a / air_a
    t_b = counts_b / air_b
    s_on_a = cross_spr * _conv_channels(counts_b * (1.0 - t_b), kernel)
    s_on_b = cross_spr * _conv_channels(counts_a * (1.0 - t_a), kernel)
    return counts_a + s_on_a, counts_b + s_on_b


def correct_cross_scatter(meas_a, meas_b, air_a, air_b, kernel, *,
                          cross_spr=0.1, n_iters=3):
    """Coupled fixed-point removal of the cross-scatter background:
    re-estimate each detector's cross term from the OTHER's current
    primary estimate and subtract, alternating ``n_iters`` times
    (mirrors :func:`~dexct_tpu.ops.scatter.correct_scatter`)."""
    p_a, p_b = meas_a, meas_b
    for _ in range(n_iters):
        t_b = jnp.clip(p_b / air_b, 0.0, 1.0)
        t_a = jnp.clip(p_a / air_a, 0.0, 1.0)
        s_on_a = cross_spr * _conv_channels(p_b * (1.0 - t_b), kernel)
        s_on_b = cross_spr * _conv_channels(p_a * (1.0 - t_a), kernel)
        p_a = jnp.maximum(meas_a - s_on_a, 1e-6 * jnp.asarray(air_a))
        p_b = jnp.maximum(meas_b - s_on_b, 1e-6 * jnp.asarray(air_b))
    return p_a, p_b


def simulate_dualsource_dect(ct, phantom, spec_a, spec_b, N_matrix, FOV,
                             ramp, *, offset_views=None, cross_spr=0.0,
                             kernel_sigma_ch=80.0, correct=True,
                             n_iters=50, noise="none", key=None,
                             window="sinc", do_recon=True, motion=None):
    """One-rotation dual-source DECT.

    Tube A (``spec_a``) fires at ``betas[v]``, tube B (``spec_b``) at
    ``betas[v] + offset_views * dbeta`` (default: a quarter rotation,
    the clinical ~90 deg mount), both over one full rotation.  With
    ``cross_spr > 0`` the two time-synchronous count streams exchange
    kernel-superposition cross-scatter; ``correct`` runs the coupled
    fixed-point removal before decomposition.  Both tubes share one
    detector geometry here (real B detectors have a smaller FOV — model
    that by compositing with ops/truncation if needed).

    ``motion`` (a :class:`~dexct_tpu.ops.motion.MotionProfile` indexed
    by TIME) makes both tubes see the same instantaneous pose — the
    mode's temporal-resolution physics: the DE pair is acquired in ONE
    rotation, so the two spectra of a given ray are measured only a
    quarter-turn apart instead of a full rotation (dual-scan), and the
    DE registration error under motion shrinks accordingly
    (tests/test_acquisition_modes.py pins the comparison).

    Returns the standard :class:`~dexct_tpu.pipeline.api.DectResult` on
    tube A's angular grid.
    """
    V = ct.N_proj
    if offset_views is None:
        offset_views = V // 4
    offset_views = int(offset_views)
    rot = float(getattr(ct, "rotation_total", 2.0 * np.pi))
    if abs(rot - 2.0 * np.pi) > 1e-6:
        raise ValueError(
            "dual-source alignment ring-rolls a full 2*pi rotation "
            f"(got rotation_total={rot:.4f})")
    # tube A: angular == time grid.  tube B: time index v measures the
    # ray set of angular index (v + offset) — one roll of the shared
    # full-grid forward model (simultaneity matters only once the
    # streams couple through cross-scatter or motion).
    if motion is None:
        paths = material_path_sinogram(phantom, ct)
        paths_b_ang = paths
    else:
        from ..ops.motion import MotionProfile, \
            material_path_sinogram_motion

        if motion.n_views != V:
            raise ValueError(
                f"motion has {motion.n_views} views, geometry {V}")
        paths = material_path_sinogram_motion(phantom, ct, motion)
        # tube B's sample at ANGULAR index w is taken at time w - offset:
        # its pose track on the angular grid is the time track rolled
        motion_b = MotionProfile(np.roll(motion.phi, offset_views),
                                 np.roll(motion.disp, offset_views,
                                         axis=0))
        paths_b_ang = material_path_sinogram_motion(phantom, ct,
                                                    motion_b)
    raw_a, _ = get_sino(ct, phantom, spec_a, paths=paths)
    raw_b_ang, _ = get_sino(ct, phantom, spec_b, paths=paths_b_ang)
    raw_b_time = jnp.roll(raw_b_ang, -offset_views, axis=0)

    air_a = float(np.sum(sp_ops.effective_fluence(spec_a, ct)))
    air_b = float(np.sum(sp_ops.effective_fluence(spec_b, ct)))

    meas_a, meas_b_time = raw_a, raw_b_time
    kern = None
    if cross_spr > 0.0:
        kern = jnp.asarray(scatter_kernel(ct.N_channels,
                                          sigma_ch=kernel_sigma_ch))
        meas_a, meas_b_time = add_cross_scatter(
            raw_a, raw_b_time, air_a, air_b, kern, cross_spr=cross_spr)
    if noise != "none":
        if key is None:
            raise ValueError("noise requires a PRNG key")
        k1, k2 = jax.random.split(key)
        meas_a = sp_ops.sample_noise(k1, meas_a, noise)
        meas_b_time = sp_ops.sample_noise(k2, meas_b_time, noise)

    prim_a, prim_b_time = meas_a, meas_b_time
    if cross_spr > 0.0 and correct:
        prim_a, prim_b_time = correct_cross_scatter(
            meas_a, meas_b_time, air_a, air_b, kern,
            cross_spr=cross_spr)
    prim_b = align_tube_b(prim_b_time, offset_views)

    log_a = sp_ops.log_sinogram(prim_a, air_a)
    log_b = sp_ops.log_sinogram(prim_b, air_b)
    mat1, mat2 = get_basismat_sinos(ct, prim_a, prim_b, spec_a, spec_b,
                                    n_iters=n_iters)
    raws = (meas_a, align_tube_b(meas_b_time, offset_views))
    if not do_recon:
        return DectResult(raws, (log_a, log_b), (None, None),
                          (None, None), (mat1, mat2), (None, None))
    r1, h1 = get_recon(log_a, ct, spec_a, N_matrix, FOV, ramp,
                       window=window)
    r2, h2 = get_recon(log_b, ct, spec_b, N_matrix, FOV, ramp,
                       window=window)
    m1r, _ = get_recon(mat1, ct, None, N_matrix, FOV, ramp, window=window)
    m2r, _ = get_recon(mat2, ct, None, N_matrix, FOV, ramp, window=window)
    return DectResult(raws, (log_a, log_b), (r1, r2), (h1, h2),
                      (mat1, mat2), (m1r, m2r))
