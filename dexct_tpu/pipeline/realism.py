"""Composable scanner-realism chain: ordered artifact application and
reverse-ordered correction around the clean DE pipeline.

Each realism subsystem (gains/rings, scatter, detector MTF, afterglow,
pileup) is a counts-domain transform with a matching correction.  Real
data carries ALL of them at once, applied by the hardware in a definite
physical order:

    primary counts
      -> focal spot / crosstalk blur        (ops/mtf.py)
      -> scatter background                 (ops/scatter.py)
      -> pulse pileup                       (physics/pileup.py, PCD)
      -> channel gains                      (ops/rings.py)
      -> afterglow lag                      (ops/afterglow.py)
      -> counting noise

and the scanner's preprocessing inverts them in REVERSE order before
log/recon.  This module encodes exactly that: a ``Stage`` is an
(apply, correct) pair of [.., V, C] counts transforms; ``apply_chain``
runs the stages in order, ``correct_chain`` in reverse.  The
``simulate_dect_realistic`` driver wraps the standard fused DE
machinery (one shared trace, both spectra) with a chain per
acquisition and returns the usual
:class:`~dexct_tpu.pipeline.api.DectResult` — the one-call "dirty
scanner" simulation.

Everything stays jit-compatible: stages are closures over device
arrays, and the chain is a Python-level composition traced once.
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral as sp_ops
from .api import (DectResult, get_basismat_sinos, get_recon, get_sino,
                  material_path_sinogram)

__all__ = ["Stage", "apply_chain", "correct_chain",
           "stage_gains", "stage_scatter", "stage_physics_scatter",
           "stage_afterglow", "stage_mtf", "stage_pileup",
           "simulate_dect_realistic"]


@dataclasses.dataclass
class Stage:
    """One realism subsystem: ``apply(counts) -> counts`` (simulation)
    and ``correct(counts) -> counts`` (scanner preprocessing).  A
    ``correct=None`` stage is simulation-only (an uncorrected
    artifact)."""

    name: str
    apply: typing.Callable
    correct: typing.Callable | None = None


def apply_chain(counts, stages):
    for st in stages:
        counts = st.apply(counts)
    return counts


def correct_chain(counts, stages):
    for st in reversed(stages):
        if st.correct is not None:
            counts = st.correct(counts)
    return counts


def stage_gains(gains, air, n_cal_views=256):
    """Per-channel gain errors; correction = air-scan calibration (the
    estimator sees a simulated noiseless air scan of ``n_cal_views``
    views — its 1/sqrt(V*i0) precision is far below everything else)."""
    from ..ops.rings import air_calibration_gains, apply_channel_gains

    g = jnp.asarray(gains)
    g_hat = air_calibration_gains(
        air * jnp.broadcast_to(g, (int(n_cal_views), g.shape[-1])), air)

    return Stage("gains",
                 lambda c: apply_channel_gains(c, g),
                 lambda c: c / g_hat)


def stage_scatter(air, kernel, *, spr=0.2, grid_p=0.95, grid_s=0.2,
                  n_iters=3):
    from ..ops.scatter import add_scatter, correct_scatter

    k = jnp.asarray(kernel)
    return Stage(
        "scatter",
        lambda c: add_scatter(c, air, k, spr=spr, grid_p=grid_p,
                              grid_s=grid_s),
        lambda c: correct_scatter(c, air, k, spr=spr, grid_p=grid_p,
                                  grid_s=grid_s, n_iters=n_iters))


def stage_physics_scatter(scatter_sino, *, grid_p=1.0, grid_s=1.0,
                          corrected=True, estimate=None):
    """Additive single-scatter background from the first-principles
    estimator (:func:`~dexct_tpu.ops.scatter_physics.
    single_scatter_sinogram`), precomputed for the SAME views as the
    acquisition.  ``grid_p``/``grid_s`` are the anti-scatter grid's
    primary/scatter transmissions (matching ``stage_scatter``'s
    convention, so swapping the empirical stage for this one keeps the
    grid's ~5 % primary penalty).  The correction divides out
    ``grid_p`` and subtracts ``estimate`` (default: the true
    ``scatter_sino`` — a perfect model-based correction; pass a coarser
    estimate to study model mismatch), clamped at zero."""
    s_true = jnp.asarray(scatter_sino)
    s_est = s_true if estimate is None else jnp.asarray(estimate)
    corr = ((lambda c: jnp.maximum(c / grid_p - (grid_s / grid_p) * s_est,
                                   0.0))
            if corrected else None)
    return Stage("physics_scatter",
                 lambda c: grid_p * c + grid_s * s_true,
                 corr)


def stage_afterglow(fractions, decay, *, warm_start=True):
    from ..ops.afterglow import apply_afterglow, correct_afterglow

    return Stage(
        "afterglow",
        lambda c: apply_afterglow(c, fractions, decay,
                                  warm_start=warm_start),
        lambda c: correct_afterglow(c, fractions, decay,
                                    warm_start=warm_start))


def stage_mtf(kernel, *, nsr=1e-4):
    from ..ops.mtf import apply_detector_mtf, wiener_restore_channels

    k = np.asarray(kernel)
    return Stage("mtf",
                 lambda c: apply_detector_mtf(c, jnp.asarray(k)),
                 lambda c: wiener_restore_channels(c, k, nsr=nsr))


def stage_pileup(tau_ratio, model="nonparalyzable"):
    """Total-rate dead time on an EID/PCD single-counts stream (for the
    per-bin spectral version use physics.pileup in the PCD pipeline)."""
    from ..physics.pileup import recorded_rate, true_rate

    return Stage(
        "pileup",
        lambda c: recorded_rate(c * tau_ratio, model) / tau_ratio,
        lambda c: true_rate(c * tau_ratio, model) / tau_ratio)


def simulate_dect_realistic(ct, phantom, spec1, spec2, N_matrix, FOV,
                            ramp, stages1, stages2=None, *, n_iters=50,
                            noise="none", key=None, window="sinc",
                            correct=True, do_recon=True, bowtie=None):
    """Full DE pipeline through a realism chain.

    ``stages1`` / ``stages2``: the artifact chains of the two
    acquisitions (``stages2=None`` reuses ``stages1`` — fine when the
    stages are flux-independent).  Artifacts apply in order, then
    noise; correction (if ``correct``) runs the chain inverse before
    the log and everything downstream (decomposition, recons) is the
    standard machinery.

    ``bowtie`` (ops/bowtie.py) puts beam-shaping filtration under the
    whole chain: per-channel fluence in the clean counts and the
    compound-noise second moment, per-channel air normalization, and
    the thickness-grouped decomposition (exact per-group spectra).
    """
    if stages2 is None:
        stages2 = stages1
    paths = material_path_sinogram(phantom, ct)
    keys = (jax.random.split(key, 2) if key is not None
            else (None, None))
    out_raw, out_log = [], []
    for spec, stages, k in ((spec1, stages1, keys[0]),
                            (spec2, stages2, keys[1])):
        clean, _ = get_sino(ct, phantom, spec, paths=paths, bowtie=bowtie)
        meas = apply_chain(clean, stages)
        if noise != "none":
            if k is None:
                raise ValueError("noise requires a PRNG key")
            if noise == "compound":
                # the physically correct EID model (CLAUDE.md): the
                # clean second-moment table, rate-scaled by what the
                # artifact chain did to the mean counts (first-order
                # propagation — the chain's transforms rescale event
                # rates, so variance scales with them)
                mu_t = jnp.asarray(
                    phantom.materials.mu_table(spec.E), meas.dtype)
                if bowtie is not None:
                    from ..ops.bowtie import bowtie_second_moment

                    i2 = jnp.asarray(
                        bowtie_second_moment(spec, ct, bowtie), meas.dtype)
                else:
                    i2 = jnp.asarray(
                        sp_ops.second_moment_fluence(spec, ct), meas.dtype)
                var = sp_ops.counts_from_paths(paths, mu_t, i2,
                                               per_channel=bowtie is not None)
                var = var * meas / jnp.maximum(clean, 1e-30)
                meas = sp_ops.sample_noise(k, meas, noise, var=var)
            else:
                meas = sp_ops.sample_noise(k, meas, noise)
        prim = correct_chain(meas, stages) if correct else meas
        if bowtie is not None:
            from ..ops.bowtie import bowtie_fluence

            air = jnp.asarray(
                bowtie_fluence(spec, ct, bowtie).sum(-1), prim.dtype)
        else:
            air = float(np.sum(sp_ops.effective_fluence(spec, ct)))
        out_raw.append((meas, prim, air))
        out_log.append(sp_ops.log_sinogram(prim, air))

    (m1, p1, a1), (m2, p2, a2) = out_raw
    log1, log2 = out_log
    if bowtie is not None:
        from ..ops.bowtie import decompose_sinograms_bowtie

        mat1, mat2 = decompose_sinograms_bowtie(ct, p1, p2, spec1, spec2,
                                                bowtie, n_iters=n_iters)
    else:
        mat1, mat2 = get_basismat_sinos(ct, p1, p2, spec1, spec2,
                                        n_iters=n_iters)
    if not do_recon:
        return DectResult((m1, m2), (log1, log2), (None, None),
                          (None, None), (mat1, mat2), (None, None))
    r1, h1 = get_recon(log1, ct, spec1, N_matrix, FOV, ramp,
                       window=window)
    r2, h2 = get_recon(log2, ct, spec2, N_matrix, FOV, ramp,
                       window=window)
    m1r, _ = get_recon(mat1, ct, None, N_matrix, FOV, ramp,
                       window=window)
    m2r, _ = get_recon(mat2, ct, None, N_matrix, FOV, ramp,
                       window=window)
    return DectResult((m1, m2), (log1, log2), (r1, r2), (h1, h2),
                      (mat1, mat2), (m1r, m2r))
