"""Tube current modulation (TCM / "auto-mA").

Real scanners vary the tube output per view — more photons through the
patient's long axis, fewer through the thin one — equalizing the
detected counts (and therefore the per-view noise) around the rotation.
The reference's forward model has a fixed per-view output
(/root/reference/main.py:68 rescales once for the whole scan).

TPU mapping: modulation is one [V]-vector broadcast over the counts —
the shared trace, spectral chain, decomposition, and FBP are all
unchanged.  The acquired counts scale by m_v; reconstruction and
decomposition consume the OUTPUT-NORMALIZED counts (counts / m_v, the
scanner's own correction), so the only physical effect is on the noise
realization — exactly the real system's behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spectral as sp_ops
from .api import (DectResult, get_basismat_sinos, get_recon,
                  material_path_sinogram)

__all__ = ["auto_tcm_profile", "simulate_tcm_dect"]


def auto_tcm_profile(ct, phantom, spec, *, strength=1.0, m_min=0.2,
                     m_max=4.0, paths=None):
    """Noise-optimal modulation profile m[V] (mean 1).

    The scout model: a view's variance contribution after log +
    reconstruction is ``W_v / m_v`` with ``W_v = mean_c 1/T_vc`` (the
    inverse transmitted fractions — dominated by the most attenuated
    rays, which is what makes TCM pay; a MEAN-transmission metric is
    nearly view-invariant because the Radon transform conserves the
    object's mass across views).  Minimizing ``sum_v W_v/m_v`` at fixed
    total output ``sum_v m_v`` gives ``m_v ∝ sqrt(W_v)`` — that is
    ``strength=1``; the exponent scales as ``strength/2`` (0 = no
    modulation).  Clipped to ``[m_min, m_max]`` (tube limits) and
    normalized to mean 1 so the TOTAL scan output is unchanged.
    """
    if paths is None:
        paths = material_path_sinogram(phantom, ct)
    mu_t = jnp.asarray(phantom.materials.mu_table(spec.E), jnp.float32)
    i0 = jnp.asarray(sp_ops.effective_fluence(spec, ct), jnp.float32)
    counts = sp_ops.counts_from_paths(jnp.asarray(paths, jnp.float32),
                                      mu_t, i0)
    air = float(np.sum(sp_ops.effective_fluence(spec, ct)))
    w_v = jnp.mean(air / jnp.maximum(counts, air * 1e-8), axis=-1)  # [V]
    m = w_v ** (0.5 * float(strength))
    # normalize/clip to a joint fixed point: the tube limits are
    # relative to the mean output (clipping raw sqrt-weights saturates
    # every view on strongly attenuating objects), and renormalizing
    # AFTER a single clip can push capped views back over m_max — so
    # iterate.  The final clip wins: the returned profile always obeys
    # the limits; when they bind hard its mean can fall slightly
    # below 1 (the tube genuinely cannot deliver the requested total).
    for _ in range(16):
        m = jnp.clip(m / jnp.mean(m), m_min, m_max)
    return m


def simulate_tcm_dect(ct, phantom, spec1, spec2, N_matrix, FOV, ramp, *,
                      m=None, strength=1.0, n_iters=50, noise="none",
                      key=None, window="sinc", do_recon=True):
    """The full DE pipeline with per-view tube current modulation.

    ``m``: [V] modulation (mean ~1), or None to derive it from the
    first spectrum's scout (:func:`auto_tcm_profile`).  With
    ``noise='none'`` the result is IDENTICAL to ``simulate_dect`` —
    modulation cancels in the normalization — so the function's whole
    effect is the physically correct per-view noise statistics:
    acquired counts (and their compound variance) scale with m_v, the
    normalized counts that enter log/decomposition divide it back out.
    """
    paths = material_path_sinogram(phantom, ct)
    if m is None:
        m = auto_tcm_profile(ct, phantom, spec1, strength=strength,
                             paths=paths)
    m = jnp.asarray(m, jnp.float32)
    mv = m[:, None]
    keys = (jax.random.split(key, 2) if key is not None else (None, None))

    raws, logs = [], []
    for spec, k in ((spec1, keys[0]), (spec2, keys[1])):
        mu_t = jnp.asarray(phantom.materials.mu_table(spec.E),
                           jnp.float32)
        i0 = jnp.asarray(sp_ops.effective_fluence(spec, ct), jnp.float32)
        counts = sp_ops.counts_from_paths(
            jnp.asarray(paths, jnp.float32), mu_t, i0) * mv
        air = float(np.sum(sp_ops.effective_fluence(spec, ct)))
        if noise != "none":
            if k is None:
                raise ValueError("noise sampling requires a PRNG key")
            var = None
            if noise == "compound":
                i2 = jnp.asarray(sp_ops.second_moment_fluence(spec, ct),
                                 jnp.float32)
                var = sp_ops.counts_from_paths(
                    jnp.asarray(paths, jnp.float32), mu_t, i2) * mv
            counts = sp_ops.sample_noise(k, counts, noise, var=var)
        norm = counts / mv  # the scanner's output normalization
        raws.append(norm)
        logs.append(sp_ops.log_sinogram(norm, air))

    mat1, mat2 = get_basismat_sinos(ct, raws[0], raws[1], spec1, spec2,
                                    n_iters=n_iters)
    if not do_recon:
        return DectResult(tuple(raws), tuple(logs), (None, None),
                          (None, None), (mat1, mat2), (None, None))
    r1, h1 = get_recon(logs[0], ct, spec1, N_matrix, FOV, ramp,
                       window=window)
    r2, h2 = get_recon(logs[1], ct, spec2, N_matrix, FOV, ramp,
                       window=window)
    m1r, _ = get_recon(mat1, ct, None, N_matrix, FOV, ramp, window=window)
    m2r, _ = get_recon(mat2, ct, None, N_matrix, FOV, ramp, window=window)
    return DectResult(tuple(raws), tuple(logs), (r1, r2), (h1, h2),
                      (mat1, mat2), (m1r, m2r))
