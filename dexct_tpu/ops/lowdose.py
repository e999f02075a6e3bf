"""Synthetic dose reduction: turn one acquired scan into a lower-dose one.

The standard clinical validation tool (low-dose protocol studies reuse
patient scans instead of re-irradiating): given the detected counts of a
scan at dose D0, synthesize a statistically correct realization at dose
f*D0 (f < 1).  The reference's dose studies re-simulate every dose level
from scratch (plots.py:631+); this module derives the low-dose scan from
a single high-dose acquisition, which is the only option for measured
data and ~free for simulated sweeps.

Two statistics models, matching :func:`~dexct_tpu.ops.spectral.sample_noise`:

* **poisson** (PCD or idealized counting): exact *binomial thinning* —
  if y ~ Poisson(lam) then Binomial(y, f) ~ Poisson(f*lam) exactly, so
  the synthesized scan is indistinguishable from a real scan at f*D0
  (not just second-moment matched).  Above the same 1e5-count threshold
  the forward sampler uses, the asymptotically exact Gaussian limit
  N(f*y, f*(1-f)*y) replaces the discrete sampler.
* **compound** (EID, energy-weighted signal): the signal is a compound
  Poisson sum with per-ray quantum variance var_q proportional to the
  tube output; scaling the realization by f scales its fluctuations by
  f too, which is *too little* noise (a real f-dose scan fluctuates
  like sqrt(f)).  The synthesizer adds the deficit as zero-mean
  Gaussian noise:

      y_f = f*y + N(0,  f*(1-f)*var_q  +  sigma_e^2 - f^2*sigma_e0^2)

  so mean and variance both match the true low-dose scan: E = f*mu,
  Var = f*var_q + sigma_e^2.  Electronic readout noise (sigma_e) does
  NOT scale with dose — which is exactly why synthetic dose reduction
  must treat it separately: the input's floor sigma_e0 shrinks by f
  with the scaling while the target scan keeps a full-size floor.

``var_q`` is the *quantum* variance of the INPUT ray (at D0).  For
simulated data pass the exact per-ray second moment (the ``var`` that
:func:`~dexct_tpu.ops.spectral.forward_counts` computes in compound
mode, WITHOUT the sigma_e^2 term).  For measured data use
``var_q = quantum_var_ratio(spec, geometry) * counts`` — the air-spectrum
swank ratio; beam hardening raises the true ratio on attenuated rays,
so this under-adds noise by the hardening of the mean photon weight
(a few % for kV beams through tissue; documented, measured in the
tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import effective_fluence, second_moment_fluence

__all__ = ["synthesize_low_dose", "quantum_var_ratio"]

_BIG = 1e5  # same discrete->Gaussian threshold as spectral.sample_noise


def quantum_var_ratio(spec, geometry):
    """Air-spectrum quantum variance-to-mean ratio r = sum(i2)/sum(i0).

    For an EID ray with detected signal y, var_q ~= r * y — exact in
    air, an underestimate through an object (hardening raises the mean
    photon weight).  Unity for an ideal photon counter.
    """
    i0 = np.sum(effective_fluence(spec, geometry))
    i2 = np.sum(second_moment_fluence(spec, geometry))
    return float(i2 / np.maximum(i0, 1e-300))


def synthesize_low_dose(key, counts, f, *, mode="poisson", var_q=None,
                        sigma_e=0.0, sigma_e0=0.0):
    """Synthesize a dose-f*D0 realization from a dose-D0 scan.

    key:     PRNG key; counts: detected signal at D0 (any shape);
    f:       dose fraction in (0, 1];
    mode:    'poisson' (exact thinning) or 'compound' (EID second-moment
             match, requires ``var_q``);
    var_q:   per-ray QUANTUM variance of the input scan (compound mode;
             no electronic term — pass sigma_e0 separately);
    sigma_e: electronic noise std of the TARGET scan (signal units);
    sigma_e0: electronic noise std already present in the INPUT.

    Returns an array shaped like ``counts``.  f == 1 with matching
    sigma_e returns the input unchanged.
    """
    if not 0.0 < f <= 1.0:
        raise ValueError(f"dose fraction f must be in (0, 1], got {f}")
    y = jnp.asarray(counts)
    f = jnp.asarray(f, y.dtype)
    if mode == "poisson":
        if float(sigma_e) or float(sigma_e0):
            raise ValueError(
                "electronic noise is an EID effect; use mode='compound'")
        # exact thinning below the threshold, Gaussian limit above
        big = y > _BIG
        n_small = jnp.where(big, 0.0, jnp.maximum(y, 0.0))
        small = jax.random.binomial(
            key, n_small.astype(jnp.float32), jnp.float32(f)
        ).astype(y.dtype)
        gauss = f * y + jnp.sqrt(jnp.maximum(f * (1.0 - f) * y, 0.0)) * \
            jax.random.normal(key, y.shape, y.dtype)
        return jnp.where(big, jnp.maximum(gauss, 0.0), small)
    if mode == "compound":
        if var_q is None:
            raise ValueError("compound mode requires the per-ray var_q "
                             "(quantum variance of the input scan)")
        vq = jnp.asarray(var_q, y.dtype)
        var_add = (f * (1.0 - f) * vq
                   + jnp.asarray(sigma_e, y.dtype) ** 2
                   - f * f * jnp.asarray(sigma_e0, y.dtype) ** 2)
        # a target floor smaller than the scaled input floor is
        # unreachable by adding noise; clamp and let the caller know
        # through the docstring contract (sigma_e >= f*sigma_e0 always
        # holds for physical dose reduction on one detector)
        sigma_add = jnp.sqrt(jnp.maximum(var_add, 0.0))
        out = f * y + sigma_add * jax.random.normal(key, y.shape, y.dtype)
        return jnp.maximum(out, 0.0)
    raise ValueError(f"unknown mode {mode!r}")
