"""Polyenergetic forward model: material paths -> detected counts.

The second half of the reference's ``get_sino`` (/root/reference/main.py:120;
physics form pinned by the decomposition solver's identical forward model,
matdecomp.py:116-118 and 144-151):

    counts(ray) = sum_E I0(E) eta(E) [E if eid] dE * exp(-sum_m l_m mu_m(E))

On TPU this is two MXU matmuls over the material-path sinogram produced by
:mod:`dexct_tpu.ops.siddon`:

    L[rays, E]   = paths[rays, mats] @ mu[mats, E]
    counts[rays] = exp(-L) @ i0_eff[E]

plus optional Poisson noise (an explicit, seedable stage — the reference's
noise behavior is not observable in the snapshot, SURVEY.md §2.3 decision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "effective_fluence",
    "counts_from_paths",
    "log_sinogram",
    "sample_noise",
    "forward_counts",
]


def effective_fluence(spec, geometry):
    """Detector-weighted fluence per energy bin: i0_eff[E] (host, float64).

    ``I0(E) * eta(E) * [E if eid] * dE`` with dE[0] = E[0] — exactly the
    construction the GN decomposition applies on its union grid
    (matdecomp.py:146-151), evaluated here on the spectrum's own grid.
    """
    resp = geometry.detector_response(spec.E)
    return spec.I0 * resp * spec.bin_widths()


def second_moment_fluence(spec, geometry):
    """Second-moment table for compound-Poisson noise: i2[E].

    EID: detected photons are Poisson and the signal weights each by
    w(E) = eta(E) * E, so var(signal) = sum_E n(E) w(E)^2 with n = I0 dE
    photon counts.  (Treating the energy-weighted signal itself as
    Poisson — the reference's implicit model — understates noise by
    ~E_eff.)

    PCD: detection is a Poisson thinning — each detected photon counts
    once — so var = mean = sum_E n(E) eta(E); the compound sampler then
    reduces exactly to the Poisson model (round-1 advisor finding: the
    EID n eta^2 form understated PCD noise whenever eta < 1).
    """
    n = spec.I0 * spec.bin_widths()  # photons per bin
    w = geometry.detector_response(spec.E)  # eta * E when eid, else eta
    return n * w * w if geometry.eid else n * w


@functools.partial(jax.jit, static_argnames=("per_channel",))
def counts_from_paths(paths, mu_table, i0_eff, *, per_channel=False):
    """Detected signal per ray.

    paths:    [..., n_mats] material path lengths [cm]
    mu_table: [n_mats, E] linear attenuation of each material [1/cm]
    i0_eff:   [E] effective fluence per bin — or, with
              ``per_channel=True``, a per-channel table [C, E] (bowtie
              filtration, ops/bowtie.py) contracted against rays laid
              out [..., V, C].  The flag is explicit because rank alone
              cannot distinguish [C, E] from the multi-bin pipelines'
              stacked [E, M] fluence tables (pipeline/spectralct.py).
    Returns [...] detected counts (energy-weighted signal for EID).
    """
    dtype = paths.dtype
    # explicit float32 matmul precision: the TPU default (bf16 passes)
    # costs ~0.4% on counts — far over the 1e-4 parity bar (CLAUDE.md)
    hi = jax.lax.Precision.HIGHEST
    L = jnp.matmul(paths, mu_table.astype(dtype), precision=hi)  # [..., E]
    # L >= 0 physically; the tight upper clip keeps float32 finite when an
    # approximate projector rings slightly negative at sharp edges (the
    # reference's symmetric ±700 guard, matdecomp.py:116, overflows f32)
    atten = jnp.exp(jnp.clip(-L, -700.0, 2.0))
    if per_channel:
        if i0_eff.ndim != 2:
            raise ValueError("per_channel=True requires a [C, E] i0 table")
        return jnp.einsum("...ce,ce->...c", atten, i0_eff.astype(dtype),
                          precision=hi)
    return jnp.matmul(atten, i0_eff.astype(dtype), precision=hi)


def log_sinogram(counts, air_counts):
    """Log-normalized line-integral sinogram: -ln(counts / air)."""
    c = jnp.maximum(counts, 1e-30)
    return -jnp.log(c / air_counts)


def sample_noise(key, counts, mode="poisson", var_scale=1.0, var=None):
    """Seedable detector-noise stage.

    mode='poisson': Poisson counting statistics on the detected signal —
        consistent with the decomposition's Poisson-MLE model
        (matdecomp.py:28-30).
    mode='gaussian': Normal approximation with variance ``var_scale *
        counts``.
    mode='compound': Normal with an explicit per-ray ``var`` array — the
        physically correct EID model (pair with
        :func:`second_moment_fluence`).
    mode='none': pass-through.
    """
    if mode == "none":
        return counts
    if mode == "compound":
        if var is None:
            raise ValueError("compound mode requires a per-ray var array")
        sigma = jnp.sqrt(jnp.maximum(var, 0.0))
        noisy = counts + sigma * jax.random.normal(key, counts.shape,
                                                   counts.dtype)
        return jnp.maximum(noisy, 0.0)
    if mode == "poisson":
        # the discrete sampler breaks down (and is pointless) at large
        # rates; switch to the asymptotically exact Gaussian limit there.
        # EID signals are energy-weighted and can reach ~1e10 per ray.
        big = counts > 1e5
        small = jax.random.poisson(
            key, jnp.where(big, 0.0, counts)).astype(counts.dtype)
        gauss = counts + jnp.sqrt(jnp.maximum(counts, 0.0)) * \
            jax.random.normal(key, counts.shape, counts.dtype)
        return jnp.where(big, jnp.maximum(gauss, 0.0), small)
    if mode == "gaussian":
        sigma = jnp.sqrt(jnp.maximum(counts * var_scale, 0.0))
        return counts + sigma * jax.random.normal(key, counts.shape,
                                                  counts.dtype)
    raise ValueError(f"unknown noise mode {mode!r}")


def forward_counts(paths, phantom, spec, geometry, *, noise="none", key=None,
                   dtype=jnp.float32, bowtie=None, tcm=None,
                   sigma_e=0.0):
    """paths -> (counts, log_sino): the get_sino back half.

    Returns device arrays shaped like ``paths[..., 0]``.  With a
    ``bowtie`` (ops/bowtie.py) the fluence — and the air normalization —
    become per-channel.  With ``tcm`` (a per-view relative output
    profile [V] from :func:`~dexct_tpu.pipeline.tcm.auto_tcm_profile`)
    the tube output is modulated per view: counts AND the compound-noise second
    moment scale by ``s(v)``, and the log normalization divides by the
    per-view air level — so the noiseless log sinogram is identical to
    the unmodulated scan's (tube-current modulation changes statistics,
    not line integrals).

    ``sigma_e`` (compound mode): additive ELECTRONIC noise std in
    detected-signal units per ray — the EID readout floor.  Quantum
    variance scales with the tube output but sigma_e^2 does not, so at
    starved doses the image noise flattens instead of following
    1/sqrt(dose) (the clinical low-dose wall; electronic noise is why
    PCDs win there).  Pick a physical scale via the air signal, e.g.
    ``sigma_e = 1e-4 * air`` for a 10^-4 dynamic-range floor.
    """
    e = spec.E
    mu_table = jnp.asarray(phantom.materials.mu_table(e), dtype)
    if bowtie is not None:
        from .bowtie import bowtie_fluence, bowtie_second_moment

        i0_h = bowtie_fluence(spec, geometry, bowtie)  # [C, E]
        air = jnp.asarray(i0_h.sum(-1), dtype)  # [C]
        i2_h = (bowtie_second_moment(spec, geometry, bowtie)
                if noise == "compound" else None)
    else:
        i0_h = effective_fluence(spec, geometry)
        air = float(np.sum(i0_h))
        i2_h = (second_moment_fluence(spec, geometry)
                if noise == "compound" else None)
    i0 = jnp.asarray(i0_h, dtype)
    per_ch = bowtie is not None
    counts = counts_from_paths(paths.astype(dtype), mu_table, i0,
                               per_channel=per_ch)
    if tcm is not None:
        # per-view tube-current modulation: s broadcasts over the
        # trailing channel (and row) axes
        s = jnp.asarray(tcm, dtype)
        s = s.reshape(s.shape + (1,) * (counts.ndim - 1))
        counts = counts * s
        air = air * s
    if noise != "none":
        if key is None:
            raise ValueError("noise sampling requires a PRNG key")
        var = None
        if noise == "compound":
            var = counts_from_paths(paths.astype(dtype), mu_table,
                                    jnp.asarray(i2_h, dtype),
                                    per_channel=per_ch)
            if tcm is not None:
                var = var * s
            if sigma_e:
                var = var + jnp.asarray(sigma_e, dtype) ** 2
        counts = sample_noise(key, counts, noise, var=var)
    return counts, log_sinogram(counts, air)
