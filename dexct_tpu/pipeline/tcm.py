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

__all__ = ["auto_tcm_profile", "simulate_tcm_dect", "normalize_counts",
           "z_profile_from_volume"]


def auto_tcm_profile(ct, phantom, spec, *, strength=1.0, m_min=0.2,
                     m_max=4.0, paths=None, normalize="output",
                     channel_window=None, report=False):
    """Noise-optimal modulation profile m[V].

    The scout model: a view's variance contribution after log +
    reconstruction is ``W_v / m_v`` with ``W_v = mean_c 1/T_vc`` (the
    inverse transmitted fractions — dominated by the most attenuated
    rays, which is what makes TCM pay; a MEAN-transmission metric is
    nearly view-invariant because the Radon transform conserves the
    object's mass across views).  Minimizing ``sum_v W_v/m_v`` at fixed
    total output ``sum_v m_v`` gives ``m_v ∝ sqrt(W_v)`` — that is
    ``strength=1``; the exponent scales as ``strength/2`` (0 = no
    modulation).  Clipped to ``[m_min, m_max]`` (tube limits).

    ``channel_window``: optional fraction of CENTRAL channels for the
    ``W_v`` metric.  The FBP variance of a central-ROI pixel takes each
    view's contribution through the rays that cross the ROI (the ramp
    kernel decays fast off that channel), so a clinical center-targeted
    AEC uses ~the central 5 % of channels; ``None`` (default) keeps the
    all-channel metric (a whole-image objective — air channels dilute
    it on small objects).

    ``normalize='output'`` (default): mean(m) = 1 — the modulated scan
    delivers the SAME total output as the uniform one (minimum variance
    at fixed dose).  ``normalize='noise'``: m is scaled so the
    predicted image variance ``mean(W/m)`` matches the UNMODULATED
    scan's ``mean(W)`` — total output mean(m) < 1 is then the dose
    SAVING at equal noise.  Both iterate clip+rescale to a fixed point
    (clipping raw sqrt-weights saturates every view on strongly
    attenuating objects; renormalizing after one clip can push capped
    views back over m_max).  The final clip wins: the returned profile
    always obeys the limits.

    ``report=True``: return ``(m, info)`` with the model-predicted
    ``var_ratio`` (image variance vs uniform), ``dose_ratio`` (total
    output vs uniform = mean(m)), and the potential ``W``.
    """
    if paths is None:
        paths = material_path_sinogram(phantom, ct)
    mu_t = jnp.asarray(phantom.materials.mu_table(spec.E), jnp.float32)
    i0 = jnp.asarray(sp_ops.effective_fluence(spec, ct), jnp.float32)
    counts = sp_ops.counts_from_paths(jnp.asarray(paths, jnp.float32),
                                      mu_t, i0)
    air = float(np.sum(sp_ops.effective_fluence(spec, ct)))
    inv_t = air / jnp.maximum(counts, air * 1e-8)  # [V, C] = e^L
    if channel_window is not None:
        C = inv_t.shape[-1]
        w = max(int(round(C * float(channel_window))), 1)
        lo = (C - w) // 2
        inv_t = inv_t[..., lo:lo + w]
    w_v = jnp.mean(inv_t, axis=-1)  # [V]
    m = w_v ** (0.5 * float(strength))
    m = m / jnp.mean(m)
    for _ in range(16):
        m_c = jnp.clip(m, m_min, m_max)
        if normalize == "output":
            m = m_c / jnp.mean(m_c)
        elif normalize == "noise":
            m = m_c * (jnp.mean(w_v / m_c) / jnp.mean(w_v))
        else:
            raise ValueError(f"unknown normalize={normalize!r}")
    m = jnp.clip(m, m_min, m_max)
    if not report:
        return m
    info = {
        "var_ratio": float(jnp.mean(w_v / m) / jnp.mean(w_v)),
        "dose_ratio": float(jnp.mean(m)),
        "potential": np.asarray(w_v),
    }
    return m, info


def normalize_counts(counts, m):
    """Divide modulated counts by the known per-view output scale.

    The result feeds :func:`~dexct_tpu.ops.matdecomp.decompose_sinograms`
    unchanged: a per-ray fluence scale shared by every energy bin
    leaves the Poisson-MLE stationary point exactly where it was (the
    score scales uniformly by ``m``), so normalize-then-decompose is
    the exact TCM-aware solve, not an approximation.  ``m`` broadcasts
    over trailing (channel/row) axes.
    """
    m = jnp.asarray(m, jnp.result_type(counts))
    return counts / m.reshape(m.shape + (1,) * (jnp.ndim(counts) - 1))


def z_profile_from_volume(phantom, ct, spec=None):
    """Longitudinal (z) modulation seed: water-equivalent diameter per
    slice, mapped to the per-view potential along the table trajectory.

    Per slice, ``A_w(z) = sum_xy (mu/mu_w) dx dy`` (attenuation-weighted
    object area — the quantity a lateral+AP scout pair estimates), and
    ``d_weq = 2 sqrt(A_w/pi)``.  Each view's potential proxy is
    ``W(v) = exp(mu_w * d_weq(z_v))`` at the view's source z
    (``ct.source_z``; circular geometries read the central slice).
    Feed ``sqrt(W)`` — or the product with an angular potential — into
    the sqrt rule: ``m = sqrt(W); m /= m.mean()``.

    Returns ``(W_view [V], d_weq [nz])``.
    """
    from ..physics.materials import WATER

    labels = np.asarray(phantom.labels)
    if labels.ndim != 3:
        raise ValueError("z_profile_from_volume needs a 3-D phantom")
    nz = labels.shape[0]
    e_ref = 70.0 if spec is None else float(
        np.average(spec.E, weights=np.maximum(spec.I0, 0)))
    mu_tab = phantom.materials.mu_table(np.asarray([e_ref]))[:, 0]
    mu_w = float(WATER.linear_atten(np.asarray([e_ref]))[0])
    area_w = (mu_tab[labels] / mu_w).sum(axis=(1, 2)) * phantom.dx \
        * phantom.dy
    d_weq = 2.0 * np.sqrt(np.maximum(area_w, 0.0) / np.pi)
    src_z = getattr(ct, "source_z", None)
    betas = np.asarray(ct.betas, np.float64)
    if src_z is None or np.ndim(src_z) == 0:
        zi = np.full(len(betas), nz // 2)
    else:
        zs = (np.arange(nz) + 0.5 - nz / 2) * phantom.dz
        zi = np.clip(np.searchsorted(zs, np.asarray(src_z)), 0, nz - 1)
    W_view = np.exp(mu_w * d_weq[zi])
    return W_view, d_weq


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
