"""Automatic exposure control: tube-current (mA) modulation.

Reference anchor: the reference exposes ONE global fluence scale per
scan (``N_photons_per_cm2_per_scan``, params.txt; applied via
``Spectrum.rescale_counts``) and its dose studies sweep it uniformly
(plots.py dose/CNR panels).  AEC generalizes that scalar to a per-view
profile ``s[V]`` — clinical tube-current modulation, angular and
longitudinal — chosen to minimize patient dose at a target image
variance (or minimize variance at fixed dose).

The modulation rule is derived inside THIS package's own noise model,
not imported as a heuristic.  Per ray, the log-sinogram variance is
``var_log ≈ e^{L} / I0_eff`` (ops/noisemap.log_variance with Poisson
counts), and FBP variance at a pixel is a fixed positive combination
of per-view ray variances (ops/noisemap.fbp_variance_map).  With
per-view fluence ``I0 * s(v)`` the image variance is
``sum_v V(v)/s(v)`` (up to view-independent weights) where
``V(v) = mean_ch e^{L(v, ch)}``, while dose is ``∝ sum_v s(v)``.
Minimizing dose at fixed variance (Lagrange) gives the square-root
rule ``s(v) ∝ sqrt(V(v))`` — the classic angular-AEC optimum,
re-derived from the compound-Poisson EID model.

Exactness under modulation: the log sinogram divides counts by the
per-view air level ``air * s(v)``, so a noiseless modulated scan's
line integrals are IDENTICAL to the unmodulated scan's; and the
per-ray Poisson MLE is invariant to a per-ray fluence scale shared by
every energy bin (the log-likelihood gradient scales uniformly), so
``decompose_sinograms`` on counts divided by ``s`` solves the same
fixed point.  AEC therefore composes with the whole existing chain —
no kernel changes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "view_noise_potential",
    "aec_profile",
    "normalize_counts",
    "z_profile_from_volume",
]


def view_noise_potential(log_sino, *, target="center", frac=0.05,
                         clip_L=60.0):
    """Per-view noise potential ``V(v)``.

    ``log_sino``: [V, C] (or [V, C, R] for cone rows — row axes are
    averaged) line integrals from a planning/scout acquisition (a
    noiseless forward model, a low-dose prescan, or the previous
    rotation of a helical scan).

    ``target='center'`` (default): the FBP variance of a central-ROI
    pixel takes each view's contribution through the ray that crosses
    the pixel (the convolution kernel decays fast off that channel),
    i.e. the central channels — so ``V(v) = mean of e^L over the
    central ``frac`` of channels`` (default 5%: about a +-1 cm ROI at
    iso for a 0.9 rad fan at SID 60; wider windows dilute the
    potential with off-target and air rays).  This is the clinical AEC
    objective (noise at the patient center).  ``target='mean'``
    averages all channels (a whole-image objective; air channels
    dilute it).  The clip guards against metal-trace outliers (the
    profile is a ratio, so clipping only flattens extreme views).
    """
    L = np.asarray(log_sino, np.float64)
    L = np.clip(L, None, clip_L)
    while L.ndim > 2:  # average detector-row axes
        L = L.mean(-1)
    if target == "center":
        C = L.shape[1]
        w = max(int(round(C * frac)), 1)
        lo = (C - w) // 2
        L = L[:, lo:lo + w]
    elif target != "mean":
        raise ValueError(f"unknown target={target!r}")
    return np.exp(L).mean(axis=1)


def aec_profile(log_sino, *, floor=0.25, ceil=4.0, normalize="dose",
                smooth_views=0):
    """Square-root-rule tube-current profile from a planning sinogram.

    Returns ``(s, info)``: ``s`` [V] the relative per-view fluence
    (multiply counts — and the air normalization — by it), and
    ``info`` a dict with the model-predicted effect:

    * ``normalize='dose'``  — mean(s) = 1 (same total dose as the
      uniform scan); ``info['var_ratio']`` = predicted image-variance
      ratio vs uniform (< 1 for any non-circular object).
    * ``normalize='noise'`` — predicted variance matches the uniform
      scan; ``info['dose_ratio']`` = total-dose ratio vs uniform
      (< 1: the dose saving at equal noise).

    ``floor``/``ceil`` bound the generator's dynamic range (clinical
    tubes clamp mA); the normalization is re-applied after clipping.
    ``smooth_views``: odd moving-average window over views (tube
    current slews smoothly; 0 = off).
    """
    V = view_noise_potential(log_sino)
    s = np.sqrt(V)
    if smooth_views and smooth_views > 1:
        k = int(smooth_views) | 1
        pad = k // 2
        # circular: the view axis is periodic over a full rotation
        s = np.convolve(np.pad(s, pad, mode="wrap"),
                        np.ones(k) / k, mode="valid")
    s = s / s.mean()
    for _ in range(8):  # clip + renormalize to a fixed point
        s_c = np.clip(s, floor, ceil)
        if normalize == "dose":
            s_new = s_c / s_c.mean()
        elif normalize == "noise":
            # variance(s) = sum V/s; match the uniform scan's sum(V)
            scale = np.mean(V / s_c) / np.mean(V)
            s_new = s_c * scale
        else:
            raise ValueError(f"unknown normalize={normalize!r}")
        if np.allclose(s_new, s, rtol=1e-12, atol=0):
            s = s_new
            break
        s = s_new
    s = np.clip(s, floor, ceil)
    var_ratio = float(np.mean(V / s) / np.mean(V))
    dose_ratio = float(np.mean(s))
    return s, {"var_ratio": var_ratio, "dose_ratio": dose_ratio,
               "potential": V}


def normalize_counts(counts, s):
    """Divide modulated counts by the known per-view fluence scale.

    The result feeds :func:`~dexct_tpu.ops.matdecomp.decompose_sinograms`
    unchanged: a per-ray uniform fluence scale leaves the Poisson-MLE
    stationary point exactly where it was (the score scales by ``s``),
    so normalize-then-decompose is the exact AEC-aware solve, not an
    approximation.  ``s`` broadcasts over trailing (channel/row) axes.
    """
    s = jnp.asarray(s, jnp.result_type(counts))
    return counts / s.reshape(s.shape + (1,) * (jnp.ndim(counts) - 1))


def z_profile_from_volume(phantom, ct, spec=None):
    """Longitudinal (z) modulation seed: water-equivalent area per slice.

    The z-analog of the angular rule at planning time: per slice,
    ``A_w(z) = sum_xy mu_rel * dx * dy`` (attenuation-weighted object
    area, the quantity a lateral+AP scout pair estimates).  The
    returned per-VIEW profile maps each view's source z
    (``ct.source_z``) to ``sqrt(exp(k * A_w))``-style modulation is
    left to :func:`aec_profile` — this helper only supplies the
    per-view potential proxy ``V(v) = exp(L_eff(z_v))`` with
    ``L_eff(z) = mu_w * d_weq(z)`` and ``d_weq`` the water-equivalent
    diameter of the slice at the view's table position.

    Returns (V_view [V], d_weq [nz]).  Use
    ``s = sqrt(V_view); s /= s.mean()`` or feed a combined
    angular x z potential product into the sqrt rule.
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
    # attenuation-equivalent water area per slice -> equivalent diameter
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
    V_view = np.exp(mu_w * d_weq[zi])
    return V_view, d_weq
