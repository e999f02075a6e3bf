"""Float64 NumPy reference implementations used as test oracles.

These are deliberately *independent algorithms* from the device ops (e.g.
sort-based Siddon alpha-merging vs. the DDA scan in ops/siddon.py), serving
the device-vs-host numerical-parity strategy of SURVEY.md §4 item 4 — the
reference repo's own CuPy-vs-NumPy divergence (matdecomp.py:89-92) is the
cautionary tale that motivates testing the TPU path against a float64 host
path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["siddon_paths_numpy", "gauss_newton_decompose_numpy"]


def siddon_paths_numpy(labels, src, dirs, dx, dy, n_materials):
    """Exact per-material path lengths via Siddon alpha-merging (float64).

    labels: [Ny, Nx] ints; src/dirs: [R, 2]; returns [R, n_materials].
    """
    labels = np.asarray(labels)
    ny, nx = labels.shape
    x0, y0 = -0.5 * nx * dx, -0.5 * ny * dy
    src = np.asarray(src, np.float64)
    dirs = np.asarray(dirs, np.float64)
    out = np.zeros((src.shape[0], n_materials))

    xplanes = x0 + dx * np.arange(nx + 1)
    yplanes = y0 + dy * np.arange(ny + 1)

    for r in range(src.shape[0]):
        p, d = src[r], dirs[r]
        alphas = [np.array([])]
        t_lo, t_hi = -np.inf, np.inf
        for planes, pi, di in ((xplanes, p[0], d[0]), (yplanes, p[1], d[1])):
            if abs(di) > 1e-12:
                a = (planes - pi) / di
                alphas.append(a)
                t_lo = max(t_lo, min(a[0], a[-1]))
                t_hi = min(t_hi, max(a[0], a[-1]))
            else:
                if not (planes[0] <= pi <= planes[-1]):
                    t_lo, t_hi = np.inf, -np.inf
        t_lo = max(t_lo, 0.0)
        if t_lo >= t_hi:
            continue
        a = np.concatenate(alphas)
        a = np.unique(np.clip(a, t_lo, t_hi))
        a = np.union1d(a, [t_lo, t_hi])
        mids = 0.5 * (a[1:] + a[:-1])
        segs = np.diff(a)
        pts = p[None, :] + mids[:, None] * d[None, :]
        ix = np.clip(((pts[:, 0] - x0) / dx).astype(np.int64), 0, nx - 1)
        iy = np.clip(((pts[:, 1] - y0) / dy).astype(np.int64), 0, ny - 1)
        np.add.at(out[r], labels[iy, ix], segs)
    return out


def gauss_newton_decompose_numpy(counts, i0, mus, n_iters, eps_init=1e-6,
                                 step_max=5.0, a_bounds=(-20.0, 500.0),
                                 method="gn"):
    """Float64 vectorized Gauss-Newton basis decomposition oracle.

    Implements the Poisson-MLE Newton iteration of the reference solver
    (math traced in SURVEY.md §3.2 from /root/reference/matdecomp.py:87-127;
    Rigie & La Riviere 2015) with a closed-form 2x2 solve.

    counts: [n_meas, P] detected counts per measurement and pixel.
    i0:     [n_meas, E] effective fluence per energy bin.
    mus:    [n_mats, E] basis mass-attenuation curves [cm^2/g].
    Returns a: [P, n_mats] basis-material area densities [g/cm^2].
    """
    counts = np.asarray(counts, np.float64)
    i0 = np.asarray(i0, np.float64)
    mus = np.asarray(mus, np.float64)
    n_meas, P = counts.shape
    n_mats = mus.shape[0]
    assert n_mats == 2, "closed-form solve is 2-material"

    a = np.full((P, n_mats), eps_init)
    for _ in range(n_iters):
        L = a @ mus  # [P, E]
        atten = np.exp(np.clip(-L, -700.0, 20.0))
        nu = atten @ i0.T  # [P, n_meas]
        # d nu_m / d a_i = -sum_E i0_m mus_i atten
        grad = -np.einsum("pe,me,ie->pmi", atten, i0, mus)
        hess = np.einsum("pe,me,ie,je->pmij", atten, i0, mus, mus)
        r = counts.T / nu - 1.0  # [P, m]
        yv2 = counts.T / nu**2
        dF = -np.einsum("pm,pmi->pi", r, grad)
        if method == "newton":
            H = -(np.einsum("pm,pmij->pij", r, hess)
                  - np.einsum("pm,pmi,pmj->pij", yv2, grad, grad))
        else:  # Gauss-Newton / Fisher scoring (PSD)
            H = np.einsum("pm,pmi,pmj->pij", yv2, grad, grad)
        det = H[:, 0, 0] * H[:, 1, 1] - H[:, 0, 1] * H[:, 1, 0]
        det = np.where(np.abs(det) < 1e-300, 1e-300, det)
        dx0 = (H[:, 1, 1] * dF[:, 0] - H[:, 0, 1] * dF[:, 1]) / det
        dx1 = (H[:, 0, 0] * dF[:, 1] - H[:, 1, 0] * dF[:, 0]) / det
        step = np.stack([dx0, dx1], -1)
        norm = np.linalg.norm(step, axis=-1, keepdims=True)
        step = step * np.minimum(1.0, step_max / np.maximum(norm, 1e-30))
        a = np.clip(a - step, a_bounds[0], a_bounds[1])
    return a
