"""Training data for learned denoising, from this framework's own simulator.

The data engine behind `learn/cnn.DnCNN`: random procedural anatomy
phantoms are scanned with the standard polyenergetic pipeline
(`pipeline.api.get_sino` / `get_recon`) at a reference dose and at a
reduced dose, giving physically correct paired FBP images — the exact
workflow clinical vendors run on phantom/cadaver libraries, except the
"scanner" is the simulator so the noiseless oracle is also available.

Targets (``target=`` of :func:`make_training_set`):

* ``"clean"``     — the noiseless reconstruction (supervised oracle; only
  a simulator can provide this).
* ``"highdose"``  — a reference-dose NOISY reconstruction (what a real
  paired-scan protocol provides; the target noise floor is inherited).
* ``"n2n"``       — a second independent LOW-dose realization
  (Noise2Noise, Lehtinen et al. 2018: with an L2 loss, training against
  an independent equally-noisy target has the same minimizer as training
  against the mean, because the target noise is zero-mean and
  independent of the input — so no clean data is needed at all).
  Pinned by test: the n2n-trained model denoises held-out images almost
  as well as the clean-supervised one.

Per phantom the material-path sinogram is traced ONCE and reused for
every dose/realization (the sim cost is dominated by tracing, not
sampling), mirroring the DE driver's paths reuse (pipeline/api.py).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.siddon import material_path_sinogram
from ..physics.materials import (ADIPOSE, AIR, BONE, MUSCLE, TISSUE, WATER,
                                 MaterialTable)
from ..physics.spectrum import kramers_spectrum
from ..pipeline.api import get_recon, get_sino
from ..system.geometry import FanBeamGeometry
from ..system.phantom import VoxelPhantom, _ellipse_mask

__all__ = ["random_anatomy_phantom", "make_training_set",
           "extract_patches"]

# label order is fixed so every random phantom shares one material table
_MATERIALS = MaterialTable([AIR, WATER, TISSUE, BONE, ADIPOSE, MUSCLE])
_INSERT_LABELS = (3, 4, 5, 1)  # bone, adipose, muscle, water(cyst)


def random_anatomy_phantom(seed, N=64, dx=0.2, name=None):
    """A randomized soft-tissue body with bone/adipose/muscle/fluid
    inserts — the procedural anatomy family the denoiser trains on.

    Randomized: body ellipse axes/rotation, insert count (2-6), insert
    materials, positions (inside the body), sizes and orientations.
    Deterministic in ``seed``.
    """
    rng = np.random.default_rng(seed)
    half = 0.5 * N * dx
    body_rx = rng.uniform(0.60, 0.88) * half
    body_ry = rng.uniform(0.55, 0.85) * half
    body_ang = rng.uniform(0.0, np.pi)
    labels = np.where(
        _ellipse_mask(N, dx, 0.0, 0.0, body_rx, body_ry, body_ang), 2, 0
    ).astype(np.uint8)
    for _ in range(int(rng.integers(2, 7))):
        lab = int(rng.choice(_INSERT_LABELS))
        # center inside the (rotated) body ellipse
        r = np.sqrt(rng.uniform(0.0, 0.55))
        th = rng.uniform(0.0, 2 * np.pi)
        c, s = np.cos(body_ang), np.sin(body_ang)
        ex, ey = r * np.cos(th) * body_rx, r * np.sin(th) * body_ry
        cx, cy = c * ex - s * ey, s * ex + c * ey
        rx = rng.uniform(0.05, 0.30) * min(body_rx, body_ry)
        ry = rng.uniform(0.05, 0.30) * min(body_rx, body_ry)
        mask = _ellipse_mask(N, dx, cx, cy, rx, ry, rng.uniform(0, np.pi))
        labels[mask & (labels > 0)] = lab
    return VoxelPhantom(name or f"randanat_{seed}", labels, _MATERIALS,
                        dx, dx, dx)


def make_training_set(seed, n_phantoms=8, N=64, dx=0.2, n_views=96,
                      n_channels=64, dose_hi=5e-8, f_lo=0.1,
                      target="clean", kvp=120.0, N_matrix=None,
                      ramp=0.9):
    """Simulate ``n_phantoms`` paired scans; returns HU image arrays.

    Returns dict with ``x`` (low-dose noisy recons, [S, N, N] HU),
    ``y`` (training target per ``target=``), ``clean`` (noiseless oracle,
    for evaluation regardless of target), and the scan ``meta``.

    ``dose_hi`` is the reference per-scan dose (same units as the rest of
    the package: the spectrum is rescaled by ``A_iso * dose / N_proj``);
    the low-dose input is scanned at ``f_lo * dose_hi``.  The default is
    calibrated so the DEFAULT toy geometry sits in the clinically
    interesting regime: ~8 HU rms noise at reference dose and ~26 HU at
    the 10x-reduced input dose (measured on this module's phantoms) —
    deep enough for a denoiser to matter, shallow enough that FBP is
    still the right baseline.
    """
    if target not in ("clean", "highdose", "n2n"):
        raise ValueError(f"unknown target {target!r}")
    N_matrix = int(N_matrix or N)
    fov = N * dx * 0.78  # body-hugging FOV, insert detail fills pixels
    ct = FanBeamGeometry(N_channels=int(n_channels), N_proj=int(n_views),
                         gamma_fan=0.5, SID=max(40.0, 1.6 * N * dx),
                         SDD=max(70.0, 2.8 * N * dx), eid=True)

    def _spec(dose):
        s = kramers_spectrum(float(kvp))
        s.rescale_counts(ct.A_iso * float(dose) / ct.N_proj)
        return s

    spec_hi, spec_lo = _spec(dose_hi), _spec(dose_hi * f_lo)
    key = jax.random.PRNGKey(int(seed))
    xs, ys, cleans = [], [], []
    for i in range(int(n_phantoms)):
        ph = random_anatomy_phantom(seed * 1000 + i, N=N, dx=dx)
        paths = material_path_sinogram(ph, ct)
        key, k1, k2 = jax.random.split(key, 3)
        _, slog_lo = get_sino(ct, ph, spec_lo, noise="poisson", key=k1,
                              paths=paths)
        x = get_recon(slog_lo, ct, spec_lo, N_matrix, fov, ramp)[1]
        _, slog_cl = get_sino(ct, ph, spec_lo, paths=paths)
        clean = get_recon(slog_cl, ct, spec_lo, N_matrix, fov, ramp)[1]
        if target == "clean":
            y = clean
        elif target == "highdose":
            _, slog_hi = get_sino(ct, ph, spec_hi, noise="poisson",
                                  key=k2, paths=paths)
            y = get_recon(slog_hi, ct, spec_hi, N_matrix, fov, ramp)[1]
        else:  # n2n: second independent low-dose realization
            _, slog_2 = get_sino(ct, ph, spec_lo, noise="poisson",
                                 key=k2, paths=paths)
            y = get_recon(slog_2, ct, spec_lo, N_matrix, fov, ramp)[1]
        xs.append(np.asarray(x)), ys.append(np.asarray(y))
        cleans.append(np.asarray(clean))
    meta = dict(ct=ct, fov=fov, dose_hi=dose_hi, f_lo=f_lo, kvp=kvp,
                target=target)
    return dict(x=np.stack(xs), y=np.stack(ys), clean=np.stack(cleans),
                meta=meta)


def extract_patches(seed, x, y, patch=32, n_per_image=32, augment=True):
    """Random aligned patch pairs from image stacks [S, H, W] -> two
    [P, patch, patch] arrays.  ``augment`` applies the 8 dihedral
    flips/rotations (FBP noise is locally near-isotropic, so the group
    orbit is free training data)."""
    rng = np.random.default_rng(seed)
    S, H, W = x.shape
    xs, ys = [], []
    for s in range(S):
        for _ in range(int(n_per_image)):
            iy = rng.integers(0, H - patch + 1)
            ix = rng.integers(0, W - patch + 1)
            px = x[s, iy:iy + patch, ix:ix + patch]
            py = y[s, iy:iy + patch, ix:ix + patch]
            if augment:
                k = int(rng.integers(0, 8))
                px, py = np.rot90(px, k % 4), np.rot90(py, k % 4)
                if k >= 4:
                    px, py = px[::-1], py[::-1]
            xs.append(px), ys.append(py)
    return (np.stack(xs).astype(np.float32),
            np.stack(ys).astype(np.float32))
