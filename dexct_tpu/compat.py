"""Drop-in compatibility surface for gjadick/dex-ct-sim users.

The reference pipeline imports symbols from ``xtomosim.system``,
``xtomosim.forward_project``, ``xtomosim.back_project``, ``xcompy`` and
``matdecomp`` (/root/reference/main.py:19-22, plots.py:16-18).  This module
re-exports this framework's equivalents under those names, so porting a
reference script is an import swap:

    from dexct_tpu.compat import (
        read_parameter_file, xRaySpectrum, FanBeamGeometry, VoxelPhantom,
        get_sino, get_recon, get_basismat_sinos, mixatten,
        mat1, mat2, matcomp1, matcomp2, density1, density2,
    )

Return values are NumPy-convertible device arrays; shapes, units, and file
formats match the reference contract (SURVEY.md §2.3, §2.6).
"""

from __future__ import annotations

from .physics.materials import BONE, TISSUE
from .physics.spectrum import xRaySpectrum
from .physics.xcom import mixatten
from .pipeline.api import get_basismat_sinos, get_recon, get_sino, load_spectrum
from .system.config import read_parameter_file
from .system.geometry import FanBeamGeometry, ScannerGeometry
from .system.phantom import VoxelPhantom

# hardcoded basis materials of the reference (matdecomp.py:12-17)
mat1 = TISSUE.name
matcomp1 = TISSUE.matcomp
density1 = TISSUE.density
mat2 = BONE.name
matcomp2 = BONE.matcomp
density2 = BONE.density


def do_matdecomp_gn(ct, sino1, sino2, spec1, spec2, n_iters):
    """Reference-shaped solver entry (matdecomp.py:130-164).

    Returns Sino_aa [N_proj, N_channels, 2] density line integrals
    [g/cm^2] — the reference's pre-mask array layout (matdecomp.py:42).
    Pre-mask means air rays are included: on those near-zero-signal rays
    the tissue/bone basis is ill-conditioned and per-ray values are
    noise-dominated (float32 solutions can differ from the float64
    oracle along the degenerate direction).  `get_basismat_sinos`
    applies the air mask and matches this output bitwise elsewhere.
    """
    import jax.numpy as jnp
    import numpy as np

    from .ops.matdecomp import gauss_newton_solve, prepare_decomposition

    _, i0, mus = prepare_decomposition(ct, spec1, spec2)
    s1 = jnp.asarray(sino1, jnp.float32)
    s2 = jnp.asarray(sino2, jnp.float32)
    a = gauss_newton_solve(
        jnp.stack([s1.reshape(-1), s2.reshape(-1)]),
        jnp.asarray(i0, jnp.float32), jnp.asarray(mus, jnp.float32),
        n_iters=n_iters,
    )
    return np.asarray(a).reshape(s1.shape + (2,))


def optimize_sino_cpu(Sino_gg, ee, i0, mus, n_iters, verbose=False):
    """Reference-shaped float64 CPU solver (matdecomp.py:87-127 surface).

    Sino_gg: [n_meas, nViews, nBins] counts; returns [nViews, nBins,
    nMats].  Backed by the vectorized float64 oracle (the reference's
    per-view Python loop is the behavior being replaced).
    """
    import numpy as np

    from .utils.testing import gauss_newton_decompose_numpy

    g = np.asarray(Sino_gg, np.float64)
    m, v, c = g.shape
    i0 = np.asarray(i0, np.float64)
    if i0.ndim == 3:  # reference channel-tiled layout [nMeas, nBins, nE]
        i0 = i0[:, 0, :]
    a = gauss_newton_decompose_numpy(g.reshape(m, -1), i0,
                                     np.asarray(mus), n_iters)
    return a.reshape(v, c, -1)

__all__ = [
    "read_parameter_file",
    "xRaySpectrum",
    "FanBeamGeometry",
    "ScannerGeometry",
    "VoxelPhantom",
    "get_sino",
    "get_recon",
    "get_basismat_sinos",
    "do_matdecomp_gn",
    "optimize_sino_cpu",
    "load_spectrum",
    "mixatten",
    "mat1",
    "matcomp1",
    "density1",
    "mat2",
    "matcomp2",
    "density2",
]
