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

__all__ = [
    "read_parameter_file",
    "xRaySpectrum",
    "FanBeamGeometry",
    "ScannerGeometry",
    "VoxelPhantom",
    "get_sino",
    "get_recon",
    "get_basismat_sinos",
    "load_spectrum",
    "mixatten",
    "mat1",
    "matcomp1",
    "density1",
    "mat2",
    "matcomp2",
    "density2",
]
