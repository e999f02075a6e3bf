"""System models namespace (alias).

In this framework the "models" are the physical system models — scanner
geometries, voxel phantoms, x-ray spectra, detector responses, and
materials — which live in :mod:`dexct_tpu.system` and
:mod:`dexct_tpu.physics`.  This package re-exports them under the
conventional ``models`` name.
"""

from ..physics.detector import DetectorResponse
from ..physics.materials import BUILTIN_MATERIALS, Material, MaterialTable
from ..physics.spectrum import Spectrum, kramers_spectrum, linac_spectrum, xRaySpectrum
from ..system.geometry import FanBeamGeometry, GEOMETRY_REGISTRY, ParallelBeamGeometry, ScannerGeometry
from ..system.phantom import (
    VoxelPhantom,
    contrast_rods_phantom,
    pelvis_phantom,
    water_cylinder_phantom,
)

__all__ = [
    "ScannerGeometry",
    "FanBeamGeometry",
    "ParallelBeamGeometry",
    "GEOMETRY_REGISTRY",
    "VoxelPhantom",
    "water_cylinder_phantom",
    "contrast_rods_phantom",
    "pelvis_phantom",
    "Spectrum",
    "xRaySpectrum",
    "kramers_spectrum",
    "linac_spectrum",
    "DetectorResponse",
    "Material",
    "MaterialTable",
    "BUILTIN_MATERIALS",
]
