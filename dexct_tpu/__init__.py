"""dexct_tpu: a TPU-native dual-energy CT simulation framework.

Ground-up JAX/XLA rebuild of the capabilities of gjadick/dex-ct-sim
(reference at /root/reference; structural map in SURVEY.md): Siddon forward
projection, fan-beam filtered back-projection, Gauss-Newton basis material
decomposition, the physics substrate (attenuation/spectra/detectors), the
run-config driver and output contract, and quantitative analysis — designed
for single-jit execution on TPU with shard_map scale-out.

Layer map (mirrors SURVEY.md §1):
    physics/   L0: attenuation tables, spectra, detectors, materials
    system/    L1: scanner geometry, voxel phantoms, run config
    ops/       L2: siddon, spectral forward, FBP, GN decomposition, BHC
    pipeline/  L3: reference-compatible API + driver + output contract
    analysis/  L4: VMI, ROI metrics, registration
    parallel/  multi-chip sharding (mesh + shard_map)
"""

__version__ = "0.1.0"

from . import analysis, ops, parallel, physics, pipeline, system, utils
from .pipeline import (
    get_basismat_sinos,
    get_recon,
    get_sino,
    simulate_dect,
)
from .physics import mixatten
from .system import (
    ConeBeamGeometry,
    FanBeamGeometry,
    HelicalConeBeamGeometry,
    VoxelPhantom,
    read_parameter_file,
    water_cylinder_phantom,
)
from .physics.spectrum import xRaySpectrum

__all__ = [
    "physics",
    "system",
    "ops",
    "pipeline",
    "analysis",
    "parallel",
    "utils",
    "get_sino",
    "get_recon",
    "get_basismat_sinos",
    "simulate_dect",
    "mixatten",
    "xRaySpectrum",
    "FanBeamGeometry",
    "ConeBeamGeometry",
    "HelicalConeBeamGeometry",
    "VoxelPhantom",
    "read_parameter_file",
    "water_cylinder_phantom",
]
