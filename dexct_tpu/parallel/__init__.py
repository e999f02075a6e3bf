"""Multi-chip parallel execution: meshes + shard_map pipelines."""

from .iterative import (sharded_cg_recon, sharded_cone_pwls_recon,
                        sharded_onestep_recon, sharded_pwls_recon)
from .katsevich import sharded_katsevich_reconstruct
from .mesh import make_mesh, view_mesh
from .sharded import shard_arrays, sharded_dect_step

__all__ = ["make_mesh", "view_mesh", "sharded_dect_step", "shard_arrays",
           "sharded_pwls_recon", "sharded_cg_recon",
           "sharded_cone_pwls_recon", "sharded_onestep_recon",
           "sharded_katsevich_reconstruct"]
