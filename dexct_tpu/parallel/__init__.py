"""Multi-chip parallel execution: meshes + shard_map pipelines."""

from .mesh import make_mesh, view_mesh
from .sharded import shard_arrays, sharded_dect_step

__all__ = ["make_mesh", "view_mesh", "sharded_dect_step", "shard_arrays"]
