"""Multi-chip parallelism: device meshes + the sharded fused train step."""

from spectralmc_tpu.parallel.mesh import MeshSpec, build_mesh_spec
from spectralmc_tpu.parallel.trainer import make_sharded_batch, make_sharded_segment

__all__ = ["MeshSpec", "build_mesh_spec", "make_sharded_batch", "make_sharded_segment"]
