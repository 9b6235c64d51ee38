"""Device-mesh construction for the 2-axis parallel layout.

The reference is strictly single-process, single-GPU (SURVEY §2.9:
``Device.cuda = "cuda:0"`` policy, no torch.distributed anywhere). Multi-chip
scaling is therefore a *new* capability of this framework, designed per the
mesh/collective recipe: pick a mesh, annotate shardings, let XLA insert the
collectives over ICI.

Two mesh axes map the workload's natural parallelism:

* ``batch`` — data parallel over contracts: each shard samples and simulates
  its own contract slice; gradients are ``pmean``-reduced (one collective per
  step).
* ``paths`` — Monte-Carlo parallel *within* a contract: each shard simulates
  a slice of the MC batch rows (exact bits, via ``row_offset`` keying) and
  per-contract spectra are ``psum``-reduced.

Both collectives ride ICI; nothing crosses DCN inside a step. Multi-slice /
multi-host scaling lives in ``parallel/distributed.py``: the global
(slice, batch, paths) mesh composes the slice axis into ``batch_axis`` so
this module's sharded segment runs unchanged across a pod.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
from jax.sharding import Mesh

from spectralmc_tpu.core.errors.trainer import InvalidTrainingConfig, TrainerError
from spectralmc_tpu.core.result import Failure, Result, Success

BATCH_AXIS = "batch"
PATHS_AXIS = "paths"


def _axis_size(mesh: Mesh, axis: "str | tuple[str, ...]") -> int:
    if isinstance(axis, tuple):
        size = 1
        for name in axis:
            size *= mesh.shape[name]
        return size
    return mesh.shape[axis]


@dataclass(frozen=True)
class MeshSpec:
    """A mesh plus the names of its contract-DP and MC-paths axes.

    Axis names may be tuples — JAX collectives and ``axis_index`` compose
    over composed axes, which is how the multi-slice global mesh reuses the
    single-slice trainer: ``batch_axis=("slice", "batch")``
    (parallel/distributed.py:build_global_mesh_spec).
    """

    mesh: Mesh
    batch_axis: "str | tuple[str, ...]" = BATCH_AXIS
    paths_axis: "str | tuple[str, ...]" = PATHS_AXIS

    @property
    def batch_size_divisor(self) -> int:
        return _axis_size(self.mesh, self.batch_axis)

    @property
    def paths_divisor(self) -> int:
        return _axis_size(self.mesh, self.paths_axis)


def build_mesh_spec(
    *,
    batch_shards: int,
    paths_shards: int,
    devices: list[jax.Device] | None = None,
) -> Result[MeshSpec, TrainerError]:
    """Build the 2-axis training mesh over ``batch_shards * paths_shards`` devices."""
    devs = devices if devices is not None else jax.devices()
    need = batch_shards * paths_shards
    if batch_shards <= 0 or paths_shards <= 0:
        return Failure(
            InvalidTrainingConfig(
                field="mesh", value=(batch_shards, paths_shards), reason="shards must be > 0"
            )
        )
    if need > len(devs):
        return Failure(
            InvalidTrainingConfig(
                field="mesh",
                value=need,
                reason=f"needs {need} devices, have {len(devs)}",
            )
        )
    grid = np.array(devs[:need]).reshape(batch_shards, paths_shards)
    return Success(MeshSpec(mesh=Mesh(grid, axis_names=(BATCH_AXIS, PATHS_AXIS))))
