"""Runtime & device facade (parity: reference L1, SURVEY §2.2)."""

from spectralmc_tpu.runtime.jax_runtime import (
    JaxRuntime,
    apply_jax_runtime,
    decide_jax_runtime,
    get_jax_handle,
)
from spectralmc_tpu.runtime.transfer import (
    DeviceTree,
    DirectTransfer,
    HostPlacement,
    DevicePlacement,
    RejectTransfer,
    StayOnPlacement,
    get_tree_placement,
    move_tensor_tree,
    plan_tensor_transfer,
)

__all__ = [
    "DevicePlacement",
    "DeviceTree",
    "DirectTransfer",
    "HostPlacement",
    "JaxRuntime",
    "RejectTransfer",
    "StayOnPlacement",
    "apply_jax_runtime",
    "decide_jax_runtime",
    "get_jax_handle",
    "get_tree_placement",
    "move_tensor_tree",
    "plan_tensor_transfer",
]
