"""Deterministic runtime configuration as data.

Parity: ``/root/reference/src/spectralmc/runtime/torch_runtime.py:23-99`` —
the reference probes CUDA/cuDNN readiness into a frozen ``TorchRuntime`` ADT,
applies deterministic flags exactly once (CUBLAS workspace, deterministic
algorithms, TF32 off), and caches the configured module handle.

TPU translation (SURVEY §2.9 N8): XLA on TPU is deterministic by default for
a fixed program/topology, so "apply" pins the *numerics-affecting* knobs
instead of kernel-selection flags: matmul precision default (no implicit
bf16), float dtype promotion discipline (x64 state recorded, not silently
flipped), and records the backend fingerprint for checkpoints.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import contextlib
from typing import Iterator

import jax

_LOCK = threading.Lock()
_APPLIED: "JaxRuntime | None" = None


@dataclass(frozen=True, slots=True)
class JaxRuntime:
    """Probe result + the config that will be applied (pure data)."""

    backend: str
    device_kind: str
    device_count: int
    x64_enabled: bool
    matmul_precision: str = "highest"


def decide_jax_runtime(*, matmul_precision: str = "highest") -> JaxRuntime:
    """Probe the backend; no side effects."""
    devices = jax.devices()
    return JaxRuntime(
        backend=devices[0].platform,
        device_kind=getattr(devices[0], "device_kind", "unknown"),
        device_count=len(devices),
        x64_enabled=bool(jax.config.jax_enable_x64),
        matmul_precision=matmul_precision,
    )


def apply_jax_runtime(runtime: JaxRuntime) -> JaxRuntime:
    """Apply numerics policy exactly once (idempotent, thread-guarded).

    ``highest`` matmul precision disables implicit bf16 MXU passes for f32
    inputs — the TPU analogue of the reference turning TF32 off
    (torch_runtime.py:72-77). Library code still opts into bf16 explicitly
    where it wants it.
    """
    global _APPLIED
    with _LOCK:
        if _APPLIED is not None:
            return _APPLIED
        jax.config.update("jax_default_matmul_precision", runtime.matmul_precision)
        _APPLIED = runtime
        return runtime


def get_jax_handle() -> JaxRuntime:
    """Probe + apply + return the cached runtime (parity: get_torch_handle)."""
    with _LOCK:
        cached = _APPLIED
    if cached is not None:
        return cached
    return apply_jax_runtime(decide_jax_runtime())


def enable_compilation_cache(
    cache_dir: str, *, min_compile_time_secs: float = 1.0
) -> None:
    """Turn on the persistent XLA compilation cache.

    The fused train step's first-process compile is minutes-scale on a
    tunneled TPU; with the cache, later processes deserialize the executable
    in seconds. Safe to call more than once; the last dir wins. Production
    entry points (bench.py, examples) call this — the library never does
    implicitly, because the cache dir is an environment decision.
    """
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)


@contextlib.contextmanager
def device_scope(device: jax.Device) -> Iterator[None]:
    """Scoped default device (reference ``default_device`` context manager,
    models/torch.py:181-212). The reference needs a main-thread assertion
    because torch's default-device is process-global mutable state; jax's
    ``default_device`` is already thread-local, so the guard dissolves."""
    with jax.default_device(device):
        yield


@contextlib.contextmanager
def matmul_precision_scope(precision: str) -> Iterator[None]:
    """Scoped MXU matmul precision ("default" | "high" | "highest") —
    the dtype-policy counterpart of the reference's ``default_dtype``."""
    with jax.default_matmul_precision(precision):
        yield
