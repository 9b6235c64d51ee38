"""Test harness for spectralmc_tpu.

Policy differences from the reference's GPU-mandatory conftest
(``/root/reference/tests/conftest.py``): tests target the **CPU backend with
8 virtual devices** so the full multi-chip sharding surface is exercised
hermetically; the real-TPU path is exercised by ``bench.py``. x64 is enabled
so float64 determinism gates can run (dtype-explicit library code keeps
float32 paths float32).
"""

from __future__ import annotations

import os

# Must happen before jax initializes a backend. Force CPU even when the
# environment pins JAX_PLATFORMS to a TPU platform — the unit suite is
# hermetic; real-TPU execution is bench.py's job. The TPU plugin in this image
# overrides the JAX_PLATFORMS env var, so the config update below is the
# authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def seed_prngs() -> None:
    """Deterministic host PRNG per test (parity: reference conftest seeds 42)."""
    np.random.seed(42)


@pytest.fixture
def eight_device_mesh():
    import jax.sharding as shd

    devices = np.array(jax.devices()[:8]).reshape(8)
    return shd.Mesh(devices, axis_names=("paths",))
