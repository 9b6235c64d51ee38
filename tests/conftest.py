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

import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Per-test wall-clock ceiling (parity: reference conftest.py:101-117 uses a
# SIGALRM 60 s default). CPU-backend first compiles are slower than the
# reference's warm GPU, so the default here is 120 s; override per test with
# ``@pytest.mark.timeout_s(N)``.
DEFAULT_TIMEOUT_S = 120


def pytest_configure(config: pytest.Config) -> None:
    config.addinivalue_line(
        "markers", "timeout_s(seconds): per-test wall-clock limit (SIGALRM) override"
    )


def pytest_sessionstart(session: pytest.Session) -> None:
    """Env preflight: the virtual 8-device CPU mesh must actually exist."""
    devices = jax.devices()
    if devices[0].platform != "cpu":
        raise RuntimeError(
            f"test suite must run on the CPU backend, got {devices[0].platform!r} "
            "(the TPU plugin overrode jax_platforms?)"
        )
    if len(devices) < 8:
        raise RuntimeError(
            f"expected >= 8 virtual CPU devices, got {len(devices)} — "
            "xla_force_host_platform_device_count was not applied before jax init"
        )
    if not jax.config.jax_enable_x64:
        raise RuntimeError("x64 must be enabled for the float64 determinism gates")


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item: pytest.Item):
    marker = item.get_closest_marker("timeout_s")
    seconds = int(marker.args[0]) if marker else DEFAULT_TIMEOUT_S

    def _on_alarm(signum: int, frame: object) -> None:
        raise TimeoutError(f"test exceeded {seconds}s wall-clock limit (SIGALRM)")

    previous = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)


@pytest.fixture(autouse=True)
def seed_prngs() -> None:
    """Deterministic host PRNG per test (parity: reference conftest seeds 42)."""
    np.random.seed(42)


@pytest.fixture
def eight_device_mesh():
    import jax.sharding as shd

    devices = np.array(jax.devices()[:8]).reshape(8)
    return shd.Mesh(devices, axis_names=("paths",))
