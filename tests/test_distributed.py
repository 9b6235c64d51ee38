"""Multi-host / multi-slice scaling tests.

The reference has no distributed story (SURVEY §2.9: single-process,
single-GPU by policy); pod-scale DP is this framework's own target (BASELINE
config 5). Hermetic validation on CPU:

* single-process: the global (slice, batch, paths) mesh — slice composed
  into the contract-DP axis — produces EXACTLY the results of the flat
  2-axis mesh with the same device order (same shards, same collective
  groups, bit-identical).
* multi-process: real ``jax.distributed`` over localhost (Gloo), 2 processes
  x 4 virtual CPU devices each, training over the global 8-device mesh with
  process-0-gated blockchain commits.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.core.result import Failure
from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
from spectralmc_tpu.parallel.distributed import (
    DistributedRuntime,
    build_global_mesh_spec,
    coordinator_only,
    current_runtime,
    is_coordinator,
)
from spectralmc_tpu.parallel.mesh import build_mesh_spec
from spectralmc_tpu.training.trainer import (
    GbmCVNNPricer,
    GbmCVNNPricerConfig,
    build_training_config,
)
from tests.helpers import expect_failure, expect_success
from tests.helpers.factories import CONTRACT_BOUNDS, make_simulation_params


def _pricer_config() -> GbmCVNNPricerConfig:
    sim = make_simulation_params(timesteps=2, network_size=16, batches_per_mc_run=4)
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)],
            seed=3,
            precision=Precision.float32,
        )
    )
    return GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)


def test_global_mesh_spec_shape_and_divisors() -> None:
    spec = expect_success(
        build_global_mesh_spec(num_slices=2, batch_shards_per_slice=2, paths_shards=2)
    )
    assert spec.mesh.axis_names == ("slice", "batch", "paths")
    assert spec.batch_axis == ("slice", "batch")
    assert spec.batch_size_divisor == 4
    assert spec.paths_divisor == 2


def test_global_mesh_spec_validation() -> None:
    err = expect_failure(
        build_global_mesh_spec(num_slices=4, batch_shards_per_slice=4, paths_shards=4)
    )
    assert "devices" in err.reason
    err = expect_failure(
        build_global_mesh_spec(num_slices=0, batch_shards_per_slice=1, paths_shards=1)
    )
    assert "> 0" in err.reason


def test_sliced_global_mesh_matches_flat_mesh_bit_exact() -> None:
    """(slice=2, batch=2, paths=2) with batch DP over ("slice","batch") runs
    the same per-device program with the same device order as the flat
    (batch=4, paths=2) mesh -> identical bits."""
    devices = jax.devices()[:8]
    flat = expect_success(
        build_mesh_spec(batch_shards=4, paths_shards=2, devices=list(devices))
    )
    sliced = expect_success(
        build_global_mesh_spec(
            num_slices=2, batch_shards_per_slice=2, paths_shards=2, devices=list(devices)
        )
    )
    tc = expect_success(
        build_training_config(num_batches=3, batch_size=4, learning_rate=2e-3)
    )
    a = expect_success(GbmCVNNPricer.create(_pricer_config(), mesh_spec=flat))
    b = expect_success(GbmCVNNPricer.create(_pricer_config(), mesh_spec=sliced))
    ra = expect_success(a.train(tc))
    rb = expect_success(b.train(tc))
    np.testing.assert_array_equal(ra.losses, rb.losses)
    sa, sb = a.snapshot(), b.snapshot()
    for key in sa.model_state:
        np.testing.assert_array_equal(sa.model_state[key], sb.model_state[key])


def test_coordinator_gating(monkeypatch: pytest.MonkeyPatch) -> None:
    # single process IS the coordinator
    assert is_coordinator()
    calls: list[str] = []
    gated = coordinator_only(calls.append, name="commit")
    gated("committed")
    assert calls == ["committed"]
    assert "commit" in gated.__name__

    # the gate is evaluated at CALL time: the SAME wrapper flips to no-op
    # when the process stops being the coordinator (and back)
    import spectralmc_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist.jax, "process_index", lambda: 3)
    assert not is_coordinator()
    assert gated("dropped") is None
    assert calls == ["committed"]
    monkeypatch.undo()
    gated("committed again")
    assert calls == ["committed", "committed again"]


def test_initialize_query_does_not_latch(monkeypatch: pytest.MonkeyPatch) -> None:
    """A no-arg call is a pure query: it must NOT latch _initialized, so a
    later explicit call still reaches jax.distributed.initialize."""
    import spectralmc_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "_initialized", False)
    rt = expect_success(dist.initialize_distributed())
    assert rt.process_count == 1
    assert dist._initialized is False  # not latched by the query

    attempted: list[dict] = []

    def fake_init(**kwargs):
        attempted.append(kwargs)
        raise RuntimeError("coordinator unreachable (expected in this test)")

    monkeypatch.setattr(dist.jax.distributed, "initialize", fake_init)
    res = dist.initialize_distributed(
        coordinator_address="localhost:1", num_processes=2, process_id=0
    )
    assert isinstance(res, Failure)
    assert attempted, "explicit call after a query must attempt initialize"
    assert dist._initialized is False  # failure must not latch either


def test_current_runtime_single_process() -> None:
    rt = current_runtime()
    assert isinstance(rt, DistributedRuntime)
    assert rt.process_count == 1 and rt.is_coordinator
    assert rt.global_device_count >= 8


_WORKER = textwrap.dedent(
    """
    import json, os, sys
    proc, nprocs, port, store_root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    plan_kind = sys.argv[5] if len(sys.argv) > 5 else "final"
    bspp = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    paths_shards = int(sys.argv[7]) if len(sys.argv) > 7 else 2
    num_batches = int(sys.argv[8]) if len(sys.argv) > 8 else 3
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from spectralmc_tpu.parallel.distributed import (
        build_global_mesh_spec, coordinator_only, initialize_distributed,
    )
    rt = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=proc
    ).expect("distributed init")
    assert rt.process_count == nprocs and rt.global_device_count == 4 * nprocs

    from spectralmc_tpu.core.precision import Precision
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.ops.gbm import build_simulation_params
    from spectralmc_tpu.ops.sobol import BoundSpec
    from spectralmc_tpu.storage.checkpoint import make_commit_fn
    from spectralmc_tpu.storage.object_store import FileSystemObjectStore
    from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
    from spectralmc_tpu.training.trainer import (
        FinalAndIntervalCommit, FinalCommit, GbmCVNNPricer, GbmCVNNPricerConfig,
        build_training_config,
    )

    # same domain as tests.helpers.factories.CONTRACT_BOUNDS (spelled out:
    # the worker runs without the tests package on sys.path)
    bounds = {
        "spot": BoundSpec(lower=50.0, upper=150.0),
        "strike": BoundSpec(lower=50.0, upper=150.0),
        "maturity": BoundSpec(lower=0.2, upper=2.0),
        "rate": BoundSpec(lower=0.0, upper=0.10),
        "div_yield": BoundSpec(lower=0.0, upper=0.05),
        "vol": BoundSpec(lower=0.10, upper=0.50),
    }
    sim = build_simulation_params(
        timesteps=2, network_size=16, batches_per_mc_run=4, mc_seed=7,
        precision=Precision.float32,
    ).expect("sim")
    cvnn = build_cvnn_config(
        layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=3,
        precision=Precision.float32,
    ).expect("cvnn")
    config = GbmCVNNPricerConfig(sim=sim, bounds=bounds, cvnn=cvnn)

    spec = build_global_mesh_spec(
        num_slices=nprocs, batch_shards_per_slice=bspp, paths_shards=paths_shards
    ).expect("mesh")
    pricer = GbmCVNNPricer.create(config, mesh_spec=spec).expect("pricer")

    store = AsyncBlockchainModelStore(FileSystemObjectStore(store_root, "models"))
    commit_fn = coordinator_only(make_commit_fn(store), name="commit")
    plan = FinalCommit() if plan_kind == "final" else FinalAndIntervalCommit(interval=2)
    tc = build_training_config(
        num_batches=num_batches, batch_size=4, learning_rate=2e-3
    ).expect("tc")
    result = pricer.train(tc, commit_plan=plan, commit_fn=commit_fn).expect("train")
    if proc == 0:
        print("LOSSES=" + json.dumps([float(x) for x in result.losses]), flush=True)
    print(f"WORKER{proc}_DONE", flush=True)
    """
)


@pytest.mark.timeout_s(300)
def test_multiprocess_training_with_gated_commits(tmp_path) -> None:
    """Real jax.distributed over localhost: 2 processes train in SPMD over
    the global (slice=2, batch=2, paths=2) mesh; losses match the
    single-process run on the same topology and only process 0 commits."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    store_root = tmp_path / "store"
    env = {
        **os.environ,
        "PYTHONPATH": os.getcwd() + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(store_root)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i}_DONE" in out

    loss_line = next(
        line for line in outputs[0].splitlines() if line.startswith("LOSSES=")
    )
    dist_losses = np.array(json.loads(loss_line[len("LOSSES="):]))

    # single-process ground truth on the identical global topology
    spec = expect_success(
        build_global_mesh_spec(
            num_slices=2, batch_shards_per_slice=2, paths_shards=2,
            devices=list(jax.devices()[:8]),
        )
    )
    pricer = expect_success(GbmCVNNPricer.create(_pricer_config(), mesh_spec=spec))
    tc = expect_success(
        build_training_config(num_batches=3, batch_size=4, learning_rate=2e-3)
    )
    ref = expect_success(pricer.train(tc))
    np.testing.assert_allclose(dist_losses, ref.losses, rtol=1e-6)

    # exactly ONE commit happened (process-0 gating): genesis head v0000000001
    import asyncio

    from spectralmc_tpu.storage.object_store import FileSystemObjectStore
    from spectralmc_tpu.storage.store import AsyncBlockchainModelStore

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(store_root), "models"))
    head = expect_success(asyncio.run(store.get_head()))
    assert head is not None and head.counter == 0  # the genesis commit
    versions = expect_success(asyncio.run(store.list_versions()))
    assert len(versions) == 1


@pytest.mark.timeout_s(420)
def test_four_process_interval_commits_all_from_coordinator(tmp_path) -> None:
    """4-process SPMD over the global (slice=4, batch=1, paths=4) mesh with
    FinalAndIntervalCommit(interval=2) over 5 batches: exactly
    2 interval + 1 final = 3 chain versions, every one committed by process
    0, and the chain verifies (VERDICT r2 weak #6: interval commit gating
    under real multi-process SPMD)."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    store_root = tmp_path / "store"
    env = {
        **os.environ,
        "PYTHONPATH": os.getcwd() + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    nprocs = 4
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(worker), str(i), str(nprocs), str(port),
                str(store_root), "interval", "1", "4", "5",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(nprocs)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i}_DONE" in out

    import asyncio

    from spectralmc_tpu.storage.object_store import FileSystemObjectStore
    from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
    from spectralmc_tpu.storage.verification import ChainValid, verify_chain_detailed

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(store_root), "models"))
    versions = expect_success(asyncio.run(store.list_versions()))
    # batches=5, interval=2: interval commits at 2 and 4, final at 5
    assert len(versions) == 3, [v.message for v in versions]
    steps = sorted(int(v.message.split()[0].split("=")[1]) for v in versions)
    assert steps == [2, 4, 5]
    outcome = expect_success(asyncio.run(verify_chain_detailed(store)))
    assert isinstance(outcome, ChainValid)
    # had ANY non-coordinator process raced a commit, the chain would show
    # more than 3 versions or a CAS conflict; 3 + valid Merkle chain proves
    # the process-0 gate held across every boundary
    loss_line = next(
        line for line in outputs[0].splitlines() if line.startswith("LOSSES=")
    )
    dist_losses = np.array(json.loads(loss_line[len("LOSSES="):]))
    assert dist_losses.shape == (5,) and np.isfinite(dist_losses).all()


def test_initialize_conflicting_args_fails_loudly(monkeypatch: pytest.MonkeyPatch) -> None:
    """A second explicit call with DIFFERENT topology arguments must fail
    loudly, not silently return the current runtime (VERDICT r2 weak #6)."""
    import spectralmc_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "_initialized", False)
    monkeypatch.setattr(dist, "_init_args", None)

    def fake_init(**kwargs):
        return None  # pretend the join succeeded

    monkeypatch.setattr(dist.jax.distributed, "initialize", fake_init)
    first = dist.initialize_distributed(
        coordinator_address="localhost:9999", num_processes=2, process_id=0
    )
    assert not isinstance(first, Failure)
    # same args: idempotent
    again = dist.initialize_distributed(
        coordinator_address="localhost:9999", num_processes=2, process_id=0
    )
    assert not isinstance(again, Failure)
    # different args: loud failure naming both argument sets
    conflict = dist.initialize_distributed(
        coordinator_address="otherhost:1234", num_processes=4, process_id=1
    )
    assert isinstance(conflict, Failure)
    assert "different" in conflict.error.reason
    assert "localhost:9999" in conflict.error.reason
