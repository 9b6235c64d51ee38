"""Effect-system tests (parity: reference tests/test_effects/ — CPU-only).

Covers: frozen-ness + discriminators, composition, the SharedRegistry data
plane, MockInterpreter recording/assertions, the real interpreter executing
MonteCarlo/metadata/logging/storage effects, and the effect builders.
"""

from __future__ import annotations

import asyncio
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.core.result import Failure, Success
from spectralmc_tpu.effects import (
    AdvanceCounter,
    CommitVersion,
    ComputeFFT,
    Effect,
    LogMessage,
    MockInterpreter,
    ReadObject,
    SharedRegistry,
    SimulatePaths,
    SpectralMCInterpreter,
    TrainSegment,
    UpdateMetadata,
    WriteObject,
    map_effect,
    parallel_effects,
    sequence_effects,
)
from spectralmc_tpu.effects.errors import MonteCarloError, RegistryError, UnknownEffect
from spectralmc_tpu.training.effects_builders import (
    build_simulation_effects,
    build_training_run_effects,
    build_training_step_effects,
)
from tests.helpers.factories import make_contract, make_simulation_params


def test_effects_frozen_and_discriminated() -> None:
    effect = SimulatePaths(spot=100.0, out_id="x")
    assert effect.kind == "simulate_paths"
    with pytest.raises(dataclasses.FrozenInstanceError):
        effect.spot = 1.0  # type: ignore[misc]
    assert AdvanceCounter().kind == "advance_counter"


def test_registry_typed_stores() -> None:
    reg = SharedRegistry()
    assert isinstance(reg.put_array("a", jnp.ones(3)), Success)
    assert isinstance(reg.put_array("a", jnp.ones(3)), Failure)  # duplicate rejected
    assert isinstance(reg.get_array("missing"), Failure)
    assert isinstance(reg.get_array("a"), Success)
    assert reg.update_metadata("n", "set", 5).value == 5
    assert reg.update_metadata("n", "increment", 0).value == 6
    assert reg.update_metadata("n", "add", 10).value == 16
    assert isinstance(reg.update_metadata("s", "set", "txt"), Success)
    assert isinstance(reg.update_metadata("s", "add", 1), Failure)
    snap = reg.freeze_snapshot()
    with pytest.raises(TypeError):
        snap.metadata["n"] = 0  # type: ignore[index]


def test_mock_interpreter_records_and_asserts() -> None:
    mock = MockInterpreter(mock_results={TrainSegment: {"loss": 1.0}})
    seq = build_training_step_effects(step=3, batch_size=8, learning_rate=1e-3)

    result = asyncio.run(mock.interpret_sequence(seq))
    assert isinstance(result, Success)
    assert result.value[0] == {"loss": 1.0}
    from spectralmc_tpu.effects.types import LogMetrics, UpdateMetadata as UM

    mock.assert_effect_sequence([TrainSegment, AdvanceCounter, AdvanceCounter, UM, LogMetrics])
    mock.assert_effect_count(AdvanceCounter, 2)
    mock.assert_contains(AdvanceCounter(stream="sobol", by=8))


def test_builder_run_structure() -> None:
    seq = build_training_run_effects(
        num_batches=5, batch_size=4, learning_rate=1e-3, commit_interval=2, final_commit=True
    )
    kinds = [getattr(e, "kind", type(e).__name__) for e in seq.effects]
    assert kinds.count("train_segment") == 3  # 2 + 2 + 1
    assert kinds.count("commit_version") == 3  # @2, @4, final@5
    segments = [e for e in seq.effects if getattr(e, "kind", "") == "train_segment"]
    assert [s.length for s in segments] == [2, 2, 1]


def test_real_interpreter_montecarlo_pipeline() -> None:
    """The interpreter executes the real simulation ops (parity: the reference
    launches the real kernel through its interpreter, interpreter.py:645-654)."""
    sim = make_simulation_params(timesteps=2, network_size=16, batches_per_mc_run=4)
    contract = make_contract()
    interp = SpectralMCInterpreter.create()
    seq = build_simulation_effects(sim, contract, out_id="payoffs")
    result = asyncio.run(interp.interpret_sequence(seq))
    assert isinstance(result, Success)
    spectrum = interp.registry.get_array("payoffs/spectrum").value
    assert spectrum.shape == (16,)
    # spectrum[0] is the mean discounted payoff — positive for an ATM put
    assert float(np.real(np.asarray(spectrum)[0])) > 0
    assert interp.registry.get_metadata("mc_skip").value == 1


def test_real_interpreter_storage_effects(tmp_path) -> None:
    from spectralmc_tpu.serialization import compute_sha256
    from spectralmc_tpu.storage import AsyncBlockchainModelStore, FileSystemObjectStore

    store = AsyncBlockchainModelStore(FileSystemObjectStore(tmp_path, "fx"))
    interp = SpectralMCInterpreter.create(store=store)
    payload = b"effect-committed"
    interp.registry.put_blob("checkpoint", payload)
    seq = sequence_effects(
        [
            WriteObject(key="scratch/obj", data_id="checkpoint"),
            ReadObject(key="scratch/obj", out_id="readback"),
            CommitVersion(
                data_id="checkpoint",
                content_hash=compute_sha256(payload),
                message="via effects",
            ),
        ]
    )
    result = asyncio.run(interp.interpret_sequence(seq))
    assert isinstance(result, Success)
    assert interp.registry.get_blob("readback").value == payload
    version = result.value[2]
    assert version.counter == 0 and version.message == "via effects"


def test_interpreter_fail_fast_and_unknown() -> None:
    interp = SpectralMCInterpreter.create()
    seq = sequence_effects(
        [
            ComputeFFT(in_id="never_registered", batches=1, network_size=4, out_id="x"),
            LogMessage(message="unreachable"),
        ]
    )
    result = asyncio.run(interp.interpret_sequence(seq))
    assert isinstance(result, Failure)
    assert isinstance(result.error, MonteCarloError)

    class Bogus:
        pass

    unknown = asyncio.run(interp.interpret(Bogus()))  # type: ignore[arg-type]
    assert isinstance(unknown.error, UnknownEffect)


def test_parallel_and_map_composition() -> None:
    interp = SpectralMCInterpreter.create()
    par = parallel_effects(
        [
            UpdateMetadata(key="a", operation="set", value=1),
            UpdateMetadata(key="b", operation="set", value=2),
        ],
        combiner=lambda values: sum(values),
    )
    assert asyncio.run(interp.interpret_parallel(par)).value == 3
    mapped = map_effect(UpdateMetadata(key="c", operation="set", value=10), lambda v: v * 2)
    assert asyncio.run(interp.interpret(mapped)).value == 20


def test_rng_counter_effects() -> None:
    from spectralmc_tpu.effects.types import CaptureCounters, RestoreCounters

    interp = SpectralMCInterpreter.create()
    asyncio.run(interp.interpret(RestoreCounters(sobol_skip=7, mc_skip=11)))
    asyncio.run(interp.interpret(AdvanceCounter(stream="sobol", by=3)))
    snap = asyncio.run(interp.interpret(CaptureCounters()))
    assert snap.value == {"sobol_skip": 10, "mc_skip": 11}
