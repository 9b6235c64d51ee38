"""Warmup-cosine learning-rate schedule (extension; the reference trains at
a fixed Adam rate, gbm_trainer.py:1513-1528).

The hard property is RESUME: the schedule's position is the optimizer step
count, re-synced from the typed Adam snapshot on restore
(adam_state.restore_into_optax), so snapshot/resume ≡ continuous must stay
bit-exact even while the learning rate is mid-decay.
"""

from __future__ import annotations

import numpy as np
import optax

from spectralmc_tpu.core.errors.trainer import InvalidTrainingConfig
from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
from spectralmc_tpu.training.step import LRScheduleConfig, make_optimizer
from spectralmc_tpu.training.trainer import (
    GbmCVNNPricer,
    GbmCVNNPricerConfig,
    build_training_config,
)
from tests.helpers.factories import CONTRACT_BOUNDS, make_simulation_params
from tests.helpers.result_utils import expect_failure, expect_success

SCHEDULE = LRScheduleConfig(peak=5e-3, decay_steps=20, warmup_steps=4, end_value=1e-5)


def make_pricer() -> GbmCVNNPricer:
    sim = make_simulation_params(timesteps=2, network_size=16, batches_per_mc_run=4)
    cvnn = expect_success(
        build_cvnn_config(layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=3)
    )
    return expect_success(
        GbmCVNNPricer.create(GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn))
    )


def cfg(num_batches: int, schedule: LRScheduleConfig | None = SCHEDULE):
    return expect_success(
        build_training_config(
            num_batches=num_batches, batch_size=4, learning_rate=2e-3, lr_schedule=schedule
        )
    )


def test_schedule_validation() -> None:
    bad_peak = build_training_config(
        num_batches=1, batch_size=1, learning_rate=0.1,
        lr_schedule=LRScheduleConfig(peak=0.0, decay_steps=10),
    )
    assert isinstance(expect_failure(bad_peak), InvalidTrainingConfig)
    bad_warmup = build_training_config(
        num_batches=1, batch_size=1, learning_rate=0.1,
        lr_schedule=LRScheduleConfig(peak=1e-3, decay_steps=10, warmup_steps=10),
    )
    assert isinstance(expect_failure(bad_warmup), InvalidTrainingConfig)


def test_make_optimizer_state_shapes() -> None:
    """Scheduled adam carries a ScaleByScheduleState whose count advances."""
    import jax.numpy as jnp

    params = {"w": jnp.ones((3,))}
    opt = make_optimizer(2e-3, SCHEDULE)
    state = opt.init(params)
    kinds = tuple(type(s).__name__ for s in state)
    assert "ScaleByScheduleState" in kinds
    grads = {"w": jnp.ones((3,))}
    _, state2 = opt.update(grads, state, params)
    sched = [s for s in state2 if isinstance(s, optax.ScaleByScheduleState)][0]
    assert int(np.asarray(sched.count)) == 1


def test_scheduled_training_differs_from_constant_and_decays() -> None:
    """With a decaying rate, late steps move parameters less than the
    constant-rate run (mid-training losses must differ — the schedule is
    actually reaching the update)."""
    with_sched = expect_success(make_pricer().train(cfg(20)))
    constant = expect_success(make_pricer().train(cfg(20, schedule=None)))
    assert not np.array_equal(with_sched.losses, constant.losses)


def test_snapshot_resume_bit_exact_mid_schedule() -> None:
    """Split a 20-step schedule 8 + 12 across a snapshot: the resumed pricer
    must reproduce the continuous run bit-for-bit — the schedule count is
    restored from the Adam count, not reset to zero."""
    continuous = make_pricer()
    split = make_pricer()
    r_first = expect_success(split.train(cfg(8)))
    resumed = expect_success(GbmCVNNPricer.create(split.snapshot()))
    r_rest = expect_success(resumed.train(cfg(12)))
    r_cont = expect_success(continuous.train(cfg(20)))
    np.testing.assert_array_equal(
        np.concatenate([r_first.losses, r_rest.losses]), r_cont.losses
    )


def test_schedule_proto_round_trip() -> None:
    from spectralmc_tpu.serialization.converters import (
        training_config_from_proto,
        training_config_to_proto,
    )

    tc = cfg(10)
    back = expect_success(training_config_from_proto(training_config_to_proto(tc)))
    assert back == tc
    plain = cfg(10, schedule=None)
    assert (
        expect_success(
            training_config_from_proto(training_config_to_proto(plain))
        ).lr_schedule
        is None
    )


def test_sharded_schedule_matches_single_device() -> None:
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-virtual-device mesh")
    from spectralmc_tpu.parallel.mesh import build_mesh_spec

    spec = expect_success(build_mesh_spec(batch_shards=2, paths_shards=4))
    sim = make_simulation_params(timesteps=2, network_size=16, batches_per_mc_run=8)
    cvnn = expect_success(
        build_cvnn_config(layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=5)
    )
    config = GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)
    single = expect_success(GbmCVNNPricer.create(config))
    sharded = expect_success(GbmCVNNPricer.create(config, mesh_spec=spec))
    tc = expect_success(
        build_training_config(
            num_batches=6, batch_size=8, learning_rate=2e-3, lr_schedule=SCHEDULE
        )
    )
    r_single = expect_success(single.train(tc))
    r_sharded = expect_success(sharded.train(tc))
    np.testing.assert_allclose(r_sharded.losses, r_single.losses, rtol=3e-4)


def test_effects_path_matches_imperative_with_schedule() -> None:
    a = make_pricer()
    b = make_pricer()
    r_imperative = expect_success(a.train(cfg(10)))
    r_effects = expect_success(b.train_via_effects(cfg(10)))
    np.testing.assert_array_equal(r_effects.losses, r_imperative.losses)


def test_metrics_report_actual_schedule_rates() -> None:
    """Regression: StepMetrics.learning_rate used to log the constant config
    rate while the optimizer swept the schedule; it must report the real
    per-step rates (warmup rising from ~0, never equal to the flat rate)."""
    from spectralmc_tpu.training.step import schedule_rates

    pricer = make_pricer()
    seen: list[float] = []
    pricer.set_step_callback(lambda m: seen.append(m.learning_rate))
    expect_success(pricer.train(cfg(10)))
    expected = schedule_rates(SCHEDULE, 0, 10)
    np.testing.assert_allclose(np.array(seen), expected, rtol=1e-6)
    assert seen[0] < seen[3] < max(seen)  # warmup actually visible
