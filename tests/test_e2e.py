"""End-to-end tours (parity: reference tests/test_e2e/ —
test_full_stack_cvnn_pricer.py:65-126 and test_training_checkpoint.py:47-120).

The documented single path: config → training → blockchain commit → reload
(into a *differently-seeded* world) → deterministic inference; plus the
checkpoint round-trip with optimizer-state equality.
"""

from __future__ import annotations

import asyncio

import numpy as np

from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
from spectralmc_tpu.ops.gbm import build_simulation_params
from spectralmc_tpu.ops.sobol import BoundSpec
from spectralmc_tpu.storage.checkpoint import (
    commit_snapshot,
    load_snapshot_from_checkpoint,
    make_commit_fn,
)
from spectralmc_tpu.storage.object_store import FileSystemObjectStore
from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
from spectralmc_tpu.storage.verification import ChainValid, verify_chain_detailed
from spectralmc_tpu.training.trainer import (
    FinalAndIntervalCommit,
    GbmCVNNPricer,
    GbmCVNNPricerConfig,
    build_training_config,
)
from tests.helpers import expect_success
from tests.helpers.factories import make_contract

BOUNDS = {
    "spot": BoundSpec(lower=90.0, upper=110.0),
    "strike": BoundSpec(lower=90.0, upper=110.0),
    "maturity": BoundSpec(lower=0.5, upper=1.5),
    "rate": BoundSpec(lower=0.0, upper=0.05),
    "div_yield": BoundSpec(lower=0.0, upper=0.02),
    "vol": BoundSpec(lower=0.1, upper=0.4),
}


def _fresh_config(seed: int) -> GbmCVNNPricerConfig:
    # reference e2e scale: 16 timesteps x 128 network x 4 batches
    sim = expect_success(
        build_simulation_params(
            mc_seed=11, timesteps=16, network_size=128, batches_per_mc_run=4
        )
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=32, activation=Activation.MODRELU)], seed=seed
        )
    )
    return GbmCVNNPricerConfig(sim=sim, bounds=BOUNDS, cvnn=cvnn)


def test_full_stack_train_commit_reload_predict(tmp_path) -> None:
    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "e2e"))

    # 1. train with interval+final commits straight into the chain
    pricer = expect_success(GbmCVNNPricer.create(_fresh_config(seed=5)))
    tc = expect_success(
        build_training_config(num_batches=4, batch_size=8, learning_rate=1e-3)
    )
    result = expect_success(
        pricer.train(
            tc,
            commit_plan=FinalAndIntervalCommit(interval=2),
            commit_fn=make_commit_fn(store),
        )
    )
    assert np.all(np.isfinite(result.losses))

    # 2. the chain holds the commits and verifies
    versions = expect_success(asyncio.run(store.list_versions()))
    # step 2 (interval) + step 4 (final; the interval boundary at 4 is not
    # double-committed)
    assert len(versions) == 2
    assert versions[0].message.startswith("step=2 ")
    assert versions[1].message.startswith("step=4 ")
    assert isinstance(expect_success(asyncio.run(verify_chain_detailed(store))), ChainValid)

    # 3. reload HEAD into a world seeded differently — the checkpoint is
    # self-describing, so the restored pricer must not depend on local seeds
    head = expect_success(asyncio.run(store.get_head()))
    restored_cfg = expect_success(
        asyncio.run(load_snapshot_from_checkpoint(store, head))
    )
    assert restored_cfg.global_step == 4
    restored = expect_success(GbmCVNNPricer.create(restored_cfg))

    # 4. deterministic inference: original and reloaded agree bit-for-bit
    contracts = [make_contract(strike=95.0), make_contract(strike=105.0)]
    a = pricer.predict_price(contracts)
    b = restored.predict_price(contracts)
    assert np.array_equal(a.put, b.put)
    assert np.array_equal(a.call, b.call)
    assert np.all(np.isfinite(a.put)) and np.all(np.isfinite(a.call))


def test_checkpoint_roundtrip_optimizer_state_equality(tmp_path) -> None:
    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "ckpt"))
    pricer = expect_success(GbmCVNNPricer.create(_fresh_config(seed=9)))
    tc = expect_success(
        build_training_config(num_batches=3, batch_size=4, learning_rate=2e-3)
    )
    expect_success(pricer.train(tc))
    snap = pricer.snapshot()
    version = expect_success(asyncio.run(commit_snapshot(store, snap, "round-trip")))
    loaded = expect_success(asyncio.run(load_snapshot_from_checkpoint(store, version)))

    assert loaded.global_step == snap.global_step
    assert loaded.sobol_skip == snap.sobol_skip
    assert loaded.sim == snap.sim
    assert loaded.optimizer_state.schema_version == snap.optimizer_state.schema_version
    assert loaded.optimizer_state.count == snap.optimizer_state.count
    assert set(loaded.optimizer_state.mu) == set(snap.optimizer_state.mu)
    for k in snap.optimizer_state.mu:
        assert np.array_equal(loaded.optimizer_state.mu[k], snap.optimizer_state.mu[k]), k
        assert np.array_equal(loaded.optimizer_state.nu[k], snap.optimizer_state.nu[k]), k
    for k in snap.model_state:
        assert np.array_equal(loaded.model_state[k], snap.model_state[k]), k

    # training both 2 more batches stays in lock step (resume == continuous)
    c1 = expect_success(GbmCVNNPricer.create(snap))
    c2 = expect_success(GbmCVNNPricer.create(loaded))
    tc2 = expect_success(
        build_training_config(num_batches=2, batch_size=4, learning_rate=2e-3)
    )
    r1 = expect_success(c1.train(tc2))
    r2 = expect_success(c2.train(tc2))
    assert np.array_equal(r1.losses, r2.losses)


def test_serving_path_tracking_client_hot_swap_to_prediction(tmp_path) -> None:
    """SURVEY call stack 3.4 end to end: train -> commit v0 -> tracking
    InferenceClient serves v0 -> more training -> commit v1 -> the poll loop
    hot-swaps -> predictions from the served config match the live trainer's
    bit-for-bit."""
    from spectralmc_tpu.storage.inference import InferenceClient, TrackingMode
    from spectralmc_tpu.training.trainer import FinalCommit

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "serving"))
    commit_fn = make_commit_fn(store)
    trainer = expect_success(GbmCVNNPricer.create(_fresh_config(seed=4)))
    tc = expect_success(build_training_config(num_batches=2, batch_size=4,
                                              learning_rate=2e-3))
    expect_success(trainer.train(tc, commit_plan=FinalCommit(), commit_fn=commit_fn))
    contracts = [make_contract(strike=95.0), make_contract(strike=105.0)]

    async def serve() -> None:
        async with InferenceClient(store, TrackingMode(), poll_interval=0.05) as client:
            v0 = client.get_model()
            assert v0 is not None and v0.version.counter == 0
            served_v0 = expect_success(GbmCVNNPricer.create(v0.config))
            pred_v0 = served_v0.predict_price(contracts)

            # the trainer advances and commits v1 while the client polls.
            # train() runs on a worker thread: the synchronous commit adapter
            # drives its own event loop (asyncio.run), which is illegal on
            # the thread already running the client's loop.
            expect_success(
                await asyncio.to_thread(
                    trainer.train, tc, commit_plan=FinalCommit(), commit_fn=commit_fn
                )
            )
            for _ in range(100):
                await asyncio.sleep(0.05)
                current = client.get_model()
                if current is not None and current.version.counter == 1:
                    break
            else:
                raise AssertionError("tracking client never hot-swapped to v1")

            served_v1 = expect_success(GbmCVNNPricer.create(current.config))
            pred_v1 = served_v1.predict_price(contracts)
            live = trainer.predict_price(contracts)
            np.testing.assert_array_equal(pred_v1.put, live.put)
            np.testing.assert_array_equal(pred_v1.call, live.call)
            # the swap actually changed the served function
            assert not np.array_equal(pred_v0.put, pred_v1.put)

    asyncio.run(serve())


def test_extension_families_commit_reload_serve(tmp_path) -> None:
    """Round-2 families through the FULL production shell: a basket pricer
    (with barrier knockout payoff, antithetic pairing and an lr schedule —
    every checkpointed round-2 knob at once) trains, commits to the chain,
    reloads through a pinned InferenceClient, and the served config
    reproduces the live trainer's predictions bit-for-bit."""
    from spectralmc_tpu.ops.basket import build_basket_spec
    from spectralmc_tpu.ops.gbm import ForwardNormalization, ModelKind, PayoffKind
    from spectralmc_tpu.storage.inference import InferenceClient, PinnedMode
    from spectralmc_tpu.training.step import LRScheduleConfig
    from spectralmc_tpu.training.trainer import FinalCommit

    spec = expect_success(
        build_basket_spec(weights=(0.6, 0.4), correlation=((1.0, 0.3), (0.3, 1.0)))
    )
    sim = expect_success(
        build_simulation_params(
            mc_seed=11, timesteps=4, network_size=32, batches_per_mc_run=4,
            model=ModelKind.BASKET_GBM, basket=spec,
            payoff=PayoffKind.BARRIER_UP_OUT, barrier_rel=1.4,
            normalization=ForwardNormalization.NONE, antithetic=True,
        )
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=9
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=BOUNDS, cvnn=cvnn, normalize_inputs=True)
    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "ext"))
    trainer = expect_success(GbmCVNNPricer.create(cfg))
    tc = expect_success(
        build_training_config(
            num_batches=6, batch_size=4, learning_rate=2e-3,
            lr_schedule=LRScheduleConfig(peak=5e-3, decay_steps=6, warmup_steps=1),
        )
    )
    expect_success(
        trainer.train(tc, commit_plan=FinalCommit(), commit_fn=make_commit_fn(store))
    )
    contracts = [make_contract(strike=95.0), make_contract(strike=105.0)]
    live = trainer.predict_price(contracts)

    async def serve() -> None:
        async with InferenceClient(store, PinnedMode(counter=0)) as client:
            loaded = client.get_model()
            assert loaded is not None
            served_cfg = loaded.config
            # every round-2 knob survived the chain round trip
            assert served_cfg.sim.basket == spec
            assert served_cfg.sim.barrier_rel == 1.4
            assert served_cfg.sim.antithetic
            served = expect_success(GbmCVNNPricer.create(served_cfg))
            pred = served.predict_price(contracts)
            np.testing.assert_array_equal(pred.put, live.put)
            assert np.isnan(pred.call).all()  # knockouts have no parity call
            assert np.isnan(live.call).all()

    asyncio.run(serve())


def test_american_family_commit_reload_serve(tmp_path) -> None:
    """Round 3: the American family through the FULL production shell — an
    AMERICAN_PUT pricer (non-default lsmc_basis_degree, antithetic pairing)
    trains, commits to the chain, reloads through a pinned InferenceClient,
    and the served config reproduces the live trainer's predictions AND
    Greeks bit-for-bit (VERDICT r2 item 1: train→commit→serve + greeks)."""
    from spectralmc_tpu.ops.gbm import ForwardNormalization, PayoffKind
    from spectralmc_tpu.storage.inference import InferenceClient, PinnedMode
    from spectralmc_tpu.training.trainer import FinalCommit

    sim = expect_success(
        build_simulation_params(
            mc_seed=11, timesteps=4, network_size=32, batches_per_mc_run=4,
            payoff=PayoffKind.AMERICAN_PUT, lsmc_basis_degree=3,
            normalization=ForwardNormalization.NONE, antithetic=True,
        )
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=9
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=BOUNDS, cvnn=cvnn, normalize_inputs=True)
    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "amer"))
    trainer = expect_success(GbmCVNNPricer.create(cfg))
    tc = expect_success(
        build_training_config(num_batches=6, batch_size=4, learning_rate=2e-3)
    )
    expect_success(
        trainer.train(tc, commit_plan=FinalCommit(), commit_fn=make_commit_fn(store))
    )
    contracts = [make_contract(strike=95.0), make_contract(strike=105.0)]
    live = trainer.predict_price(contracts)
    live_greeks = trainer.predict_greeks(contracts)

    async def serve() -> None:
        async with InferenceClient(store, PinnedMode(counter=0)) as client:
            loaded = client.get_model()
            assert loaded is not None
            served_cfg = loaded.config
            # the American knobs survived the chain round trip
            assert served_cfg.sim.payoff == PayoffKind.AMERICAN_PUT
            assert served_cfg.sim.lsmc_basis_degree == 3
            assert served_cfg.sim.antithetic
            served = expect_success(GbmCVNNPricer.create(served_cfg))
            pred = served.predict_price(contracts)
            np.testing.assert_array_equal(pred.put, live.put)
            assert np.isnan(pred.call).all()  # early exercise breaks parity
            assert np.isnan(live.call).all()
            greeks = served.predict_greeks(contracts)
            np.testing.assert_array_equal(greeks.put, live_greeks.put)
            np.testing.assert_array_equal(
                greeks.put_jacobian, live_greeks.put_jacobian
            )
            assert np.isfinite(greeks.put_gamma).all()

    asyncio.run(serve())


def test_merton_family_commit_reload_serve(tmp_path) -> None:
    """Round 3: the Merton family through the FULL production shell — a
    jump-diffusion pricer with the hybrid-QMC sampling knob trains, commits
    to the chain, reloads through a pinned InferenceClient, and the served
    config reproduces the live trainer's predictions AND Greeks bit-for-bit
    (the 9-field contract marshalling and the sampling/model enums all
    survive the proto chain round trip)."""
    from spectralmc_tpu.ops.gbm import ModelKind, SamplingKind
    from spectralmc_tpu.ops.merton import MertonContract
    from spectralmc_tpu.storage.inference import InferenceClient, PinnedMode
    from spectralmc_tpu.training.trainer import FinalCommit

    sim = expect_success(
        build_simulation_params(
            mc_seed=11, timesteps=4, network_size=32, batches_per_mc_run=4,
            model=ModelKind.MERTON_JUMP, sampling=SamplingKind.SOBOL_BB,
        )
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=9
        )
    )
    merton_bounds = {
        **BOUNDS,
        "vol": BoundSpec(lower=0.15, upper=0.3),
        "lam": BoundSpec(lower=0.05, upper=1.0),
        "jump_mean": BoundSpec(lower=-0.2, upper=0.05),
        "jump_std": BoundSpec(lower=0.1, upper=0.3),
    }
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=merton_bounds, cvnn=cvnn,
                              normalize_inputs=True)
    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "mert"))
    trainer = expect_success(GbmCVNNPricer.create(cfg))
    tc = expect_success(
        build_training_config(num_batches=6, batch_size=4, learning_rate=2e-3)
    )
    expect_success(
        trainer.train(tc, commit_plan=FinalCommit(), commit_fn=make_commit_fn(store))
    )
    contracts = [
        MertonContract(spot=100.0, strike=k, maturity=1.0, rate=0.03,
                       div_yield=0.01, vol=0.2, lam=0.4, jump_mean=-0.08,
                       jump_std=0.18)
        for k in (95.0, 105.0)
    ]
    live = trainer.predict_price(contracts)
    live_greeks = trainer.predict_greeks(contracts)

    async def serve() -> None:
        async with InferenceClient(store, PinnedMode(counter=0)) as client:
            loaded = client.get_model()
            assert loaded is not None
            served_cfg = loaded.config
            # the Merton knobs survived the chain round trip
            assert served_cfg.sim.model == ModelKind.MERTON_JUMP
            assert served_cfg.sim.sampling == SamplingKind.SOBOL_BB
            served = expect_success(GbmCVNNPricer.create(served_cfg))
            pred = served.predict_price(contracts)
            np.testing.assert_array_equal(pred.put, live.put)
            np.testing.assert_array_equal(pred.call, live.call)
            assert np.isfinite(pred.call).all()  # martingale spot: parity holds
            greeks = served.predict_greeks(contracts)
            np.testing.assert_array_equal(greeks.put, live_greeks.put)
            np.testing.assert_array_equal(
                greeks.put_jacobian, live_greeks.put_jacobian
            )
            assert greeks.put_jacobian.shape == (2, 9)  # 9-field Jacobian

    asyncio.run(serve())


def test_tracking_client_hot_swap_under_concurrent_prediction_load(tmp_path) -> None:
    """Round 4 (VERDICT r3 #8): the atomic hot swap must be invisible to a
    concurrent prediction loop. A serving task prices continuously off
    `client.get_model()` while the trainer commits v1; every prediction must
    equal EITHER the v0 surface or the v1 surface bit-for-bit (no torn
    state, no exception), and both surfaces must be observed — proof the
    swap happened mid-load. Reference seam being matched: the GIL-atomic
    reference swap in storage/inference.py:413-415 of the reference."""
    from spectralmc_tpu.storage.inference import InferenceClient, TrackingMode
    from spectralmc_tpu.training.trainer import FinalCommit

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "load"))
    commit_fn = make_commit_fn(store)
    trainer = expect_success(GbmCVNNPricer.create(_fresh_config(seed=6)))
    tc = expect_success(build_training_config(num_batches=2, batch_size=4,
                                              learning_rate=2e-3))
    expect_success(trainer.train(tc, commit_plan=FinalCommit(), commit_fn=commit_fn))
    contracts = [make_contract(strike=97.0), make_contract(strike=103.0)]

    async def serve() -> None:
        async with InferenceClient(store, TrackingMode(), poll_interval=0.02) as client:
            v0 = client.get_model()
            assert v0 is not None and v0.version.counter == 0
            # pre-build both reference surfaces' pricers lazily by version
            pricers: dict[int, object] = {}

            def predict_now() -> tuple[int, np.ndarray]:
                snap = client.get_model()
                assert snap is not None
                c = snap.version.counter
                if c not in pricers:
                    pricers[c] = expect_success(GbmCVNNPricer.create(snap.config))
                return c, np.asarray(pricers[c].predict_price(contracts).put)

            seen: dict[int, np.ndarray] = {}
            stop = asyncio.Event()
            observed_counters: set[int] = set()

            async def load_loop() -> None:
                while not stop.is_set():
                    c, put = await asyncio.to_thread(predict_now)
                    observed_counters.add(c)
                    if c in seen:
                        np.testing.assert_array_equal(
                            put, seen[c],
                            err_msg=f"torn prediction surface at version {c}",
                        )
                    else:
                        seen[c] = put
                    await asyncio.sleep(0)

            task = asyncio.create_task(load_loop())
            # commit v1 while the load loop is running
            expect_success(
                await asyncio.to_thread(
                    trainer.train, tc, commit_plan=FinalCommit(), commit_fn=commit_fn
                )
            )
            for _ in range(200):
                await asyncio.sleep(0.02)
                if 1 in observed_counters:
                    break
            stop.set()
            await task
            assert observed_counters == {0, 1}, observed_counters
            assert not np.array_equal(seen[0], seen[1])  # the swap changed the surface

    asyncio.run(serve())


def test_predict_accepts_columnar_contract_array() -> None:
    """Serving fast path: an [N, D] numpy array in model_fields order must be
    bit-equal to the pydantic-instance path (trainer._contracts_to_device),
    and a wrong-width array must fail loudly."""
    import pytest

    from spectralmc_tpu.ops.gbm import BlackScholesContract

    pricer = expect_success(GbmCVNNPricer.create(_fresh_config(seed=3)))
    contracts = [
        make_contract(spot=95.0 + i, strike=100.0, vol=0.2 + 0.01 * i)
        for i in range(5)
    ]
    fields = tuple(BlackScholesContract.model_fields.keys())
    arr = np.asarray(
        [[getattr(c, f) for f in fields] for c in contracts], dtype=np.float32
    )

    a = pricer.predict_price(contracts)
    b = pricer.predict_price(arr)
    assert np.array_equal(a.put, b.put)
    assert np.array_equal(a.call, b.call)
    assert a.imag_residue == b.imag_residue

    ga = pricer.predict_greeks(contracts)
    gb = pricer.predict_greeks(arr)
    assert np.array_equal(ga.put, gb.put)
    assert np.array_equal(ga.put_jacobian, gb.put_jacobian)
    assert np.array_equal(ga.call_gamma, gb.call_gamma)

    with pytest.raises(ValueError, match="field order"):
        pricer.predict_price(arr[:, :4])
    with pytest.raises(ValueError, match="field order"):
        pricer.predict_price(arr.reshape(-1))
