"""Multi-asset correlated-GBM basket family (extension; no reference counterpart).

Oracle strategy mirrors the Asian/Heston extensions: the geometric basket is
EXACTLY lognormal under log-Euler, so ``geometric_basket_price`` (and its AD
Greeks) gate the simulator with zero discretization bias; the arithmetic
basket is gated through degenerate-case equivalence, closed-form means and
correlation monotonicity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.core.errors.gbm import InvalidSimulationParams
from spectralmc_tpu.ops.analytic import black_scholes_price, geometric_basket_price
from spectralmc_tpu.ops.basket import (
    BasketCombine,
    BasketSpec,
    basket_cholesky,
    build_basket_spec,
    expected_basket_underlier_mean,
    simulate_basket_underlier_rows,
)
from spectralmc_tpu.ops.gbm import (
    ModelKind,
    PathScheme,
    PayoffKind,
    SimImplementation,
    build_simulation_params,
    has_closed_form_mean,
    resolve_implementation,
    terminal_to_prices,
)
from tests.helpers.factories import make_contract, make_simulation_params
from tests.helpers.result_utils import expect_failure, expect_success

CORR_3 = ((1.0, 0.5, 0.2), (0.5, 1.0, 0.3), (0.2, 0.3, 1.0))


def make_spec(**overrides: object) -> BasketSpec:
    base: dict[str, object] = dict(
        weights=(0.5, 0.3, 0.2),
        correlation=CORR_3,
        spot_multipliers=(1.0, 0.9, 1.1),
        vol_multipliers=(1.0, 1.3, 0.7),
    )
    base.update(overrides)
    return expect_success(build_basket_spec(**base))


# --------------------------------------------------------------------------
# Spec validation
# --------------------------------------------------------------------------


def test_spec_validation_rejects_bad_inputs() -> None:
    bad_weights = build_basket_spec(weights=(0.5, 0.6), correlation=((1.0, 0.0), (0.0, 1.0)))
    assert isinstance(expect_failure(bad_weights), InvalidSimulationParams)
    asym = build_basket_spec(
        weights=(0.5, 0.5), correlation=((1.0, 0.3), (0.5, 1.0))
    )
    assert isinstance(expect_failure(asym), InvalidSimulationParams)
    not_psd = build_basket_spec(
        weights=(1 / 3, 1 / 3, 1 / 3),
        correlation=((1.0, 0.9, -0.9), (0.9, 1.0, 0.9), (-0.9, 0.9, 1.0)),
    )
    assert isinstance(expect_failure(not_psd), InvalidSimulationParams)
    bad_diag = build_basket_spec(weights=(1.0,), correlation=((0.9,),))
    assert isinstance(expect_failure(bad_diag), InvalidSimulationParams)
    wrong_len = build_basket_spec(
        weights=(0.5, 0.5),
        correlation=((1.0, 0.0), (0.0, 1.0)),
        vol_multipliers=(1.0,),
    )
    assert isinstance(expect_failure(wrong_len), InvalidSimulationParams)


def test_sim_params_gate_basket_presence_and_scheme() -> None:
    spec = make_spec()
    missing = build_simulation_params(
        timesteps=2, network_size=8, batches_per_mc_run=2, mc_seed=1, model=ModelKind.BASKET_GBM
    )
    assert isinstance(expect_failure(missing), InvalidSimulationParams)
    euler = build_simulation_params(
        timesteps=2,
        network_size=8,
        batches_per_mc_run=2,
        mc_seed=1,
        model=ModelKind.BASKET_GBM,
        basket=spec,
        scheme=PathScheme.EULER,
    )
    assert isinstance(expect_failure(euler), InvalidSimulationParams)
    stray = build_simulation_params(
        timesteps=2, network_size=8, batches_per_mc_run=2, mc_seed=1, basket=spec
    )
    assert isinstance(expect_failure(stray), InvalidSimulationParams)
    ok = build_simulation_params(
        timesteps=2,
        network_size=8,
        batches_per_mc_run=2,
        mc_seed=1,
        model=ModelKind.BASKET_GBM,
        basket=spec,
    )
    assert expect_success(ok).basket == spec


def test_closed_form_mean_matrix() -> None:
    assert has_closed_form_mean(
        ModelKind.BASKET_GBM, PayoffKind.ASIAN_GEOMETRIC, combine=BasketCombine.GEOMETRIC
    )
    assert not has_closed_form_mean(
        ModelKind.BASKET_GBM, PayoffKind.ASIAN_GEOMETRIC, combine=BasketCombine.ARITHMETIC
    )
    assert has_closed_form_mean(
        ModelKind.BASKET_GBM, PayoffKind.TERMINAL, combine=BasketCombine.ARITHMETIC
    )


def test_resolve_implementation_routes_basket_to_xla() -> None:
    sim = make_simulation_params(
        model=ModelKind.BASKET_GBM,
        basket=make_spec(),
        implementation=SimImplementation.PALLAS,
    )
    assert resolve_implementation(sim) == SimImplementation.XLA


# --------------------------------------------------------------------------
# Simulator correctness
# --------------------------------------------------------------------------


def _simulate(spec: BasketSpec, contract, *, timesteps=4, rows=64, cols=512, payoff=PayoffKind.TERMINAL, seed=7, forward_start_step=None, **payoff_knobs):
    key = jax.random.PRNGKey(seed)
    return simulate_basket_underlier_rows(
        key,
        contract.as_array(jnp.float32),
        spec=spec,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        dtype=jnp.float32,
        payoff=payoff,
        forward_start_step=forward_start_step,
        **payoff_knobs,
    )


def test_single_asset_basket_prices_like_black_scholes() -> None:
    """A 1-asset basket IS a GBM: its MC price must hit the Black formula
    (statistical gate, matching the reference's z-score discipline)."""
    spec = expect_success(build_basket_spec(weights=(1.0,), correlation=((1.0,),)))
    contract = make_contract()
    rows = _simulate(spec, contract, timesteps=8, rows=128, cols=1024)
    arr = contract.as_array(jnp.float32)
    prices = terminal_to_prices(
        rows.reshape(-1),
        arr,
        normalize=True,
        dtype=jnp.float32,
        mean_target=expected_basket_underlier_mean(
            arr, spec, timesteps=8, payoff=PayoffKind.TERMINAL, dtype=jnp.float32
        ),
    )
    analytic = black_scholes_price(
        contract.spot, contract.strike, contract.maturity, contract.rate,
        contract.div_yield, contract.vol,
    )
    mc_put = float(jnp.mean(prices.put_payoffs))
    se = float(jnp.std(prices.put_payoffs)) / np.sqrt(prices.put_payoffs.size)
    z = abs(mc_put - float(analytic.put)) / se
    assert z < 4.0, f"z={z}: mc={mc_put} analytic={float(analytic.put)}"


def test_geometric_basket_matches_closed_form() -> None:
    """Geometric basket terminal price vs the exact lognormal closed form."""
    spec = make_spec(combine=BasketCombine.GEOMETRIC)
    contract = make_contract()
    rows = _simulate(spec, contract, timesteps=6, rows=128, cols=1024)
    arr = contract.as_array(jnp.float32)
    prices = terminal_to_prices(
        rows.reshape(-1),
        arr,
        normalize=True,
        dtype=jnp.float32,
        mean_target=expected_basket_underlier_mean(
            arr, spec, timesteps=6, payoff=PayoffKind.TERMINAL, dtype=jnp.float32
        ),
    )
    analytic = geometric_basket_price(
        contract.spot, contract.strike, contract.maturity, contract.rate,
        contract.div_yield, contract.vol, spec=spec,
    )
    for side, payoffs in (("put", prices.put_payoffs), ("call", prices.call_payoffs)):
        mc = float(jnp.mean(payoffs))
        want = float(getattr(analytic, side))
        se = float(jnp.std(payoffs)) / np.sqrt(payoffs.size)
        z = abs(mc - want) / se
        assert z < 4.0, f"{side}: z={z} mc={mc} analytic={want}"


def test_sample_means_hit_closed_forms_all_payoffs() -> None:
    """E[underlier] closed forms vs sample means (z-gate) for every
    (combine, payoff) pair that claims one."""
    contract = make_contract()
    arr = contract.as_array(jnp.float32)
    for combine in (BasketCombine.ARITHMETIC, BasketCombine.GEOMETRIC):
        spec = make_spec(combine=combine)
        for payoff in PayoffKind:
            m_fs = 2 if payoff == PayoffKind.FORWARD_START else None
            knobs = (
                dict(cliquet_reset_every=2, cliquet_floor=0.0, cliquet_cap=0.05)
                if payoff == PayoffKind.CLIQUET
                else {}
            )
            if not has_closed_form_mean(ModelKind.BASKET_GBM, payoff, combine=combine):
                assert (
                    expected_basket_underlier_mean(
                        arr, spec, timesteps=4, payoff=payoff, dtype=jnp.float32,
                        forward_start_step=m_fs, **knobs,
                    )
                    is None
                )
                continue
            vals = _simulate(
                spec, contract, payoff=payoff, rows=128, cols=1024,
                forward_start_step=m_fs, **knobs,
            )
            want = float(
                expected_basket_underlier_mean(
                    arr, spec, timesteps=4, payoff=payoff, dtype=jnp.float32,
                    forward_start_step=m_fs, **knobs,
                )
            )
            got = float(jnp.mean(vals))
            se = float(jnp.std(vals)) / np.sqrt(vals.size)
            z = abs(got - want) / se
            assert z < 4.5, f"{combine.value}/{payoff.value}: z={z} got={got} want={want}"


def test_correlation_raises_basket_option_value() -> None:
    """Higher correlation -> higher basket variance -> pricier basket call
    (convexity); a strong qualitative gate on the Cholesky mixing."""
    contract = make_contract(strike=105.0)

    def call_price(rho: float) -> float:
        corr = tuple(
            tuple(1.0 if i == j else rho for j in range(3)) for i in range(3)
        )
        spec = make_spec(correlation=corr)
        rows = _simulate(spec, contract, timesteps=4, rows=128, cols=1024)
        arr = contract.as_array(jnp.float32)
        prices = terminal_to_prices(
            rows.reshape(-1), arr, normalize=True, dtype=jnp.float32,
            mean_target=expected_basket_underlier_mean(
                arr, spec, timesteps=4, payoff=PayoffKind.TERMINAL, dtype=jnp.float32
            ),
        )
        return float(jnp.mean(prices.call_payoffs))

    low, mid, high = call_price(0.0), call_price(0.5), call_price(0.95)
    assert low < mid < high, (low, mid, high)


def test_row_offset_shard_stability() -> None:
    """A shard owning rows [k, k+n) with row_offset=k reproduces exactly the
    full run's rows — the same DP contract as GBM/Heston."""
    spec = make_spec()
    contract = make_contract()
    key = jax.random.PRNGKey(3)
    full = simulate_basket_underlier_rows(
        key, contract.as_array(jnp.float32), spec=spec, timesteps=3, rows=8,
        cols=128, dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
    )
    shard = simulate_basket_underlier_rows(
        key, contract.as_array(jnp.float32), spec=spec, timesteps=3, rows=4,
        cols=128, dtype=jnp.float32, payoff=PayoffKind.TERMINAL, row_offset=4,
    )
    np.testing.assert_array_equal(np.asarray(full[4:]), np.asarray(shard))


def test_cholesky_cached_and_lower_triangular() -> None:
    spec = make_spec()
    l1 = basket_cholesky(spec)
    l2 = basket_cholesky(make_spec())
    assert l1 is l2  # frozen spec hashes equal -> lru hit
    assert np.allclose(l1 @ l1.T, np.asarray(spec.correlation))
    assert np.allclose(l1, np.tril(l1))


# --------------------------------------------------------------------------
# Greeks through the shared dispatch
# --------------------------------------------------------------------------


def test_basket_greeks_vs_ad_of_closed_form() -> None:
    """Pathwise basket Greeks vs autodiff of the exact geometric-basket
    closed form — the multi-asset analogue of the Asian Greeks gate."""
    from spectralmc_tpu.ops.greeks import OptionSide, mc_greeks

    spec = make_spec(combine=BasketCombine.GEOMETRIC)
    sim = make_simulation_params(
        timesteps=6,
        network_size=256,
        batches_per_mc_run=256,
        model=ModelKind.BASKET_GBM,
        basket=spec,
    )
    contract = make_contract()
    mc = mc_greeks(sim, contract, option=OptionSide.CALL)

    def price(arr: jax.Array) -> jax.Array:
        return geometric_basket_price(
            arr[0], arr[1], arr[2], arr[3], arr[4], arr[5], spec=spec
        ).call

    arr64 = contract.as_array(jnp.float64)
    want_price = float(price(arr64))
    grad = np.asarray(jax.grad(price)(arr64))
    assert mc.price == pytest.approx(want_price, rel=0.02, abs=0.01)
    fields = ("spot", "strike", "maturity", "rate", "div_yield", "vol")
    for i, name in enumerate(fields):
        assert mc.by_field[name] == pytest.approx(
            float(grad[i]), rel=0.05, abs=0.006
        ), name


# --------------------------------------------------------------------------
# Wire format + end-to-end training
# --------------------------------------------------------------------------


def test_sim_params_basket_proto_round_trip() -> None:
    from spectralmc_tpu.serialization.converters import (
        sim_params_from_proto,
        sim_params_to_proto,
    )

    sim = make_simulation_params(
        model=ModelKind.BASKET_GBM, basket=make_spec(combine=BasketCombine.GEOMETRIC)
    )
    back = expect_success(sim_params_from_proto(sim_params_to_proto(sim)))
    assert back == sim
    # absent basket stays absent
    plain = make_simulation_params()
    assert expect_success(sim_params_from_proto(sim_params_to_proto(plain))).basket is None


def test_basket_pricer_trains_and_resumes_bit_exact() -> None:
    """Full trainer stack over the basket family: loss decreases, snapshot
    round-trips through the wire format, resume == continuous (bit-exact)."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.serialization.converters import (
        checkpoint_from_proto,
        checkpoint_to_proto,
    )
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers.factories import CONTRACT_BOUNDS

    sim = make_simulation_params(
        timesteps=2,
        network_size=16,
        batches_per_mc_run=4,
        model=ModelKind.BASKET_GBM,
        basket=make_spec(),
    )
    cvnn = expect_success(
        build_cvnn_config(layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=3)
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)
    pricer = expect_success(GbmCVNNPricer.create(cfg))
    tc = expect_success(build_training_config(num_batches=20, batch_size=8, learning_rate=3e-3))
    result = expect_success(pricer.train(tc))
    assert float(np.mean(result.losses[-5:])) < float(np.mean(result.losses[:5]))

    snap = pricer.snapshot()
    assert snap.sim.basket == sim.basket
    wire = expect_success(checkpoint_from_proto(checkpoint_to_proto(snap)))
    assert wire.sim.basket == sim.basket
    resumed = expect_success(GbmCVNNPricer.create(wire))
    tc5 = expect_success(build_training_config(num_batches=5, batch_size=8, learning_rate=3e-3))
    cont = expect_success(pricer.train(tc5))
    res = expect_success(resumed.train(tc5))
    np.testing.assert_array_equal(cont.losses, res.losses)

    pred = resumed.predict_price([make_contract()])
    assert np.isfinite(pred.put).all() and np.isfinite(pred.call).all()
    greeks = resumed.predict_greeks([make_contract()])
    assert np.isfinite(greeks.put_jacobian).all()
