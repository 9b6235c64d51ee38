"""Term-structure (piecewise-constant vol/rate/div curves) tests.

Extension beyond the reference (its market data is six flat scalars,
gbm.py:77-103). Gates: build validation, flat-curve bit-identity with the
no-term stream, the effective-Black / weighted-Asian / curved-barrier exact
oracles, MEAN-normalization targets, engine routing, IPA Greeks vs autodiff
of the oracle, proto round trip, and trainer snapshot/resume bit-exactness.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralmc_tpu.core.errors.gbm import InvalidSimulationParams
from spectralmc_tpu.ops.analytic import (
    black_scholes_price,
    discrete_barrier_price,
    geometric_asian_price,
    term_effective_black,
    term_geometric_asian_price,
)
from spectralmc_tpu.ops.gbm import (
    BlackScholes,
    PayoffKind,
    SimImplementation,
    TermStructure,
    build_simulation_params,
    expected_underlier_mean,
    resolve_implementation,
    simulate_underlier_rows,
    validate_term_structure,
)
from spectralmc_tpu.ops.greeks import OptionSide, mc_greeks
from spectralmc_tpu.serialization.converters import (
    sim_params_from_proto,
    sim_params_to_proto,
)
from tests.helpers import expect_failure, expect_success
from tests.helpers.factories import make_contract, make_simulation_params

T = 8
# decaying vol, rising rates, flat divs — a recognizably curved market
CURVED = TermStructure(
    vol_shape=tuple(1.5 - 1.0 * i / T for i in range(T)),
    rate_shape=tuple(0.5 + 1.0 * i / T for i in range(T)),
)
SIM_SHAPE = dict(timesteps=T, network_size=256, batches_per_mc_run=256)


def _mc_price(sim, contract, channel: str = "put") -> tuple[float, float]:
    """(MC price, standard error) through the BlackScholes engine."""
    prices, _ = BlackScholes(sim).price(contract)
    payoffs = np.asarray(getattr(prices, f"{channel}_payoffs"), dtype=np.float64)
    return float(payoffs.mean()), float(payoffs.std(ddof=1) / np.sqrt(payoffs.size))


# --------------------------------------------------------------------------
# Build validation
# --------------------------------------------------------------------------


def test_build_rejects_wrong_length() -> None:
    err = expect_failure(
        build_simulation_params(
            **SIM_SHAPE, mc_seed=7, term=TermStructure(vol_shape=(1.0,) * (T + 1))
        )
    )
    assert isinstance(err, InvalidSimulationParams)
    assert err.field == "term.vol_shape"


def test_build_rejects_negative_and_all_zero_vol() -> None:
    err = expect_failure(
        build_simulation_params(
            **SIM_SHAPE, mc_seed=7, term=TermStructure(vol_shape=(-1.0,) * T)
        )
    )
    assert err.field == "term.vol_shape"
    err = expect_failure(
        build_simulation_params(
            **SIM_SHAPE, mc_seed=7, term=TermStructure(vol_shape=(0.0,) * T)
        )
    )
    assert "positive vol" in err.reason


def test_build_rejects_non_finite() -> None:
    err = expect_failure(
        build_simulation_params(
            **SIM_SHAPE,
            mc_seed=7,
            term=TermStructure(rate_shape=(float("nan"),) * T),
        )
    )
    assert err.field == "term.rate_shape"


def test_build_rejects_non_gbm_models_but_allows_american() -> None:
    err = expect_failure(
        build_simulation_params(
            **SIM_SHAPE, mc_seed=7, model="heston", term=CURVED
        )
    )
    assert err.field == "term"
    # American under GBM curves IS supported (curve-discounted backward
    # induction, gated vs bermudan_grid_price below)
    sim = expect_success(
        build_simulation_params(
            **SIM_SHAPE, mc_seed=7, payoff="american_put",
            normalization="none", term=CURVED,
        )
    )
    assert sim.term == CURVED


def test_validate_term_structure_direct() -> None:
    expect_success(validate_term_structure(CURVED, timesteps=T))
    expect_failure(validate_term_structure(CURVED, timesteps=T + 1))


# --------------------------------------------------------------------------
# Bit-identity: flat curves are the SAME program as no curves
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "payoff,extra",
    [
        ("terminal", {}),
        ("asian_geometric", {}),
        ("asian_arithmetic", {}),
        ("barrier_up_out", {"barrier_rel": 1.5, "normalization": "none"}),
    ],
)
def test_flat_term_bit_identical(payoff: str, extra: dict) -> None:
    """All-ones shapes must reproduce the no-term bit stream exactly — the
    term code path only ever changes numerics when the curves do."""
    contract = make_contract()
    base = make_simulation_params(**SIM_SHAPE, payoff=payoff, **extra)
    flat = make_simulation_params(
        **SIM_SHAPE,
        payoff=payoff,
        term=TermStructure(vol_shape=(1.0,) * T, rate_shape=(1.0,) * T),
        **extra,
    )
    p0, _ = BlackScholes(base).price(contract)
    p1, _ = BlackScholes(flat).price(contract)
    assert np.array_equal(np.asarray(p0.put_payoffs), np.asarray(p1.put_payoffs))
    assert np.array_equal(np.asarray(p0.call_payoffs), np.asarray(p1.call_payoffs))


# --------------------------------------------------------------------------
# Exact oracles
# --------------------------------------------------------------------------


def test_terminal_matches_effective_black() -> None:
    """ln S_T stays exactly Gaussian under per-step curves, so Black at the
    effective (RMS-vol, mean-rate) parameters is a zero-bias oracle."""
    contract = make_contract(strike=105.0)
    sim = make_simulation_params(**SIM_SHAPE, term=CURVED)
    oracle = term_effective_black(
        contract.spot,
        contract.strike,
        contract.maturity,
        contract.rate,
        contract.div_yield,
        contract.vol,
        vol_shape=CURVED.vol_shape,
        rate_shape=CURVED.rate_shape,
        div_shape=CURVED.div_shape,
    )
    for channel in ("put", "call"):
        mc, se = _mc_price(sim, contract, channel)
        want = float(getattr(oracle, channel))
        assert abs(mc - want) < 4.0 * max(se, 1e-6), (channel, mc, want, se)
    # and the curves genuinely move the price vs the flat market
    flat = black_scholes_price(
        contract.spot, contract.strike, contract.maturity,
        contract.rate, contract.div_yield, contract.vol,
    )
    assert abs(float(oracle.put) - float(flat.put)) > 0.02


def test_term_effective_black_flat_is_black() -> None:
    got = term_effective_black(
        100.0, 101.0, 1.2, 0.03, 0.01, 0.25,
        vol_shape=(1.0,) * 5, rate_shape=(), div_shape=(1.0,) * 5,
    )
    want = black_scholes_price(100.0, 101.0, 1.2, 0.03, 0.01, 0.25)
    assert float(got.put) == pytest.approx(float(want.put), abs=1e-12)
    assert float(got.call) == pytest.approx(float(want.call), abs=1e-12)


def test_geometric_asian_term_oracle() -> None:
    contract = make_contract()
    sim = make_simulation_params(**SIM_SHAPE, payoff="asian_geometric", term=CURVED)
    oracle = term_geometric_asian_price(
        contract.spot,
        contract.strike,
        contract.maturity,
        contract.rate,
        contract.div_yield,
        contract.vol,
        timesteps=T,
        vol_shape=CURVED.vol_shape,
        rate_shape=CURVED.rate_shape,
    )
    for channel in ("put", "call"):
        mc, se = _mc_price(sim, contract, channel)
        want = float(getattr(oracle, channel))
        assert abs(mc - want) < 4.0 * max(se, 1e-6), (channel, mc, want, se)


def test_geometric_asian_term_oracle_flat_reduction() -> None:
    """Flat shapes reduce the weighted sums to the closed (N+1)(2N+1)/6N
    coefficients of the flat oracle."""
    got = term_geometric_asian_price(
        100.0, 100.0, 1.0, 0.03, 0.01, 0.25, timesteps=12,
        vol_shape=(1.0,) * 12,
    )
    want = geometric_asian_price(100.0, 100.0, 1.0, 0.03, 0.01, 0.25, timesteps=12)
    assert float(got.put) == pytest.approx(float(want.put), rel=1e-10)
    assert float(got.call) == pytest.approx(float(want.call), rel=1e-10)


def test_barrier_term_oracle() -> None:
    """The density-propagation oracle with per-step transitions gates the
    curved knockout estimator (same discrete monitoring, zero slop)."""
    contract = make_contract()
    sim = make_simulation_params(
        **SIM_SHAPE, payoff="barrier_up_out", barrier_rel=1.4,
        normalization="none", term=CURVED,
    )
    oracle = discrete_barrier_price(
        contract.spot,
        contract.strike,
        contract.maturity,
        contract.rate,
        contract.div_yield,
        contract.vol,
        timesteps=T,
        barrier_rel=1.4,
        up=True,
        vol_shape=CURVED.vol_shape,
        rate_shape=CURVED.rate_shape,
    )
    for channel in ("put", "call"):
        mc, se = _mc_price(sim, contract, channel)
        want = float(getattr(oracle, channel))
        assert abs(mc - want) < 4.0 * max(se, 1e-6), (channel, mc, want, se)


def test_barrier_term_oracle_flat_reduction() -> None:
    got = discrete_barrier_price(
        100.0, 100.0, 1.0, 0.03, 0.01, 0.25, timesteps=4, barrier_rel=1.3, up=True,
        vol_shape=(1.0,) * 4, rate_shape=(1.0,) * 4,
    )
    want = discrete_barrier_price(
        100.0, 100.0, 1.0, 0.03, 0.01, 0.25, timesteps=4, barrier_rel=1.3, up=True,
    )
    assert float(got.put) == pytest.approx(float(want.put), rel=1e-12)
    assert float(got.call) == pytest.approx(float(want.call), rel=1e-12)


# --------------------------------------------------------------------------
# MEAN normalization targets under curves
# --------------------------------------------------------------------------


@pytest.mark.parametrize("payoff", ["terminal", "asian_arithmetic", "asian_geometric"])
def test_mean_target_matches_sample_mean(payoff: str) -> None:
    """expected_underlier_mean with a term structure must be the true mean of
    the simulated underlier (z-gate on 64k paths)."""
    contract = make_contract()
    arr = contract.as_array(jnp.float32)
    rows = simulate_underlier_rows(
        jax.random.PRNGKey(11),
        arr,
        timesteps=T,
        rows=256,
        cols=256,
        dtype=jnp.float32,
        scheme=make_simulation_params().scheme,
        payoff=PayoffKind(payoff),
        term=CURVED,
    )
    sample = np.asarray(rows, dtype=np.float64).reshape(-1)
    want = float(
        expected_underlier_mean(
            arr, timesteps=T, payoff=PayoffKind(payoff), dtype=jnp.float32, term=CURVED
        )
    )
    se = sample.std(ddof=1) / np.sqrt(sample.size)
    assert abs(sample.mean() - want) < 4.0 * se, (payoff, sample.mean(), want, se)


# --------------------------------------------------------------------------
# Engine routing + Greeks
# --------------------------------------------------------------------------


def test_term_routes_to_xla_engine() -> None:
    sim = make_simulation_params(**SIM_SHAPE, implementation="pallas", term=CURVED)
    assert resolve_implementation(sim) == SimImplementation.XLA
    flat = make_simulation_params(**SIM_SHAPE, implementation="pallas")
    # the routing is term-specific, not a blanket downgrade
    assert resolve_implementation(flat) in (
        SimImplementation.XLA,
        SimImplementation.PALLAS,
    )


def test_ipa_greeks_match_effective_black_autodiff() -> None:
    """Pathwise Greeks differentiate THROUGH the curves: d(price)/d(vol)
    picks up every step's vol·vs_t term. Oracle = autodiff of Black at the
    effective parameters (constants in the contract fields)."""
    contract = make_contract(strike=105.0)
    sim = make_simulation_params(**SIM_SHAPE, term=CURVED)
    mv, mr, mq = CURVED.effective_factors(T)

    def oracle_put(vec: jax.Array) -> jax.Array:
        return black_scholes_price(
            vec[0], vec[1], vec[2], vec[3] * mr, vec[4] * mq, vec[5] * mv
        ).put

    vec = contract.as_array(jnp.float64)
    want_price = float(oracle_put(vec))
    want_grad = np.asarray(jax.grad(oracle_put)(vec), dtype=np.float64)
    mc = mc_greeks(sim, contract, option=OptionSide.PUT)
    assert mc.engine == SimImplementation.XLA
    assert mc.price == pytest.approx(want_price, rel=0.02, abs=0.01)
    fields = ("spot", "strike", "maturity", "rate", "div_yield", "vol")
    for i, field in enumerate(fields):
        tol = max(0.04 * abs(want_grad[i]), 0.006)
        assert mc.by_field[field] == pytest.approx(want_grad[i], abs=tol), (
            field,
            mc.by_field[field],
            want_grad[i],
        )


# --------------------------------------------------------------------------
# Serialization + checkpoint
# --------------------------------------------------------------------------


def test_sim_params_proto_round_trip() -> None:
    sim = make_simulation_params(**SIM_SHAPE, term=CURVED)
    decoded = expect_success(sim_params_from_proto(sim_params_to_proto(sim)))
    assert decoded == sim
    assert decoded.term == CURVED
    # absent term stays None (pre-term checkpoints decode unchanged)
    bare = make_simulation_params(**SIM_SHAPE)
    assert expect_success(sim_params_from_proto(sim_params_to_proto(bare))).term is None
    # a present-but-all-flat term survives as present (it is config, not None)
    flat = make_simulation_params(**SIM_SHAPE, term=TermStructure(vol_shape=(1.0,) * T))
    round_tripped = expect_success(sim_params_from_proto(sim_params_to_proto(flat)))
    assert round_tripped.term == TermStructure(vol_shape=(1.0,) * T)


def test_trainer_term_snapshot_resume_bit_exact() -> None:
    """The flagship determinism contract holds with curves: train k, snapshot,
    train k more ≡ train 2k continuously, bit-exact; predict_price parity
    discounts at the curve-effective rate."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers.factories import CONTRACT_BOUNDS

    small_t = 4
    term = TermStructure(vol_shape=(1.4, 1.2, 1.0, 0.8), rate_shape=(2.0, 1.0, 0.5, 0.5))
    sim = make_simulation_params(
        timesteps=small_t, network_size=16, batches_per_mc_run=4, term=term
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)],
            seed=3,
            precision=sim.precision,
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)
    tc = expect_success(
        build_training_config(num_batches=2, batch_size=4, learning_rate=1e-3)
    )
    # continuous 4 batches
    p_cont = expect_success(GbmCVNNPricer.create(cfg))
    tc4 = expect_success(
        build_training_config(num_batches=4, batch_size=4, learning_rate=1e-3)
    )
    r_cont = expect_success(p_cont.train(tc4))
    # 2 + snapshot + 2
    p_a = expect_success(GbmCVNNPricer.create(cfg))
    expect_success(p_a.train(tc))
    snap = p_a.snapshot()
    assert snap.sim.term == term  # the curves are checkpointed
    p_b = expect_success(GbmCVNNPricer.create(snap))
    r_resumed = expect_success(p_b.train(tc))
    assert float(r_resumed.final_loss) == float(r_cont.final_loss)
    # predict: put finite, call = put + df_eff (E - K) finite
    pred = p_b.predict_price([make_contract(), make_contract(strike=90.0)])
    assert np.isfinite(pred.put).all() and np.isfinite(pred.call).all()


def test_effect_route_carries_term() -> None:
    """build_simulation_effects encodes the curves; the interpreter validates
    and reproduces the direct simulator's payoffs bit-for-bit."""
    import asyncio

    from spectralmc_tpu.effects.interpreter import SpectralMCInterpreter
    from spectralmc_tpu.training.effects_builders import build_simulation_effects

    contract = make_contract()
    sim = make_simulation_params(**SIM_SHAPE, term=CURVED)
    seq = build_simulation_effects(sim, contract, out_id="p")
    sim_effect = seq.effects[0]
    assert sim_effect.term_vol == CURVED.vol_shape
    assert sim_effect.term_rate == CURVED.rate_shape
    interp = SpectralMCInterpreter.create()
    expect_success(asyncio.run(interp.interpret_sequence(seq)))
    payoffs = np.asarray(expect_success(interp.registry.get_array("p")))
    direct, _ = BlackScholes(sim).price(contract)
    assert np.array_equal(payoffs, np.asarray(direct.put_payoffs))


def test_qmc_term_composes() -> None:
    """sampling=sobol_bb under curves: the bridge emits standard increments
    that the per-step coefficients scale, so the RQMC estimator converges to
    the same effective-Black price — tight gate at a modest path budget
    (the QMC error at 64k paths is far below the pseudo-MC SE)."""
    contract = make_contract(strike=105.0)
    sim = make_simulation_params(
        **SIM_SHAPE, term=CURVED, sampling="sobol_bb"
    )
    mc, _ = _mc_price(sim, contract, "put")
    want = float(
        term_effective_black(
            contract.spot, contract.strike, contract.maturity,
            contract.rate, contract.div_yield, contract.vol,
            vol_shape=CURVED.vol_shape, rate_shape=CURVED.rate_shape, div_shape=(),
        ).put
    )
    assert abs(mc - want) / want < 2e-3, (mc, want)


def test_predict_greeks_term_parity_and_finiteness() -> None:
    """predict_greeks on a curved-market pricer: finite Jacobians, put channel
    equal to predict_price, and the call-put rate sensitivity reflecting the
    curve-effective discount d(df)/dr = -mr*T*df."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers.factories import CONTRACT_BOUNDS

    term = TermStructure(vol_shape=(1.3, 0.7), rate_shape=(1.6, 0.4))
    sim = make_simulation_params(
        timesteps=2, network_size=16, batches_per_mc_run=4, term=term
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)],
            seed=3,
            precision=sim.precision,
        )
    )
    p = expect_success(
        GbmCVNNPricer.create(GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn))
    )
    expect_success(
        p.train(expect_success(build_training_config(num_batches=2, batch_size=4, learning_rate=1e-3)))
    )
    contracts = [make_contract(), make_contract(strike=95.0)]
    g = p.predict_greeks(contracts)
    prices = p.predict_price(contracts)
    np.testing.assert_allclose(g.put, prices.put, rtol=1e-5, atol=1e-6)
    assert np.isfinite(g.put_jacobian).all() and np.isfinite(g.call_jacobian).all()
    # call − put = df_eff·(E[S_T] − K): its rate sensitivity carries the
    # factor mr through BOTH df and the forward — check the parity-term
    # rate-column difference against the analytic derivative
    mv2, mr, mq = term.effective_factors(2)
    arr = np.array([[c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol]
                    for c in contracts])
    s0, k, t_m, r, q = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
    df = np.exp(-r * mr * t_m)
    fwd = s0 * np.exp((r * mr - q * mq) * t_m)
    # d/dr [df*(F−K)] = −mr·T·df·(F−K) + df·(mr·T·F)
    want = -mr * t_m * df * (fwd - k) + df * mr * t_m * fwd
    got = g.call_jacobian[:, 3] - g.put_jacobian[:, 3]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Bucketed curve Greeks (vega/rho ladders)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("payoff", ["terminal", "asian_geometric"])
def test_bucket_ladders_euler_homogeneity(payoff: str) -> None:
    """Σ_t bucket_t · shape_t must equal scalar·(scalar greek) on the SAME
    draw — price depends on vol only through vol·vol_shape[t], so the
    identity is exact math, not statistics."""
    from spectralmc_tpu.ops.greeks import OptionSide, mc_greeks, term_bucket_greeks

    contract = make_contract(strike=104.0)
    sim = make_simulation_params(**SIM_SHAPE, payoff=payoff, term=CURVED)
    ladders = term_bucket_greeks(sim, contract, option=OptionSide.PUT)
    scalar = mc_greeks(sim, contract, option=OptionSide.PUT)
    assert ladders.price == pytest.approx(scalar.price, rel=1e-5)
    vs, rs, qs = CURVED.shapes(T)
    lhs_v = sum(b * s for b, s in zip(ladders.vega_buckets, vs))
    lhs_r = sum(b * s for b, s in zip(ladders.rho_buckets, rs))
    lhs_q = sum(b * s for b, s in zip(ladders.div_buckets, qs))
    assert lhs_v == pytest.approx(contract.vol * scalar.vega, rel=2e-3, abs=1e-4)
    assert lhs_r == pytest.approx(contract.rate * scalar.rho, rel=2e-3, abs=1e-4)
    assert lhs_q == pytest.approx(
        contract.div_yield * scalar.div_rho, rel=2e-3, abs=1e-4
    )


def test_bucket_ladders_match_effective_black_autodiff() -> None:
    """TERMINAL ladders vs autodiff of Black at the effective parameters —
    the exact curve-gradient of the zero-bias oracle."""
    from spectralmc_tpu.ops.greeks import OptionSide, term_bucket_greeks

    contract = make_contract(strike=104.0)
    sim = make_simulation_params(**SIM_SHAPE, term=CURVED)
    ladders = term_bucket_greeks(sim, contract, option=OptionSide.PUT)
    vs, rs, qs = (jnp.asarray(s, jnp.float64) for s in CURVED.shapes(T))

    def oracle_put(sh):
        vsa, rsa, qsa = sh
        vol_eff = contract.vol * jnp.sqrt(jnp.mean(vsa**2))
        r_eff = contract.rate * jnp.mean(rsa)
        q_eff = contract.div_yield * jnp.mean(qsa)
        return black_scholes_price(
            contract.spot, contract.strike, contract.maturity, r_eff, q_eff, vol_eff
        ).put

    want_v, want_r, want_q = jax.grad(oracle_put)((vs, rs, qs))
    for got, want in (
        (ladders.vega_buckets, want_v),
        (ladders.rho_buckets, want_r),
    ):
        for g, w in zip(got, np.asarray(want)):
            assert g == pytest.approx(float(w), rel=0.05, abs=0.02), (got, want)


def test_bucket_ladders_refusals() -> None:
    from spectralmc_tpu.ops.greeks import OptionSide, term_bucket_greeks

    contract = make_contract()
    with pytest.raises(ValueError, match="needs sim.term"):
        term_bucket_greeks(make_simulation_params(**SIM_SHAPE), contract)
    with pytest.raises(ValueError, match="bump_greeks"):
        term_bucket_greeks(
            make_simulation_params(
                **SIM_SHAPE, payoff="barrier_up_out", barrier_rel=1.4,
                normalization="none", term=CURVED,
            ),
            contract,
        )
    with pytest.raises(ValueError, match="bump the scalar fields"):
        term_bucket_greeks(
            make_simulation_params(
                **SIM_SHAPE, payoff="american_put", normalization="none", term=CURVED,
            ),
            contract,
            option=OptionSide.PUT,
        )


# --------------------------------------------------------------------------
# American exercise under curves (LSMC with per-segment discounting)
# --------------------------------------------------------------------------


def test_grid_oracle_cross_validates_tree_flat() -> None:
    """bermudan_grid_price (the lattice that handles curves) must agree with
    the CRR tree at flat parameters — the oracle's own gate."""
    from spectralmc_tpu.ops.american import bermudan_grid_price, bermudan_tree_price

    kw = dict(spot=100.0, strike=105.0, maturity=1.0, rate=0.05, div_yield=0.01, vol=0.25)
    for every, ts in ((1, 16), (4, 16)):
        g = bermudan_grid_price(timesteps=ts, exercise_every=every, **kw)
        t = bermudan_tree_price(exercise_dates=ts // every, **kw)
        assert g == pytest.approx(t, rel=2e-4), (ts, every, g, t)


def test_american_flat_term_bit_identical() -> None:
    from spectralmc_tpu.ops.american import simulate_american_underlier_rows
    from spectralmc_tpu.ops.greeks import OptionSide

    arr = make_contract().as_array(jnp.float32)
    kw = dict(
        timesteps=T, rows=64, cols=128, dtype=jnp.float32, option=OptionSide.PUT
    )
    base = simulate_american_underlier_rows(jax.random.PRNGKey(5), arr, **kw)
    flat = simulate_american_underlier_rows(
        jax.random.PRNGKey(5), arr,
        term=TermStructure(vol_shape=(1.0,) * T, rate_shape=(1.0,) * T), **kw,
    )
    assert np.array_equal(np.asarray(base), np.asarray(flat))


def test_american_term_matches_grid_oracle() -> None:
    """Curved-market Bermudan put through the full family pipeline (forward
    curves + per-segment discounted LSMC + synthetic-underlier encode/decode)
    vs the lattice oracle."""
    from spectralmc_tpu.ops.american import bermudan_grid_price

    contract = make_contract(strike=105.0, rate=0.05)
    sim = make_simulation_params(
        timesteps=T, network_size=256, batches_per_mc_run=256,
        payoff="american_put", normalization="none", term=CURVED,
    )
    mc, se = _mc_price(sim, contract, "put")
    want = bermudan_grid_price(
        spot=contract.spot, strike=contract.strike, maturity=contract.maturity,
        rate=contract.rate, div_yield=contract.div_yield, vol=contract.vol,
        timesteps=T, vol_shape=CURVED.vol_shape, rate_shape=CURVED.rate_shape,
    )
    tol = max(4.0 * se, 0.01 * want)
    assert abs(mc - want) < tol, (mc, want, se)
    # and the curves genuinely change the exercise problem
    from spectralmc_tpu.ops.american import bermudan_tree_price

    flat = bermudan_tree_price(
        spot=contract.spot, strike=contract.strike, maturity=contract.maturity,
        rate=contract.rate, div_yield=contract.div_yield, vol=contract.vol,
        exercise_dates=T,
    )
    assert abs(want - flat) > 0.05


def test_american_term_sparse_monitor_grid() -> None:
    from spectralmc_tpu.ops.american import bermudan_grid_price

    contract = make_contract(strike=105.0, rate=0.05)
    sim = make_simulation_params(
        timesteps=T, network_size=256, batches_per_mc_run=256,
        payoff="american_put", normalization="none", term=CURVED,
        lsmc_exercise_every=4,
    )
    mc, se = _mc_price(sim, contract, "put")
    want = bermudan_grid_price(
        spot=contract.spot, strike=contract.strike, maturity=contract.maturity,
        rate=contract.rate, div_yield=contract.div_yield, vol=contract.vol,
        timesteps=T, exercise_every=4,
        vol_shape=CURVED.vol_shape, rate_shape=CURVED.rate_shape,
    )
    assert abs(mc - want) < max(4.0 * se, 0.01 * want), (mc, want, se)


def test_american_term_no_premium_identity() -> None:
    """q = 0 American call under curves carries no early-exercise premium:
    the family price must equal the European effective-Black call."""
    contract = make_contract(strike=102.0, div_yield=0.0)
    term = TermStructure(vol_shape=CURVED.vol_shape, rate_shape=CURVED.rate_shape)
    sim = make_simulation_params(
        timesteps=T, network_size=256, batches_per_mc_run=256,
        payoff="american_call", normalization="none", term=term,
    )
    # AMERICAN_CALL encodes through the put channel (PayoffKind docstring)
    mc, se = _mc_price(sim, contract, "put")
    want = float(
        term_effective_black(
            contract.spot, contract.strike, contract.maturity,
            contract.rate, contract.div_yield, contract.vol,
            vol_shape=term.vol_shape, rate_shape=term.rate_shape, div_shape=(),
        ).call
    )
    assert abs(mc - want) < max(4.0 * se, 0.012 * want), (mc, want, se)


def test_american_term_trainer_resume_bit_exact() -> None:
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers.factories import CONTRACT_BOUNDS

    term = TermStructure(vol_shape=(1.4, 1.2, 1.0, 0.8), rate_shape=(2.0, 1.0, 0.5, 0.5))
    sim = make_simulation_params(
        timesteps=4, network_size=16, batches_per_mc_run=8,
        payoff="american_put", normalization="none", term=term,
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)],
            seed=3,
            precision=sim.precision,
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)
    tc = expect_success(
        build_training_config(num_batches=2, batch_size=4, learning_rate=1e-3)
    )
    p = expect_success(GbmCVNNPricer.create(cfg))
    expect_success(p.train(tc))
    snap = p.snapshot()
    assert snap.sim.term == term
    a = expect_success(GbmCVNNPricer.create(snap))
    b = expect_success(GbmCVNNPricer.create(snap))
    ra = expect_success(a.train(tc))
    rb = expect_success(b.train(tc))
    assert float(ra.final_loss) == float(rb.final_loss)
    pred = a.predict_price([make_contract()])
    assert np.isfinite(pred.put).all()


def test_sharded_term_training_matches_single_device() -> None:
    """Curved-market training under the (batch, paths) mesh matches the
    single-device run — the per-step coefficient arrays are row-independent,
    so shard-stability is inherited from the normals keying."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.parallel.mesh import build_mesh_spec
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers.factories import CONTRACT_BOUNDS

    term = TermStructure(vol_shape=(1.3, 0.7), rate_shape=(1.5, 0.5))
    sim = make_simulation_params(
        timesteps=2, network_size=16, batches_per_mc_run=8, term=term
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)],
            seed=5,
            precision=sim.precision,
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=CONTRACT_BOUNDS, cvnn=cvnn)
    tc = expect_success(
        build_training_config(num_batches=4, batch_size=8, learning_rate=2e-3)
    )
    spec = expect_success(build_mesh_spec(batch_shards=2, paths_shards=4))
    single = expect_success(GbmCVNNPricer.create(cfg))
    sharded = expect_success(GbmCVNNPricer.create(cfg, mesh_spec=spec))
    r1 = expect_success(single.train(tc))
    r2 = expect_success(sharded.train(tc))
    np.testing.assert_allclose(r2.losses, r1.losses, rtol=2e-4)


def test_bootstrap_vol_shape_reproduces_quotes_exactly() -> None:
    """The piecewise-flat forward-variance strip must hit every quote: the
    RMS of the shape over the first k_i steps times the reference vol IS
    the quoted implied vol (to fp rounding)."""
    from spectralmc_tpu.ops.gbm import bootstrap_vol_shape

    ref = 0.25
    quotes = ((2, 0.32), (5, 0.27), (8, 0.24))
    shape = expect_success(bootstrap_vol_shape(quotes, timesteps=8, reference_vol=ref))
    assert len(shape) == 8
    for k, sigma in quotes:
        rms = ref * np.sqrt(np.mean(np.square(shape[:k])))
        assert rms == pytest.approx(sigma, rel=1e-12), (k, rms, sigma)
    # last expiry == timesteps: the full-maturity effective vol is the last
    # quote, so the term oracle collapses to flat Black at sigma_last
    got = term_effective_black(
        100.0, 100.0, 1.0, 0.03, 0.01, ref, vol_shape=shape, rate_shape=(), div_shape=()
    )
    want = black_scholes_price(100.0, 100.0, 1.0, 0.03, 0.01, 0.24)
    assert float(got.put) == pytest.approx(float(want.put), rel=1e-9)


def test_bootstrap_vol_shape_extends_flat_and_validates() -> None:
    from spectralmc_tpu.ops.gbm import bootstrap_vol_shape

    shape = expect_success(
        bootstrap_vol_shape(((4, 0.3),), timesteps=8, reference_vol=0.3)
    )
    # one quote at the reference vol -> flat ones (to fp rounding)
    assert shape == pytest.approx((1.0,) * 8, rel=1e-12)
    # calendar arbitrage: total variance falls between expiries
    err = expect_failure(
        bootstrap_vol_shape(((2, 0.40), (4, 0.20)), timesteps=8, reference_vol=0.3)
    )
    assert "calendar arbitrage" in err.reason
    assert isinstance(
        expect_failure(
            bootstrap_vol_shape(((4, 0.3), (2, 0.3)), timesteps=8, reference_vol=0.3)
        ),
        InvalidSimulationParams,
    )
    expect_failure(bootstrap_vol_shape((), timesteps=8, reference_vol=0.3))
    expect_failure(bootstrap_vol_shape(((9, 0.3),), timesteps=8, reference_vol=0.3))
    expect_failure(bootstrap_vol_shape(((4, -0.1),), timesteps=8, reference_vol=0.3))
    expect_failure(bootstrap_vol_shape(((4, 0.3),), timesteps=8, reference_vol=0.0))


def test_effect_route_rejects_bad_term() -> None:
    import asyncio

    from spectralmc_tpu.effects.interpreter import SpectralMCInterpreter
    from spectralmc_tpu.effects.types import SimulatePaths
    from spectralmc_tpu.core.result import Failure

    effect = SimulatePaths(
        spot=100.0, strike=100.0, maturity=1.0, rate=0.03, div_yield=0.01,
        vol=0.25, timesteps=4, batches=4, network_size=16, seed=1,
        term_vol=(1.0, 1.0),  # wrong length
        out_id="x",
    )
    interp = SpectralMCInterpreter.create()
    result = asyncio.run(interp.interpret(effect))
    assert isinstance(result, Failure)
    assert "length" in result.error.reason
