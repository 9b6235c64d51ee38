"""American/Bermudan pricing via Longstaff–Schwartz (extension).

Oracles: a Bermudan-aware CRR tree restricted to the SAME exercise grid
(sharp — no continuous-exercise slop), and the exact no-early-exercise
identities (r=0 puts, q=0 calls equal their European counterparts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.ops.american import (
    bermudan_tree_price,
    lsmc_cashflows,
    lsmc_price,
    split_fit_mask,
)
from spectralmc_tpu.ops.analytic import black_scholes_price
from spectralmc_tpu.ops.greeks import OptionSide
from tests.helpers.factories import make_contract

PATHS = 65536


def test_american_put_matches_bermudan_tree() -> None:
    """Deep ITM-prone put (high strike): LSMC vs the same-grid tree."""
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    n = 16
    result = lsmc_price(
        jax.random.PRNGKey(7), c, timesteps=n, paths=PATHS, option=OptionSide.PUT
    )
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
    )
    # LSMC carries a small regression bias beyond the MC error; gate at
    # max(4 SE, 0.5% of price)
    tol = max(4.0 * result.std_error, 0.005 * tree)
    assert result.price == pytest.approx(tree, abs=tol), (
        f"lsmc={result.price} tree={tree} se={result.std_error}"
    )


def test_early_exercise_premium_positive_and_ordered() -> None:
    """American >= European on the same paths; the premium grows with the
    interest rate (the put's early-exercise driver)."""
    premiums = []
    for rate in (0.02, 0.08):
        c = make_contract(strike=105.0, rate=rate, div_yield=0.0)
        r = lsmc_price(jax.random.PRNGKey(3), c, timesteps=16, paths=PATHS)
        assert r.price >= r.european - 4.0 * r.std_error
        premiums.append(r.price - r.european)
    assert premiums[1] > premiums[0] > 0.0, premiums


def test_r_zero_put_equals_european() -> None:
    """r = 0: early exercise of a put is never optimal, so the Bermudan
    price equals the European (Black) price."""
    c = make_contract(rate=0.0, div_yield=0.0)
    r = lsmc_price(jax.random.PRNGKey(11), c, timesteps=12, paths=PATHS)
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).put
    )
    assert r.price == pytest.approx(bs, abs=max(4.0 * r.std_error, 0.005 * bs))
    # the estimated premium itself is ~zero
    assert abs(r.price - r.european) < max(4.0 * r.std_error, 0.005 * bs)


def test_q_zero_call_equals_european() -> None:
    """q = 0: an American call is never exercised early (Merton)."""
    c = make_contract(rate=0.05, div_yield=0.0)
    r = lsmc_price(
        jax.random.PRNGKey(13), c, timesteps=12, paths=PATHS, option=OptionSide.CALL
    )
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).call
    )
    assert r.price == pytest.approx(bs, abs=max(4.0 * r.std_error, 0.005 * bs))


def test_dividend_call_has_premium() -> None:
    """With a fat dividend yield the American call IS worth more."""
    c = make_contract(strike=95.0, rate=0.02, div_yield=0.08, maturity=2.0)
    r = lsmc_price(
        jax.random.PRNGKey(17), c, timesteps=16, paths=PATHS, option=OptionSide.CALL
    )
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=16, option="call",
    )
    assert r.price - r.european > 2.0 * r.std_error  # real premium
    tol = max(4.0 * r.std_error, 0.005 * tree)
    assert r.price == pytest.approx(tree, abs=tol)


def test_cashflows_deterministic_and_bounded() -> None:
    c = make_contract(strike=105.0)
    arr = c.as_array(jnp.float32)
    kwargs = dict(timesteps=8, paths=4096, dtype=jnp.float32, option=OptionSide.PUT)
    a, term_a = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    b, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0.0).all()
    assert a.max() <= c.strike  # a put never pays more than K
    assert np.asarray(term_a).shape == (4096,)


def test_split_sample_brackets_tree_at_small_budget() -> None:
    """The split-sample estimator turns LSMC look-ahead bias into a bracket:
    the fit half's classic (in-sample) mean is HIGH-biased, the out-of-sample
    half's mean is a true lower bound. At a deliberately small per-draw path
    budget (2,048 — where the quality lab measured ~+1.9% look-ahead bias,
    docs/performance.md) the gap is visible above MC noise and the CRR-tree
    oracle must fall inside the bracket."""
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    n = 8
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
    )
    oos, ins, ses = [], [], []
    for seed in range(12):
        r = lsmc_price(
            jax.random.PRNGKey(100 + seed), c, timesteps=n, paths=2048,
            split_sample=True,
        )
        oos.append(r.price)
        ins.append(r.in_sample_price)
        ses.append(r.std_error)
    mean_oos, mean_ins = float(np.mean(oos)), float(np.mean(ins))
    se_mean = float(np.mean(ses)) / np.sqrt(len(oos))
    # the look-ahead gap is positive and the oracle sits inside the bracket
    assert mean_ins - mean_oos > 2.0 * se_mean, (mean_ins, mean_oos, se_mean)
    assert mean_oos - 4.0 * se_mean <= tree <= mean_ins + 4.0 * se_mean, (
        mean_oos, tree, mean_ins, se_mean,
    )


def test_split_sample_converges_to_tree_at_production_budget() -> None:
    """At a production path budget both bracket legs collapse onto the tree:
    the out-of-sample price passes the same oracle gate as the classic
    estimator (its SE reflects the halved pricing sample)."""
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    n = 16
    r = lsmc_price(
        jax.random.PRNGKey(7), c, timesteps=n, paths=PATHS, split_sample=True
    )
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
    )
    tol = max(4.0 * r.std_error, 0.005 * tree)
    assert r.price == pytest.approx(tree, abs=tol), (r.price, tree, r.std_error)
    assert r.in_sample_price == pytest.approx(tree, abs=tol)
    # control variate still engages on the out-of-sample half
    assert r.cv_std_error < r.std_error
    assert np.isfinite(r.cv_price)


def test_split_sample_mechanics() -> None:
    """Mask definition, determinism, and that the split policy really is a
    different estimator from the classic one (while the classic path stays
    bit-identical to a fit_mask-free backward by construction)."""
    mask = np.asarray(split_fit_mask(8, dtype=jnp.float32))
    np.testing.assert_array_equal(mask, [1, 0, 1, 0, 1, 0, 1, 0])
    c = make_contract(strike=105.0)
    arr = c.as_array(jnp.float32)
    kwargs = dict(timesteps=8, paths=4096, dtype=jnp.float32, option=OptionSide.PUT)
    a, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, split_sample=True, **kwargs)
    b, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, split_sample=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    classic, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    # same paths, different regression sample -> some exercise decisions flip
    assert (np.asarray(a) != np.asarray(classic)).any()
    assert (np.asarray(a) >= 0.0).all()
    assert float(np.asarray(a).max()) <= c.strike


def test_cross_fit_midpoint_beats_classic_bias_at_small_budget() -> None:
    """The bracket-midpoint cross-fitted estimator cancels most of the LSMC
    target bias at a small path budget: averaged over three band contracts
    (the quality gate's domain; 16 dates × 2,048 paths, where the lab
    measured the classic in-sample policy ~+1–1.9% high), the midpoint's
    mean relative bias vs the CRR tree must be strictly smaller in magnitude
    than the classic estimator's on the SAME keys. Deep-ITM and deep-OTM
    strikes were tried and rejected: the former's regression is
    near-degenerate (bias under MC noise), the latter's tiny price inflates
    relative noise past the effect. Fixed seeds make this deterministic; the
    thresholds carry ~3x margin over the pinned values (classic +0.99%,
    midpoint −0.10% mean over these cells/keys on CPU)."""
    cases = [
        dict(spot=100.0, strike=100.0, vol=0.25, rate=0.03, div_yield=0.01),
        dict(spot=95.0, strike=105.0, vol=0.30, rate=0.05, div_yield=0.0, maturity=1.5),
        dict(spot=100.0, strike=103.0, vol=0.22, rate=0.04, div_yield=0.02),
    ]
    n = 16
    rel_c, rel_x = [], []
    for kw in cases:
        c = make_contract(**kw)
        tree = bermudan_tree_price(
            spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
            div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
        )
        xfit, classic = [], []
        for seed in range(16):
            key = jax.random.PRNGKey(300 + seed)
            xfit.append(
                lsmc_price(key, c, timesteps=n, paths=2048, cross_fit=True).price
            )
            classic.append(lsmc_price(key, c, timesteps=n, paths=2048).price)
        rel_c.append((float(np.mean(classic)) - tree) / tree)
        rel_x.append((float(np.mean(xfit)) - tree) / tree)
    bias_c, bias_x = float(np.mean(rel_c)), float(np.mean(rel_x))
    assert bias_c > 0.003, (bias_c, rel_c)  # classic look-ahead bias visible
    assert abs(bias_x) < 0.6 * bias_c, (bias_x, bias_c, rel_x)


def test_cross_fit_mechanics_and_exclusivity() -> None:
    """Determinism, boundedness, a genuinely different policy from the
    classic estimator, and the fit_mask/cross_fit_mask exclusivity guard."""
    from spectralmc_tpu.ops.american import cross_fit_col_mask

    mask = np.asarray(cross_fit_col_mask(6, dtype=jnp.float32))
    np.testing.assert_array_equal(mask, [1, 0, 1, 0, 1, 0])
    c = make_contract(strike=105.0)
    arr = c.as_array(jnp.float32)
    kwargs = dict(timesteps=8, paths=4096, dtype=jnp.float32, option=OptionSide.PUT)
    a, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, cross_fit=True, **kwargs)
    b, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, cross_fit=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    classic, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    assert (np.asarray(a) != np.asarray(classic)).any()
    assert (np.asarray(a) >= 0.0).all()
    assert float(np.asarray(a).max()) <= c.strike
    with pytest.raises(ValueError, match="mutually exclusive"):
        lsmc_cashflows(
            jax.random.PRNGKey(1), arr, cross_fit=True, split_sample=True, **kwargs
        )


def test_cross_fit_converges_to_tree_at_production_budget() -> None:
    """At a production path budget the cross-fitted price passes the same
    oracle gate as the classic estimator, at FULL-sample standard error."""
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    n = 16
    r = lsmc_price(jax.random.PRNGKey(7), c, timesteps=n, paths=PATHS, cross_fit=True)
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
    )
    tol = max(4.0 * r.std_error, 0.005 * tree)
    assert r.price == pytest.approx(tree, abs=tol), (r.price, tree, r.std_error)
    assert r.cv_std_error < r.std_error  # control variate still engages


def test_lsmc_cross_fit_config_gates_and_roundtrip() -> None:
    """SimulationParams.lsmc_cross_fit: build-time validation (American-only,
    needs >= 2 columns), the simulator actually changes its encode, and the
    proto checkpoint round-trips the flag (absent decodes False)."""
    from spectralmc_tpu.ops.gbm import build_simulation_params
    from spectralmc_tpu.serialization.converters import (
        sim_params_from_proto,
        sim_params_to_proto,
    )
    from tests.helpers import expect_failure, expect_success

    base = dict(
        timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=7,
        payoff="american_put", normalization="none",
    )
    sim = expect_success(build_simulation_params(**base, lsmc_cross_fit=True))
    back = expect_success(sim_params_from_proto(sim_params_to_proto(sim)))
    assert back == sim and back.lsmc_cross_fit
    # absent on the wire decodes to the classic policy
    plain = expect_success(build_simulation_params(**base))
    assert not expect_success(
        sim_params_from_proto(sim_params_to_proto(plain))
    ).lsmc_cross_fit
    # and the default-False encode is byte-identical to pre-round-5 blobs
    assert b"\xb8\x01\x01" not in sim_params_to_proto(plain).SerializeToString()
    err = expect_failure(
        build_simulation_params(
            timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=7,
            lsmc_cross_fit=True,
        )
    )
    assert "no LSMC regression" in err.reason
    # the flag reaches the dispatch-built simulator: encodes differ
    from spectralmc_tpu.ops.dispatch import make_underlier_simulator

    key = jax.random.PRNGKey(3)
    arr = make_contract(strike=110.0).as_array(jnp.float32)
    rows_classic = make_underlier_simulator(plain, rows=8)(key, arr)
    rows_xfit = make_underlier_simulator(sim, rows=8)(key, arr)
    assert (np.asarray(rows_classic) != np.asarray(rows_xfit)).any()


def test_tree_oracle_converges_to_black_for_european_grid() -> None:
    """exercise_dates=1 makes the tree European; it must hit Black."""
    c = make_contract()
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=1, tree_steps=4000,
        option="put",
    )
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).put
    )
    assert tree == pytest.approx(bs, rel=2e-3)


def test_more_exercise_dates_never_cheapen() -> None:
    """Bermudan value is monotone in exercise opportunities (tree oracle)."""
    c = make_contract(strike=110.0, rate=0.05, div_yield=0.0)
    values = [
        bermudan_tree_price(
            spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
            div_yield=c.div_yield, vol=c.vol, exercise_dates=k, option="put",
        )
        for k in (1, 4, 16)
    ]
    assert values[0] <= values[1] <= values[2]


# --------------------------------------------------------------------------
# Round 3: American as a first-class (trainable, servable) family
# --------------------------------------------------------------------------


def _family_sim(payoff, **kwargs):
    from spectralmc_tpu.ops.gbm import ForwardNormalization, build_simulation_params

    defaults = dict(
        timesteps=16, network_size=256, batches_per_mc_run=256, mc_seed=3,
        payoff=payoff, normalization=ForwardNormalization.NONE,
    )
    defaults.update(kwargs)
    return build_simulation_params(**defaults)


@pytest.mark.parametrize(
    "payoff_name,option,contract_kwargs",
    [
        ("american_put", "put", dict(spot=100.0, strike=105.0, rate=0.05, div_yield=0.0)),
        ("american_call", "call", dict(spot=100.0, strike=95.0, rate=0.03, div_yield=0.06)),
    ],
)
def test_family_underlier_encoding_prices_to_tree(payoff_name, option, contract_kwargs) -> None:
    """The synthetic underlier u = K − cf/df through the STANDARD payoff
    pipeline (BlackScholes.price_to_host) reproduces the Bermudan tree price
    for both option sides — the put channel carries the configured side."""
    from spectralmc_tpu.ops.gbm import BlackScholes, PayoffKind

    from tests.helpers import expect_success

    sim = expect_success(_family_sim(PayoffKind(payoff_name)))
    c = make_contract(vol=0.25, maturity=1.0, **contract_kwargs)
    prices, _ = BlackScholes(sim).price_to_host(c)
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=16, option=option,
    )
    se_proxy = 0.01 * tree  # 65k paths: MC SE well under 1% for these scales
    assert prices.put == pytest.approx(tree, abs=max(3.0 * se_proxy, 0.01 * tree)), (
        f"family={prices.put} tree={tree}"
    )
    # the other vanilla channel is exactly zero by the encoding
    assert prices.call == 0.0


def test_family_simulator_row_offset_shard_stability() -> None:
    """A 'shard' owning rows [4, 8) with the psum-free path must reproduce
    the full run's rows exactly ONLY when the regression sees the same
    paths — which is what axis_name psum provides; without it the policies
    differ. Verify the keying does its part: forward paths (pre-regression)
    are row-stable by comparing two full runs."""
    from spectralmc_tpu.ops.american import simulate_american_underlier_rows

    c = make_contract(strike=105.0)
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=4, cols=64, dtype=jnp.float32, option=OptionSide.PUT)
    full = np.asarray(
        simulate_american_underlier_rows(jax.random.PRNGKey(2), arr, rows=8, **kw)
    )
    again = np.asarray(
        simulate_american_underlier_rows(jax.random.PRNGKey(2), arr, rows=8, **kw)
    )
    np.testing.assert_array_equal(full, again)  # deterministic
    assert np.isfinite(full).all()


def test_family_antithetic_runs_and_reduces_variance() -> None:
    from spectralmc_tpu.ops.american import simulate_american_underlier_rows

    c = make_contract(strike=105.0, rate=0.05, div_yield=0.0)
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=8, rows=64, cols=256, dtype=jnp.float32, option=OptionSide.PUT)
    plain = np.asarray(
        simulate_american_underlier_rows(jax.random.PRNGKey(5), arr, **kw)
    )
    anti = np.asarray(
        simulate_american_underlier_rows(
            jax.random.PRNGKey(5), arr, antithetic_half=32, **kw
        )
    )
    assert np.isfinite(anti).all()
    # pairing: cashflow row-means of mirrored halves are correlated; the
    # estimator's row-mean variance should not blow up
    assert np.var(anti.mean(axis=1)) <= 4.0 * np.var(plain.mean(axis=1))


def test_american_validation_gates() -> None:
    from spectralmc_tpu.core.result import Failure
    from spectralmc_tpu.ops.gbm import (
        ForwardNormalization,
        ModelKind,
        PathScheme,
        PayoffKind,
        build_simulation_params,
    )

    base = dict(
        timesteps=4, network_size=16, batches_per_mc_run=4, mc_seed=1,
        payoff=PayoffKind.AMERICAN_PUT, normalization=ForwardNormalization.NONE,
    )
    assert not isinstance(build_simulation_params(**base), Failure)
    # Heston dynamics supported (round 3b: variance-augmented LSMC basis)
    assert not isinstance(
        build_simulation_params(**{**base, "model": ModelKind.HESTON}), Failure
    )
    # Euler scheme rejected
    assert isinstance(
        build_simulation_params(**{**base, "scheme": PathScheme.EULER}), Failure
    )
    # basis degree bounds
    assert isinstance(
        build_simulation_params(**{**base, "lsmc_basis_degree": 0}), Failure
    )
    assert isinstance(
        build_simulation_params(**{**base, "lsmc_basis_degree": 9}), Failure
    )
    # a single monitor date is European, not Bermudan
    assert isinstance(build_simulation_params(**{**base, "timesteps": 1}), Failure)
    # MEAN normalization has no closed-form target
    assert isinstance(
        build_simulation_params(
            **{**base, "normalization": ForwardNormalization.MEAN}
        ),
        Failure,
    )


def test_american_resolves_to_xla_engine() -> None:
    from spectralmc_tpu.ops.gbm import (
        PayoffKind,
        SimImplementation,
        resolve_implementation,
    )
    from tests.helpers import expect_success

    sim = expect_success(
        _family_sim(PayoffKind.AMERICAN_PUT, implementation=SimImplementation.PALLAS)
    )
    assert resolve_implementation(sim) == SimImplementation.XLA


def _train_family_pricer(payoff, num_batches=40, seed=5):
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.ops.sobol import BoundSpec
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers import expect_success

    bounds = {
        "spot": BoundSpec(lower=95.0, upper=105.0),
        "strike": BoundSpec(lower=95.0, upper=105.0),
        "maturity": BoundSpec(lower=0.5, upper=1.5),
        "rate": BoundSpec(lower=0.01, upper=0.05),
        "div_yield": BoundSpec(lower=0.0, upper=0.02),
        "vol": BoundSpec(lower=0.2, upper=0.3),
    }
    sim = expect_success(
        _family_sim(payoff, timesteps=8, network_size=32, batches_per_mc_run=32)
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=48, activation=Activation.MODRELU)], seed=seed
        )
    )
    cfg = GbmCVNNPricerConfig(sim=sim, bounds=bounds, cvnn=cvnn, normalize_inputs=True)
    pricer = expect_success(GbmCVNNPricer.create(cfg))
    tc = expect_success(
        build_training_config(num_batches=num_batches, batch_size=16, learning_rate=2e-3)
    )
    result = expect_success(pricer.train(tc))
    return pricer, result


def test_american_family_trains_and_predicts_put_channel() -> None:
    """AMERICAN_PUT: training loss decreases and predict_price returns the
    learned American put with a NaN call (no parity under early exercise)."""
    pricer, result = _train_family_pricer(
        __import__("spectralmc_tpu.ops.gbm", fromlist=["PayoffKind"]).PayoffKind.AMERICAN_PUT
    )
    head = float(np.mean(result.losses[:8]))
    tail = float(np.mean(result.losses[-8:]))
    assert tail < head, (head, tail)
    pred = pricer.predict_price([make_contract(strike=100.0)])
    assert np.isfinite(pred.put).all()
    assert np.isnan(pred.call).all()


def test_american_call_channel_mapping() -> None:
    """AMERICAN_CALL: the learned channel lands in ``call``; put is NaN —
    in predict_price AND predict_greeks."""
    from spectralmc_tpu.ops.gbm import PayoffKind

    pricer, _ = _train_family_pricer(PayoffKind.AMERICAN_CALL, num_batches=8)
    pred = pricer.predict_price([make_contract(strike=100.0)])
    assert np.isfinite(pred.call).all()
    assert np.isnan(pred.put).all()
    greeks = pricer.predict_greeks([make_contract(strike=100.0)])
    assert np.isfinite(greeks.call).all()
    assert np.isfinite(greeks.call_jacobian).all()
    assert np.isfinite(greeks.call_gamma).all()
    assert np.isnan(greeks.put).all()
    assert np.isnan(greeks.put_jacobian).all()


def test_american_family_greeks_put_side() -> None:
    from spectralmc_tpu.ops.gbm import PayoffKind

    pricer, _ = _train_family_pricer(PayoffKind.AMERICAN_PUT, num_batches=8)
    greeks = pricer.predict_greeks([make_contract(strike=100.0)])
    assert np.isfinite(greeks.put).all()
    assert np.isfinite(greeks.put_jacobian).all()
    assert np.isfinite(greeks.put_gamma).all()
    assert np.isnan(greeks.call).all()
    assert greeks.fields[0] == "spot"


def test_lsmc_basis_degree_serialization_roundtrip() -> None:
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.serialization.converters import (
        sim_params_from_proto,
        sim_params_to_proto,
    )
    from tests.helpers import expect_success

    sim = expect_success(_family_sim(PayoffKind.AMERICAN_PUT, lsmc_basis_degree=3))
    proto = sim_params_to_proto(sim)
    assert proto.lsmc_basis_degree == 3
    back = expect_success(sim_params_from_proto(proto))
    assert back == sim
    # a pre-round-3 proto (field absent -> 0) decodes to the default degree
    proto.lsmc_basis_degree = 0
    legacy = expect_success(sim_params_from_proto(proto))
    assert legacy.lsmc_basis_degree == 5


# --------------------------------------------------------------------------
# Round 3b: LSMC early exercise under Heston dynamics
# --------------------------------------------------------------------------


def _heston_contract(**kwargs):
    from spectralmc_tpu.ops.heston import HestonContract

    defaults = dict(
        spot=100.0, strike=100.0, maturity=1.0, rate=0.04, div_yield=0.0,
        v0=0.05, kappa=1.5, theta=0.05, xi=0.4, rho=-0.6,
    )
    defaults.update(kwargs)
    return HestonContract(**defaults)


def test_heston_american_q0_call_has_no_premium() -> None:
    """q = 0: the American call is never exercised early (Merton), so the
    LSMC price must match BOTH the same-stream discrete European MC (tight)
    and the semi-analytic continuous price (z-gate)."""
    from spectralmc_tpu.ops.american import simulate_heston_american_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.heston import heston_call_price, simulate_heston_underlier_rows

    c = _heston_contract()
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32)
    u = simulate_heston_american_underlier_rows(
        jax.random.PRNGKey(3), arr, option=OptionSide.CALL, **kw
    )
    df = np.exp(-c.rate * c.maturity)
    cf = df * np.maximum(c.strike - np.asarray(u), 0.0)
    amer = cf.mean()
    se = cf.std() / np.sqrt(cf.size)
    eur_call, _ = heston_call_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, v0=c.v0, kappa=c.kappa, theta=c.theta,
        xi=c.xi, rho=c.rho,
    )
    assert abs(amer - eur_call) < 4.0 * se + 0.02 * eur_call
    # against the SAME normals' European leg the premium is ~zero
    term = simulate_heston_underlier_rows(
        jax.random.PRNGKey(3), arr, payoff=PayoffKind.TERMINAL, **kw
    )
    eur_mc = (df * np.maximum(np.asarray(term) - c.strike, 0.0)).mean()
    assert abs(amer - eur_mc) < max(3.0 * se, 0.005 * eur_mc)


def test_heston_american_put_premium_positive() -> None:
    from spectralmc_tpu.ops.american import simulate_heston_american_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.heston import simulate_heston_underlier_rows

    c = _heston_contract(strike=105.0, rate=0.07)
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32)
    u = simulate_heston_american_underlier_rows(
        jax.random.PRNGKey(5), arr, option=OptionSide.PUT, **kw
    )
    df = np.exp(-c.rate * c.maturity)
    amer = (df * np.maximum(c.strike - np.asarray(u), 0.0)).mean()
    term = simulate_heston_underlier_rows(
        jax.random.PRNGKey(5), arr, payoff=PayoffKind.TERMINAL, **kw
    )
    eur = (df * np.maximum(c.strike - np.asarray(term), 0.0)).mean()
    assert amer > eur + 0.1  # a real early-exercise premium at r=7%


def test_heston_american_family_trains_and_serves() -> None:
    """model=heston + payoff=american_put through the standard pipeline."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.ops.gbm import ModelKind, PayoffKind, build_simulation_params
    from spectralmc_tpu.ops.sobol import BoundSpec
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers import expect_success

    bounds = {
        "spot": BoundSpec(lower=95.0, upper=105.0),
        "strike": BoundSpec(lower=95.0, upper=105.0),
        "maturity": BoundSpec(lower=0.5, upper=1.5),
        "rate": BoundSpec(lower=0.01, upper=0.05),
        "div_yield": BoundSpec(lower=0.0, upper=0.02),
        "v0": BoundSpec(lower=0.03, upper=0.08),
        "kappa": BoundSpec(lower=1.0, upper=2.5),
        "theta": BoundSpec(lower=0.03, upper=0.08),
        "xi": BoundSpec(lower=0.2, upper=0.5),
        "rho": BoundSpec(lower=-0.8, upper=-0.3),
    }
    sim = expect_success(
        build_simulation_params(
            timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=3,
            model=ModelKind.HESTON, payoff=PayoffKind.AMERICAN_PUT,
            normalization="none",
        )
    )
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=5
        )
    )
    pricer = expect_success(
        GbmCVNNPricer.create(
            GbmCVNNPricerConfig(sim=sim, bounds=bounds, cvnn=cvnn, normalize_inputs=True)
        )
    )
    tc = expect_success(
        build_training_config(num_batches=4, batch_size=8, learning_rate=2e-3)
    )
    res = expect_success(pricer.train(tc))
    assert np.isfinite(res.losses).all()
    # snapshot -> resume == continuous (the family composes with resume)
    snap = pricer.snapshot()
    resumed = expect_success(GbmCVNNPricer.create(snap))
    t2 = expect_success(
        build_training_config(num_batches=2, batch_size=8, learning_rate=2e-3)
    )
    a = expect_success(pricer.train(t2))
    b = expect_success(resumed.train(t2))
    np.testing.assert_array_equal(a.losses, b.losses)
    pred = pricer.predict_price([_heston_contract()])
    assert np.isfinite(pred.put).all() and np.isnan(pred.call).all()


# --------------------------------------------------------------------------
# Round 3 completion: American exercise under BASKET and MERTON dynamics
# (closes the support matrix — every model family x every payoff kind)
# --------------------------------------------------------------------------


def _basket_spec(combine):
    from spectralmc_tpu.ops.basket import build_basket_spec
    from tests.helpers import expect_success

    return expect_success(
        build_basket_spec(
            weights=(0.5, 0.3, 0.2),
            correlation=((1.0, 0.5, 0.2), (0.5, 1.0, 0.3), (0.2, 0.3, 1.0)),
            spot_multipliers=(1.0, 0.9, 1.1),
            vol_multipliers=(1.0, 1.3, 0.7),
            combine=combine,
        )
    )


def _merton_contract(**overrides):
    from spectralmc_tpu.ops.merton import MertonContract

    base = dict(
        spot=100.0, strike=105.0, maturity=1.0, rate=0.05, div_yield=0.0,
        vol=0.2, lam=0.4, jump_mean=-0.1, jump_std=0.2,
    )
    base.update(overrides)
    return MertonContract(**base)


def test_geometric_basket_american_matches_effective_gbm_tree() -> None:
    """SHARP oracle: ln B_geo is an arithmetic Brownian motion, so the
    geometric-basket Bermudan IS a single-asset GBM Bermudan at
    (G0, sigma_eff, delta_eff) — priced by the same-grid CRR tree."""
    from spectralmc_tpu.ops.american import simulate_basket_american_underlier_rows
    from spectralmc_tpu.ops.basket import BasketCombine, geometric_basket_effective_gbm

    spec = _basket_spec(BasketCombine.GEOMETRIC)
    c = make_contract(spot=100.0, strike=100.0, maturity=1.0, rate=0.05,
                      div_yield=0.0, vol=0.25)
    arr = c.as_array(jnp.float32)
    u = simulate_basket_american_underlier_rows(
        jax.random.PRNGKey(7), arr, spec=spec, option=OptionSide.PUT,
        timesteps=16, rows=256, cols=256, dtype=jnp.float32,
    )
    df = np.exp(-c.rate * c.maturity)
    cf = df * np.maximum(c.strike - np.asarray(u), 0.0)
    amer, se = cf.mean(), cf.std() / np.sqrt(cf.size)
    g0, vol_eff, div_eff = geometric_basket_effective_gbm(
        arr, spec, dtype=jnp.float64
    )
    tree = bermudan_tree_price(
        spot=g0, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=div_eff, vol=vol_eff, exercise_dates=16, option="put",
    )
    assert abs(amer - tree) < 4.0 * se + 0.01 * tree, f"mc={amer} tree={tree}"


def test_arithmetic_basket_american_identities_and_premium() -> None:
    """No sharp arithmetic oracle exists; gate with the model-independent
    identities: r=0 put has NO early-exercise premium (equals the
    same-stream European MC leg tightly), and at r=5% the put premium over
    the same-stream European is strictly positive."""
    from spectralmc_tpu.ops.american import simulate_basket_american_underlier_rows
    from spectralmc_tpu.ops.basket import BasketCombine, simulate_basket_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind

    spec = _basket_spec(BasketCombine.ARITHMETIC)
    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32)

    def legs(rate: float):
        c = make_contract(spot=100.0, strike=105.0, maturity=1.0, rate=rate,
                          div_yield=0.0, vol=0.25)
        arr = c.as_array(jnp.float32)
        u = simulate_basket_american_underlier_rows(
            jax.random.PRNGKey(11), arr, spec=spec, option=OptionSide.PUT, **kw
        )
        df = np.exp(-rate * c.maturity)
        cf = df * np.maximum(c.strike - np.asarray(u), 0.0)
        term = simulate_basket_underlier_rows(
            jax.random.PRNGKey(11), arr, spec=spec, payoff=PayoffKind.TERMINAL, **kw
        )
        eur = (df * np.maximum(c.strike - np.asarray(term), 0.0)).mean()
        return cf.mean(), cf.std() / np.sqrt(cf.size), eur

    amer0, se0, eur0 = legs(0.0)
    assert abs(amer0 - eur0) < max(3.0 * se0, 0.005 * eur0)
    amer5, _, eur5 = legs(0.05)
    assert amer5 > eur5 + 0.05  # real early-exercise premium at r=5%


def test_basket_american_forward_stream_bit_parity() -> None:
    """basket_state_rows (the American forward) and the European simulator
    share ONE stream + ONE step helper; pin it: exp(terminal log-basket)
    equals the European TERMINAL underlier bit-for-bit, both combines."""
    from spectralmc_tpu.ops.american import basket_state_rows
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        basket_cholesky,
        simulate_basket_underlier_rows,
    )
    from spectralmc_tpu.ops.gbm import PayoffKind, _row_streams

    c = make_contract(spot=100.0, strike=100.0, maturity=1.0, rate=0.03,
                      div_yield=0.01, vol=0.25)
    arr = c.as_array(jnp.float32)
    n, rows, cols = 6, 16, 128
    for combine in (BasketCombine.GEOMETRIC, BasketCombine.ARITHMETIC):
        spec = _basket_spec(combine)
        row_keys, sign = _row_streams(
            jax.random.PRNGKey(9), rows=rows, row_offset=0,
            antithetic_half=None, dtype=jnp.float32,
        )
        dt = jnp.float32(c.maturity / n)
        sigmas = jnp.float32(c.vol) * jnp.asarray(spec.vol_multipliers, jnp.float32)
        lb_rows, disp_rows = basket_state_rows(
            row_keys, sign,
            log_spots=jnp.log(
                jnp.float32(c.spot) * jnp.asarray(spec.spot_multipliers, jnp.float32)
            ),
            timesteps=n, rows=rows, cols=cols, dtype=jnp.float32,
            drift=(jnp.float32(c.rate - c.div_yield) - 0.5 * sigmas * sigmas) * dt,
            sig_sqdt=sigmas * jnp.sqrt(dt),
            chol=jnp.asarray(basket_cholesky(spec), jnp.float32),
            weights=jnp.asarray(spec.weights, jnp.float32),
            geometric=combine == BasketCombine.GEOMETRIC,
        )
        term = simulate_basket_underlier_rows(
            jax.random.PRNGKey(9), arr, spec=spec, timesteps=n, rows=rows,
            cols=cols, dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
        )
        if combine == BasketCombine.GEOMETRIC:
            # identical compute graph -> bit-for-bit
            np.testing.assert_array_equal(
                np.asarray(jnp.exp(lb_rows[-1])), np.asarray(term)
            )
        else:
            # the American forward stores ln B (the LSMC encode needs the
            # log); exp(ln B) costs <= a few ulps vs the European's direct
            # B — rtol 2e-6 is ~20 float32 ulps, far below any stream
            # divergence (different normals shift values at O(1) rel)
            np.testing.assert_allclose(
                np.asarray(jnp.exp(lb_rows[-1])), np.asarray(term), rtol=2e-6
            )
        disp = np.asarray(disp_rows)
        if combine == BasketCombine.ARITHMETIC:
            assert (disp > -1e-5).all()  # Jensen: ln(B_arith/B_geom) >= 0
        else:
            assert (disp == 0.0).all()


def test_merton_american_q0_call_and_r0_put_have_no_premium() -> None:
    """Model-independent no-early-exercise identities under jumps: the
    American leg must match BOTH the same-stream European MC (tight) and
    Merton's exact series price (z-gate)."""
    from spectralmc_tpu.ops.american import simulate_merton_american_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.merton import merton_call_price, simulate_merton_underlier_rows

    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32)
    for option, c in (
        (OptionSide.CALL, _merton_contract(strike=95.0, rate=0.03, div_yield=0.0)),
        (OptionSide.PUT, _merton_contract(strike=105.0, rate=0.0, div_yield=0.02)),
    ):
        arr = c.as_array(jnp.float32)
        u = simulate_merton_american_underlier_rows(
            jax.random.PRNGKey(3), arr, option=option, **kw
        )
        df = np.exp(-c.rate * c.maturity)
        cf = df * np.maximum(c.strike - np.asarray(u), 0.0)
        amer, se = cf.mean(), cf.std() / np.sqrt(cf.size)
        call_ser, put_ser = merton_call_price(
            spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
            div_yield=c.div_yield, vol=c.vol, lam=c.lam,
            jump_mean=c.jump_mean, jump_std=c.jump_std,
        )
        eur_series = call_ser if option == OptionSide.CALL else put_ser
        assert abs(amer - eur_series) < 4.0 * se + 0.02 * eur_series
        term = np.asarray(
            simulate_merton_underlier_rows(
                jax.random.PRNGKey(3), arr, payoff=PayoffKind.TERMINAL, **kw
            )
        )
        intrinsic = (
            term - c.strike if option == OptionSide.CALL else c.strike - term
        )
        eur_mc = (df * np.maximum(intrinsic, 0.0)).mean()
        assert abs(amer - eur_mc) < max(3.0 * se, 0.005 * eur_mc)


def test_merton_american_put_premium_positive() -> None:
    from spectralmc_tpu.ops.american import simulate_merton_american_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

    c = _merton_contract(strike=105.0, rate=0.07)
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32)
    u = simulate_merton_american_underlier_rows(
        jax.random.PRNGKey(5), arr, option=OptionSide.PUT, **kw
    )
    df = np.exp(-c.rate * c.maturity)
    amer = (df * np.maximum(c.strike - np.asarray(u), 0.0)).mean()
    term = simulate_merton_underlier_rows(
        jax.random.PRNGKey(5), arr, payoff=PayoffKind.TERMINAL, **kw
    )
    eur = (df * np.maximum(c.strike - np.asarray(term), 0.0)).mean()
    assert amer > eur + 0.1  # real early-exercise premium at r=7%


def test_merton_american_forward_stream_bit_parity() -> None:
    """merton_state_rows (the American forward) replays the European
    simulator's exact stream: terminal exp(log-spot) equals the European
    TERMINAL underlier bit-for-bit."""
    import math

    from spectralmc_tpu.ops.american import merton_state_rows
    from spectralmc_tpu.ops.gbm import PayoffKind, _row_streams
    from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

    c = _merton_contract()
    arr = c.as_array(jnp.float32)
    n, rows, cols = 6, 16, 128
    row_keys, sign = _row_streams(
        jax.random.PRNGKey(13), rows=rows, row_offset=0, antithetic_half=None,
        dtype=jnp.float32,
    )
    dt = c.maturity / n
    m = math.exp(c.jump_mean + 0.5 * c.jump_std**2) - 1.0
    log_rows = merton_state_rows(
        row_keys, sign, spot=jnp.float32(c.spot), timesteps=n, rows=rows,
        cols=cols, dtype=jnp.float32,
        drift=jnp.float32(
            (c.rate - c.div_yield - c.lam * m - 0.5 * c.vol**2) * dt
        ),
        vol_sqdt=jnp.float32(c.vol * math.sqrt(dt)),
        lam_dt=jnp.float32(c.lam * dt),
        jump_mean=jnp.float32(c.jump_mean),
        jump_std=jnp.float32(c.jump_std),
    )
    term = simulate_merton_underlier_rows(
        jax.random.PRNGKey(13), arr, timesteps=n, rows=rows, cols=cols,
        dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
    )
    np.testing.assert_array_equal(np.asarray(jnp.exp(log_rows[-1])), np.asarray(term))


@pytest.mark.parametrize("model_name", ["basket_gbm", "merton_jump"])
def test_new_dynamics_american_family_trains_and_serves(model_name) -> None:
    """model=basket/merton + payoff=american_put through the standard
    create -> train -> snapshot -> resume-bit-exact -> predict pipeline."""
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.ops.basket import BasketCombine
    from spectralmc_tpu.ops.gbm import ModelKind, PayoffKind, build_simulation_params
    from spectralmc_tpu.ops.sobol import BoundSpec
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )
    from tests.helpers import expect_success

    bounds = {
        "spot": BoundSpec(lower=95.0, upper=105.0),
        "strike": BoundSpec(lower=95.0, upper=105.0),
        "maturity": BoundSpec(lower=0.5, upper=1.5),
        "rate": BoundSpec(lower=0.01, upper=0.05),
        "div_yield": BoundSpec(lower=0.0, upper=0.02),
        "vol": BoundSpec(lower=0.15, upper=0.3),
    }
    sim_kwargs: dict[str, object] = dict(
        timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=3,
        payoff=PayoffKind.AMERICAN_PUT, normalization="none",
    )
    if model_name == "basket_gbm":
        sim_kwargs.update(
            model=ModelKind.BASKET_GBM, basket=_basket_spec(BasketCombine.ARITHMETIC)
        )
        contract = make_contract(strike=102.0)
    else:
        sim_kwargs.update(model=ModelKind.MERTON_JUMP)
        bounds.update(
            lam=BoundSpec(lower=0.05, upper=1.0),
            jump_mean=BoundSpec(lower=-0.2, upper=0.05),
            jump_std=BoundSpec(lower=0.1, upper=0.3),
        )
        contract = _merton_contract(strike=102.0)
    sim = expect_success(build_simulation_params(**sim_kwargs))
    cvnn = expect_success(
        build_cvnn_config(
            layers=[LinearCfg(width=24, activation=Activation.MODRELU)], seed=5
        )
    )
    pricer = expect_success(
        GbmCVNNPricer.create(
            GbmCVNNPricerConfig(sim=sim, bounds=bounds, cvnn=cvnn, normalize_inputs=True)
        )
    )
    tc = expect_success(
        build_training_config(num_batches=4, batch_size=8, learning_rate=2e-3)
    )
    res = expect_success(pricer.train(tc))
    assert np.isfinite(res.losses).all()
    snap = pricer.snapshot()
    resumed = expect_success(GbmCVNNPricer.create(snap))
    t2 = expect_success(
        build_training_config(num_batches=2, batch_size=8, learning_rate=2e-3)
    )
    a = expect_success(pricer.train(t2))
    b = expect_success(resumed.train(t2))
    np.testing.assert_array_equal(a.losses, b.losses)
    pred = pricer.predict_price([contract])
    assert np.isfinite(pred.put).all() and np.isnan(pred.call).all()


def test_heston_american_forward_stream_bit_parity() -> None:
    """The American forward pass and the European simulator share ONE step +
    ONE stream definition (ops/heston.py helpers); pin it: the state-rows
    terminal equals the European TERMINAL underlier bit-for-bit."""
    import math

    from spectralmc_tpu.ops.american import heston_state_rows
    from spectralmc_tpu.ops.gbm import PayoffKind, _row_streams
    from spectralmc_tpu.ops.heston import simulate_heston_underlier_rows

    c = _heston_contract()
    arr = c.as_array(jnp.float32)
    n, rows, cols = 6, 16, 128
    row_keys, sign = _row_streams(
        jax.random.PRNGKey(9), rows=rows, row_offset=0, antithetic_half=None,
        dtype=jnp.float32,
    )
    dt = c.maturity / n
    log_rows, v_rows = heston_state_rows(
        row_keys, sign, spot=jnp.float32(c.spot), v0=jnp.float32(c.v0),
        timesteps=n, rows=rows, cols=cols, dtype=jnp.float32,
        rate=jnp.float32(c.rate), div_yield=jnp.float32(c.div_yield),
        dt=jnp.float32(dt), sqrt_dt=jnp.float32(math.sqrt(dt)),
        rho=jnp.float32(c.rho), rho_bar=jnp.float32(math.sqrt(1.0 - c.rho**2)),
        kappa=jnp.float32(c.kappa), theta=jnp.float32(c.theta),
        xi=jnp.float32(c.xi),
    )
    term = simulate_heston_underlier_rows(
        jax.random.PRNGKey(9), arr, timesteps=n, rows=rows, cols=cols,
        dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
    )
    got = np.asarray(jnp.exp(log_rows[-1]))
    np.testing.assert_array_equal(got, np.asarray(term))
    assert np.asarray(v_rows).shape == (n, rows, cols)


def test_effect_route_mirrors_american_gates() -> None:
    """The SimulatePaths effect route enforces the same AMERICAN/MEAN gates
    as build_simulation_params (review finding: the effect defaults to
    normalization='mean', which would silently rescale the synthetic
    underlier to the WRONG mean)."""
    import asyncio

    from spectralmc_tpu.core.result import Failure
    from spectralmc_tpu.effects.interpreter import SpectralMCInterpreter
    from spectralmc_tpu.effects.types import SimulatePaths

    c = make_contract()
    interp = SpectralMCInterpreter()

    def effect(**kwargs):
        base = dict(
            spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
            div_yield=c.div_yield, vol=c.vol, timesteps=4, batches=8,
            network_size=16, seed=3, counter=0, scheme="log_euler",
            normalization="none", payoff="american_put", model="gbm",
            precision="float32", out_id="x",
        )
        base.update(kwargs)
        return SimulatePaths(**base)

    # MEAN normalization with no closed-form mean -> typed failure
    out = asyncio.run(interp.interpret(effect(normalization="mean", out_id="a")))
    assert isinstance(out, Failure) and "closed-form" in out.error.reason
    # euler scheme -> typed failure
    out = asyncio.run(interp.interpret(effect(scheme="euler", out_id="b")))
    assert isinstance(out, Failure) and "log-Euler" in out.error.reason
    # single monitor date -> typed failure
    out = asyncio.run(interp.interpret(effect(timesteps=1, out_id="c")))
    assert isinstance(out, Failure) and "monitor dates" in out.error.reason
    # the valid configuration succeeds
    out = asyncio.run(interp.interpret(effect(out_id="d")))
    assert not isinstance(out, Failure)
    # barrier + mean is equally gated on the effect route
    out = asyncio.run(
        interp.interpret(
            effect(payoff="barrier_up_out", barrier_rel=1.3, normalization="mean",
                   out_id="e")
        )
    )
    assert isinstance(out, Failure) and "closed-form" in out.error.reason


def test_bump_greeks_factory_guards_american_side() -> None:
    """make_bump_greeks_fn itself (not just the wrapper) refuses the wrong
    American side — no public entry point returns silent zeros."""
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.greeks import make_bump_greeks_fn

    from tests.helpers import expect_success

    sim = expect_success(
        _family_sim(
            PayoffKind.AMERICAN_PUT, timesteps=4, network_size=16,
            batches_per_mc_run=4,
        )
    )
    with pytest.raises(ValueError, match="side only"):
        make_bump_greeks_fn(sim, option=OptionSide.CALL)


def test_simulate_underlier_rows_rejects_euler_american() -> None:
    from spectralmc_tpu.ops.gbm import PayoffKind as PK
    from spectralmc_tpu.ops.gbm import PathScheme, simulate_underlier_rows

    c = make_contract()
    with pytest.raises(ValueError, match="log-Euler"):
        simulate_underlier_rows(
            jax.random.PRNGKey(0), c.as_array(jnp.float32), timesteps=4, rows=4,
            cols=16, dtype=jnp.float32, scheme=PathScheme.EULER,
            payoff=PK.AMERICAN_PUT,
        )


# --------------------------------------------------------------------------
# Round 3c: sparse Bermudan monitor grids (lsmc_exercise_every)
# --------------------------------------------------------------------------


def test_sparse_monitor_grid_prices_to_matching_tree() -> None:
    """16 simulation steps with exercise every 4th date is a 4-date Bermudan:
    the price must match the tree restricted to THOSE dates, sit strictly
    below the 16-date Bermudan (fewer rights), and above the European."""
    from spectralmc_tpu.ops.american import simulate_american_underlier_rows

    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    arr = c.as_array(jnp.float32)
    kw = dict(timesteps=16, rows=256, cols=256, dtype=jnp.float32,
              option=OptionSide.PUT)
    df = np.exp(-c.rate * c.maturity)

    def price(every: int) -> float:
        u = simulate_american_underlier_rows(
            jax.random.PRNGKey(7), arr, exercise_every=every, **kw
        )
        return float((df * np.maximum(c.strike - np.asarray(u), 0.0)).mean())

    p4 = price(4)   # 4 monitor dates
    p1 = price(1)   # 16 monitor dates (same paths)
    tree4 = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=4, option="put",
    )
    tree16 = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=16, option="put",
    )
    assert p4 == pytest.approx(tree4, rel=0.01), (p4, tree4)
    assert p1 == pytest.approx(tree16, rel=0.01), (p1, tree16)
    # same paths: more exercise rights are worth strictly more here
    assert p1 > p4
    euro = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).put
    )
    assert p4 > euro  # even 4 dates beat the European


def test_exercise_every_validation_and_roundtrip() -> None:
    from spectralmc_tpu.core.result import Failure
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.serialization.converters import (
        sim_params_from_proto,
        sim_params_to_proto,
    )
    from tests.helpers import expect_success

    # must divide timesteps
    assert isinstance(
        _family_sim(
            PayoffKind.AMERICAN_PUT, timesteps=16, lsmc_exercise_every=3
        ),
        Failure,
    )
    # must leave >= 2 monitor dates
    assert isinstance(
        _family_sim(
            PayoffKind.AMERICAN_PUT, timesteps=16, lsmc_exercise_every=16
        ),
        Failure,
    )
    sim = expect_success(
        _family_sim(PayoffKind.AMERICAN_PUT, timesteps=16, lsmc_exercise_every=4)
    )
    proto = sim_params_to_proto(sim)
    assert proto.lsmc_exercise_every == 4
    back = expect_success(sim_params_from_proto(proto))
    assert back == sim
    proto.lsmc_exercise_every = 0  # pre-round-3c checkpoint
    assert expect_success(sim_params_from_proto(proto)).lsmc_exercise_every == 1


def test_exercise_every_flows_through_family_pipeline() -> None:
    """BlackScholes facade + dispatch honor the monitor grid: every=timesteps/2
    yields a 2-date Bermudan priced at the matching tree."""
    from spectralmc_tpu.ops.gbm import BlackScholes, PayoffKind

    from tests.helpers import expect_success

    sim = expect_success(
        _family_sim(
            PayoffKind.AMERICAN_PUT, timesteps=16, lsmc_exercise_every=8,
            network_size=256, batches_per_mc_run=256,
        )
    )
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    prices, _ = BlackScholes(sim).price_to_host(c)
    tree2 = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=2, option="put",
    )
    assert prices.put == pytest.approx(tree2, rel=0.01)


def test_control_variate_reduces_std_error_and_matches_tree() -> None:
    """The European control variate (exact mean = Black) shares every path
    with the Bermudan cashflow: the CV estimate must cut the standard error
    meaningfully (imperfect correlation: exercised paths stop tracking the
    terminal payoff — measured ~1.5x here) and still match the tree."""
    c = make_contract(spot=100.0, strike=105.0, vol=0.25, rate=0.05, div_yield=0.0)
    r = lsmc_price(jax.random.PRNGKey(7), c, timesteps=16, paths=PATHS)
    assert np.isfinite(r.cv_price) and np.isfinite(r.cv_std_error)
    assert r.cv_std_error < 0.8 * r.std_error, (r.cv_std_error, r.std_error)
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=16, option="put",
    )
    assert r.cv_price == pytest.approx(tree, abs=max(4.0 * r.cv_std_error, 0.005 * tree))


def test_implied_vol_roundtrip_and_bounds() -> None:
    """implied_vol inverts black_scholes_price across a vol/moneyness grid
    (round trip to 1e-6) and NaNs outside the no-arbitrage envelope."""
    from spectralmc_tpu.ops.analytic import black_scholes_price, implied_vol

    for vol in (0.08, 0.25, 0.9):
        for strike in (80.0, 100.0, 125.0):
            p = black_scholes_price(100.0, strike, 1.0, 0.03, 0.01, vol)
            for option, price in (("call", p.call), ("put", p.put)):
                got = float(
                    implied_vol(price, 100.0, strike, 1.0, 0.03, 0.01, option=option)
                )
                assert got == pytest.approx(vol, abs=1e-6), (vol, strike, option)
    # vectorized over a batch
    import jax.numpy as _jnp

    vols = _jnp.array([0.15, 0.35, 0.55])
    prices = black_scholes_price(100.0, 100.0, 1.0, 0.03, 0.01, vols).call
    got = implied_vol(prices, 100.0, 100.0, 1.0, 0.03, 0.01, option="call")
    np.testing.assert_allclose(np.asarray(got), np.asarray(vols), atol=1e-6)
    # below intrinsic / above the upper bound -> NaN
    df_f = float(np.exp(-0.03) * 100.0 * np.exp(0.02))
    assert np.isnan(float(implied_vol(0.0, 100.0, 80.0, 1.0, 0.03, 0.01, option="call")))
    assert np.isnan(float(implied_vol(df_f + 1.0, 100.0, 80.0, 1.0, 0.03, 0.01, option="call")))
    # in-envelope but past the bracket ceiling (true vol > hi): NaN, never a
    # silently pinned ~5.0 quote
    extreme = black_scholes_price(100.0, 100.0, 1.0, 0.03, 0.01, 6.0)
    assert np.isnan(float(implied_vol(extreme.call, 100.0, 100.0, 1.0, 0.03, 0.01, option="call")))


def test_effect_route_carries_lsmc_knobs_and_matches_direct() -> None:
    """build_simulation_effects → SimulatePaths carries lsmc_basis_degree /
    lsmc_exercise_every, and the interpreted payoffs match make_mc_spectrum's
    inputs bit-for-bit (the same guarantee the barrier test pins)."""
    import asyncio

    from spectralmc_tpu.core.result import Failure
    from spectralmc_tpu.effects.interpreter import SpectralMCInterpreter
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.training.effects_builders import build_simulation_effects
    from spectralmc_tpu.training.step import make_mc_spectrum
    from spectralmc_tpu.effects.types import ComputeFFT
    from spectralmc_tpu.effects.composition import sequence_effects
    from tests.helpers import expect_success

    sim = expect_success(
        _family_sim(
            PayoffKind.AMERICAN_PUT, timesteps=4, network_size=16,
            batches_per_mc_run=8, lsmc_basis_degree=3, lsmc_exercise_every=2,
            skip=4,
        )
    )
    c = make_contract(strike=105.0)
    seq = build_simulation_effects(sim, c, out_id="prices")
    paths_effect = seq.effects[0]
    assert paths_effect.lsmc_basis_degree == 3
    assert paths_effect.lsmc_exercise_every == 2

    fft = ComputeFFT(in_id="prices", batches=8, network_size=16, out_id="spec")
    interp = SpectralMCInterpreter()
    res = asyncio.run(
        interp.interpret_sequence(sequence_effects(list(seq.effects) + [fft]))
    )
    assert not isinstance(res, Failure), res
    spec = interp.registry.get_array("spec").expect("spec")
    direct = make_mc_spectrum(sim)(jnp.uint32(4), c.as_array(jnp.float32))
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(direct))

    # a non-dividing monitor grid on the effect route is a typed failure
    from spectralmc_tpu.effects.types import SimulatePaths

    bad = SimulatePaths(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, timesteps=4, batches=8,
        network_size=16, seed=3, counter=0, scheme="log_euler",
        normalization="none", payoff="american_put", model="gbm",
        precision="float32", lsmc_exercise_every=3, out_id="bad",
    )
    out = asyncio.run(interp.interpret(bad))
    assert isinstance(out, Failure) and "divide" in out.error.reason
