"""Term structures beyond GBM (round 4) — Heston/Merton/basket curves.

Extension beyond the reference (its market data is flat scalars,
/root/reference/src/spectralmc/gbm.py:77-103). Round 3 added piecewise-
constant curves for the GBM family; round 4 extends them: rate/div curves
for Heston (its vol IS the variance process — vol_shape is refused), and
rate/div/vol curves for Merton (the vol curve scales the diffusion leg;
jumps keep their contract law) and baskets (one shared per-step factor on
every asset's vol, so the geometric combine stays an effective GBM).

Oracle chain: European prices under DETERMINISTIC rates factor the
discount/forward out of the vol/jump dynamics, so each family's exact flat
oracle holds at the effective parameters rate·mean(rs), div·mean(qs),
vol·rms(vs) — not approximately, exactly (the curves shift ln S by the
deterministic integral). Each curved cell is gated on that oracle; flat
curves are gated BIT-identical to no curve; curve-aware closed-form means
are gated against MC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.core.result import Failure
from spectralmc_tpu.ops.gbm import (
    ModelKind,
    PayoffKind,
    SimImplementation,
    TermStructure,
    build_simulation_params,
    resolve_implementation,
)
from tests.helpers import expect_failure, expect_success

T = 16
# genuinely curved: front-loaded vol, rising rates, dipping divs
VOL_SHAPE = tuple(1.4 - 0.8 * t / (T - 1) for t in range(T))
RATE_SHAPE = tuple(0.6 + 0.9 * t / (T - 1) for t in range(T))
DIV_SHAPE = tuple(1.2 - 0.5 * t / (T - 1) for t in range(T))
RD_TERM = TermStructure(rate_shape=RATE_SHAPE, div_shape=DIV_SHAPE)
FULL_TERM = TermStructure(
    vol_shape=VOL_SHAPE, rate_shape=RATE_SHAPE, div_shape=DIV_SHAPE
)
FLAT_TERM = TermStructure(vol_shape=(1.0,) * T, rate_shape=(1.0,) * T)


def _eff(term: TermStructure) -> tuple[float, float, float]:
    return term.effective_factors(T)


# --------------------------------------------------------------------------
# build-time rules
# --------------------------------------------------------------------------


def test_heston_vol_curve_refused_rate_div_allowed() -> None:
    bad = build_simulation_params(
        timesteps=T, network_size=32, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.HESTON, term=FULL_TERM,
    )
    err = expect_failure(bad)
    assert "variance process" in err.reason
    ok = build_simulation_params(
        timesteps=T, network_size=32, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.HESTON, term=RD_TERM,
    )
    assert expect_success(ok).term == RD_TERM


def test_merton_and_basket_full_curves_allowed() -> None:
    from spectralmc_tpu.ops.basket import BasketCombine, build_basket_spec

    ok_m = build_simulation_params(
        timesteps=T, network_size=32, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.MERTON_JUMP, term=FULL_TERM,
    )
    assert expect_success(ok_m).term == FULL_TERM
    spec = build_basket_spec(
        weights=(0.5, 0.5), correlation=((1.0, 0.3), (0.3, 1.0)),
        combine=BasketCombine.GEOMETRIC,
    ).expect("spec")
    ok_b = build_simulation_params(
        timesteps=T, network_size=32, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.BASKET_GBM, basket=spec, term=FULL_TERM,
    )
    assert expect_success(ok_b).term == FULL_TERM


def test_non_gbm_american_under_curves_refused() -> None:
    err = expect_failure(
        build_simulation_params(
            timesteps=T, network_size=32, batches_per_mc_run=8, mc_seed=1,
            model=ModelKind.MERTON_JUMP, payoff=PayoffKind.AMERICAN_PUT,
            normalization="none", term=RD_TERM,
        )
    )
    assert "GBM dynamics only" in err.reason


def test_curved_non_gbm_resolves_to_xla() -> None:
    sim = expect_success(
        build_simulation_params(
            timesteps=T, network_size=256, batches_per_mc_run=256, mc_seed=1,
            model=ModelKind.HESTON, term=RD_TERM,
            implementation=SimImplementation.PALLAS,
        )
    )
    assert resolve_implementation(sim) == SimImplementation.XLA


# --------------------------------------------------------------------------
# flat bit-identity (per family)
# --------------------------------------------------------------------------


def test_flat_term_bit_identity_all_families() -> None:
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        build_basket_spec,
        simulate_basket_underlier_rows,
    )
    from spectralmc_tpu.ops.heston import simulate_heston_underlier_rows
    from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

    key = jax.random.PRNGKey(3)
    kw = dict(timesteps=T, rows=16, cols=64, dtype=jnp.float32,
              payoff=PayoffKind.TERMINAL)
    hc = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.04, 1.5, 0.04, 0.5, -0.7],
                   jnp.float32)
    a = simulate_heston_underlier_rows(key, hc, **kw)
    b = simulate_heston_underlier_rows(key, hc, term=FLAT_TERM, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b))

    mc = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.2, 0.5, -0.1, 0.25],
                   jnp.float32)
    a = simulate_merton_underlier_rows(key, mc, **kw)
    b = simulate_merton_underlier_rows(key, mc, term=FLAT_TERM, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b))

    spec = build_basket_spec(
        weights=(0.6, 0.4), correlation=((1.0, 0.25), (0.25, 1.0)),
        combine=BasketCombine.GEOMETRIC,
    ).expect("spec")
    bc = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.25], jnp.float32)
    a = simulate_basket_underlier_rows(key, bc, spec=spec, **kw)
    b = simulate_basket_underlier_rows(key, bc, spec=spec, term=FLAT_TERM, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------------------
# curved oracles (effective-parameter exactness)
# --------------------------------------------------------------------------


def test_heston_curved_terminal_matches_effective_oracle() -> None:
    """Deterministic rates factor out of the vol dynamics: the semi-analytic
    Heston price at rate·mean(rs), div·mean(qs) is EXACT for the curved sim
    (same discretization bias as the flat gate in test_heston.py)."""
    from spectralmc_tpu.ops.heston import heston_call_price, simulate_heston_underlier_rows

    p = dict(spot=100.0, strike=100.0, maturity=1.0, rate=0.05, div_yield=0.02,
             v0=0.04, kappa=1.5, theta=0.04, xi=0.5, rho=-0.7)
    _, mr, mq = _eff(RD_TERM)
    call_eff, _ = heston_call_price(
        **{**p, "rate": p["rate"] * mr, "div_yield": p["div_yield"] * mq}
    )
    contract = jnp.array(
        [p["spot"], p["strike"], p["maturity"], p["rate"], p["div_yield"],
         p["v0"], p["kappa"], p["theta"], p["xi"], p["rho"]], jnp.float32,
    )
    s_t = np.asarray(
        simulate_heston_underlier_rows(
            jax.random.PRNGKey(11), contract, timesteps=T, rows=1024, cols=256,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL, term=RD_TERM,
        ),
        dtype=np.float64,
    ).reshape(-1)
    df = math.exp(-p["rate"] * mr * p["maturity"])
    calls = df * np.maximum(s_t - p["strike"], 0.0)
    se = calls.std(ddof=1) / math.sqrt(calls.size)
    z = (calls.mean() - call_eff) / se
    assert abs(z) < 4.0, (calls.mean(), call_eff, z)


def test_merton_curved_terminal_matches_effective_series() -> None:
    """rate/div/vol curves: the exact Merton series at rate·mean(rs),
    div·mean(qs), vol·rms(vs) — the diffusion variance integral is the only
    place the vol curve enters; the jump law is untouched."""
    from spectralmc_tpu.ops.merton import merton_call_price, simulate_merton_underlier_rows

    p = dict(spot=100.0, strike=105.0, maturity=1.0, rate=0.04, div_yield=0.01,
             vol=0.2, lam=0.5, jump_mean=-0.1, jump_std=0.25)
    rv, mr, mq = _eff(FULL_TERM)
    call_eff, _ = merton_call_price(
        **{**p, "rate": p["rate"] * mr, "div_yield": p["div_yield"] * mq,
           "vol": p["vol"] * rv}
    )
    contract = jnp.array(
        [p["spot"], p["strike"], p["maturity"], p["rate"], p["div_yield"],
         p["vol"], p["lam"], p["jump_mean"], p["jump_std"]], jnp.float32,
    )
    # FULL_TERM has length T=16 shapes; simulate on the same grid
    s_t = np.asarray(
        simulate_merton_underlier_rows(
            jax.random.PRNGKey(12), contract, timesteps=T, rows=512, cols=256,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL, term=FULL_TERM,
        ),
        dtype=np.float64,
    ).reshape(-1)
    df = math.exp(-p["rate"] * mr * p["maturity"])
    calls = df * np.maximum(s_t - p["strike"], 0.0)
    se = calls.std(ddof=1) / math.sqrt(calls.size)
    z = (calls.mean() - call_eff) / se
    assert abs(z) < 4.0, (calls.mean(), call_eff, z)


def test_geometric_basket_curved_matches_moment_black() -> None:
    """The curved geometric basket's ln B_T is exactly Gaussian with
    mean ln G0 + Σ μ̄_t dt and var Σ s̄²_t dt; Black at the matching
    effective (rate, div, vol) prices it exactly."""
    from spectralmc_tpu.ops.analytic import black_scholes_price
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        basket_g0,
        basket_log_moments,
        build_basket_spec,
        simulate_basket_underlier_rows,
    )

    spec = build_basket_spec(
        weights=(0.5, 0.3, 0.2),
        correlation=((1.0, 0.4, 0.2), (0.4, 1.0, 0.3), (0.2, 0.3, 1.0)),
        combine=BasketCombine.GEOMETRIC,
    ).expect("spec")
    contract = jnp.array([100.0, 95.0, 1.0, 0.04, 0.01, 0.25], jnp.float32)
    rv, mr, mq = _eff(FULL_TERM)
    mu_bar, s2_bar = basket_log_moments(contract, spec, dtype=jnp.float64)
    g0 = float(basket_g0(contract, spec, dtype=jnp.float64))
    maturity, rate, div = 1.0, 0.04, 0.01
    # per-step: mu_t dt = (r·rs − q·qs)dt − ½(Σwσ²)vs²dt; s2_t dt = s̄²vs²dt
    vs, rs, qs = FULL_TERM.shapes(T)
    dt = maturity / T
    wss = float(mu_bar) - (rate - div) # = −½Σwσ² (flat)  → Σwσ²/2 = −wss
    half_wss = -(wss)
    mu_sum = sum(
        (rate * r_ - div * q_) * dt - half_wss * v_ * v_ * dt
        for v_, r_, q_ in zip(vs, rs, qs)
    )
    s2_sum = float(s2_bar) * sum(v_ * v_ for v_ in vs) * dt
    vol_eff = math.sqrt(s2_sum / maturity)
    rate_eff = rate * mr
    div_eff = rate_eff - (mu_sum + 0.5 * s2_sum) / maturity
    oracle = black_scholes_price(g0, 95.0, maturity, rate_eff, div_eff, vol_eff)
    b_t = np.asarray(
        simulate_basket_underlier_rows(
            jax.random.PRNGKey(13), contract, spec=spec, timesteps=T, rows=512,
            cols=256, dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
            term=FULL_TERM,
        ),
        dtype=np.float64,
    ).reshape(-1)
    df = math.exp(-rate_eff * maturity)
    calls = df * np.maximum(b_t - 95.0, 0.0)
    se = calls.std(ddof=1) / math.sqrt(calls.size)
    z = (calls.mean() - float(oracle.call)) / se
    assert abs(z) < 4.0, (calls.mean(), float(oracle.call), z)


# --------------------------------------------------------------------------
# curve-aware closed-form means (MEAN normalization targets)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("payoff", [PayoffKind.TERMINAL, PayoffKind.ASIAN_ARITHMETIC])
def test_heston_curved_mean_matches_mc(payoff: PayoffKind) -> None:
    from spectralmc_tpu.ops.heston import (
        heston_expected_underlier_mean,
        simulate_heston_underlier_rows,
    )

    contract = jnp.array(
        [100.0, 100.0, 1.0, 0.05, 0.02, 0.04, 1.5, 0.04, 0.5, -0.7], jnp.float32
    )
    want = float(
        heston_expected_underlier_mean(
            contract, timesteps=T, payoff=payoff, dtype=jnp.float64, term=RD_TERM
        )
    )
    u = np.asarray(
        simulate_heston_underlier_rows(
            jax.random.PRNGKey(7), contract, timesteps=T, rows=512, cols=256,
            dtype=jnp.float32, payoff=payoff, term=RD_TERM,
        ),
        dtype=np.float64,
    ).reshape(-1)
    se = u.std(ddof=1) / math.sqrt(u.size)
    z = (u.mean() - want) / se
    assert abs(z) < 4.0, (u.mean(), want, z)


@pytest.mark.parametrize(
    "payoff",
    [
        PayoffKind.TERMINAL,
        PayoffKind.VARIANCE_SWAP,
        PayoffKind.DIGITAL,
        PayoffKind.FORWARD_START,
    ],
)
def test_merton_curved_mean_matches_mc(payoff: PayoffKind) -> None:
    from spectralmc_tpu.ops.merton import (
        merton_expected_underlier_mean,
        simulate_merton_underlier_rows,
    )

    contract = jnp.array(
        [100.0, 100.0, 1.0, 0.04, 0.01, 0.2, 0.5, -0.1, 0.25], jnp.float32
    )
    kwargs: dict = {}
    if payoff == PayoffKind.FORWARD_START:
        kwargs["forward_start_step"] = T // 2
    want = float(
        merton_expected_underlier_mean(
            contract, timesteps=T, payoff=payoff, dtype=jnp.float64,
            term=FULL_TERM, **kwargs,
        )
    )
    u = np.asarray(
        simulate_merton_underlier_rows(
            jax.random.PRNGKey(8), contract, timesteps=T, rows=512, cols=256,
            dtype=jnp.float32, payoff=payoff, term=FULL_TERM, **kwargs,
        ),
        dtype=np.float64,
    ).reshape(-1)
    se = u.std(ddof=1) / math.sqrt(u.size)
    z = (u.mean() - want) / se
    assert abs(z) < 4.0, (payoff, u.mean(), want, z)


@pytest.mark.parametrize(
    "payoff",
    [PayoffKind.TERMINAL, PayoffKind.ASIAN_GEOMETRIC, PayoffKind.CLIQUET],
)
def test_geometric_basket_curved_mean_matches_mc(payoff: PayoffKind) -> None:
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        build_basket_spec,
        expected_basket_underlier_mean,
        simulate_basket_underlier_rows,
    )

    spec = build_basket_spec(
        weights=(0.6, 0.4), correlation=((1.0, 0.3), (0.3, 1.0)),
        combine=BasketCombine.GEOMETRIC,
    ).expect("spec")
    contract = jnp.array([100.0, 0.02, 1.0, 0.04, 0.01, 0.25], jnp.float32)
    kwargs: dict = {}
    if payoff == PayoffKind.CLIQUET:
        kwargs = dict(cliquet_reset_every=4, cliquet_floor=0.0, cliquet_cap=0.05)
    want = float(
        expected_basket_underlier_mean(
            contract, spec, timesteps=T, payoff=payoff, dtype=jnp.float64,
            term=FULL_TERM, **kwargs,
        )
    )
    u = np.asarray(
        simulate_basket_underlier_rows(
            jax.random.PRNGKey(9), contract, spec=spec, timesteps=T, rows=512,
            cols=256, dtype=jnp.float32, payoff=payoff, term=FULL_TERM, **kwargs,
        ),
        dtype=np.float64,
    ).reshape(-1)
    se = u.std(ddof=1) / math.sqrt(u.size)
    z = (u.mean() - want) / se
    assert abs(z) < 4.0, (payoff, u.mean(), want, z)


# --------------------------------------------------------------------------
# trainer: curved non-GBM sims train, resume bit-exact, term preserved
# --------------------------------------------------------------------------


def test_heston_curved_trainer_resume_bit_exact() -> None:
    from spectralmc_tpu.models.factory import Activation, LinearCfg, build_cvnn_config
    from spectralmc_tpu.ops.sobol import BoundSpec
    from spectralmc_tpu.training.trainer import (
        GbmCVNNPricer,
        GbmCVNNPricerConfig,
        build_training_config,
    )

    sim = expect_success(
        build_simulation_params(
            timesteps=T, network_size=32, batches_per_mc_run=16, mc_seed=5,
            model=ModelKind.HESTON, term=RD_TERM,
        )
    )
    cvnn = build_cvnn_config(
        layers=[LinearCfg(width=16, activation=Activation.MODRELU)], seed=2
    ).expect("cvnn")
    bounds = {
        "spot": BoundSpec(lower=95.0, upper=105.0),
        "strike": BoundSpec(lower=95.0, upper=105.0),
        "maturity": BoundSpec(lower=0.5, upper=1.5),
        "rate": BoundSpec(lower=0.01, upper=0.05),
        "div_yield": BoundSpec(lower=0.0, upper=0.02),
        "v0": BoundSpec(lower=0.02, upper=0.08),
        "kappa": BoundSpec(lower=0.5, upper=2.5),
        "theta": BoundSpec(lower=0.02, upper=0.08),
        "xi": BoundSpec(lower=0.2, upper=0.8),
        "rho": BoundSpec(lower=-0.9, upper=-0.1),
    }
    pricer = GbmCVNNPricer.create(
        GbmCVNNPricerConfig(sim=sim, bounds=bounds, cvnn=cvnn)
    ).expect("pricer")
    cfg = build_training_config(num_batches=4, batch_size=8, learning_rate=1e-3).expect(
        "cfg"
    )
    pricer.train(cfg).expect("warm")
    snap = pricer.snapshot()
    assert snap.sim.term == RD_TERM  # the curve survives the checkpoint
    resumed = GbmCVNNPricer.create(snap).expect("resumed")
    r1 = pricer.train(cfg).expect("cont")
    r2 = resumed.train(cfg).expect("res")
    assert np.array_equal(np.asarray(r1.losses), np.asarray(r2.losses))
