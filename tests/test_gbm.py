"""GBM Monte-Carlo engine tests (parity: reference tests/test_gbm.py).

Gates mirror the reference's statistical validation against the analytic
Black-Scholes oracle (z-score outliers <=5%, RMSPE <= 0.15) and the snapshot
determinism contract, at CPU-sized workloads.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.core.errors.gbm import InvalidSimulationParams, MemoryLimitExceeded
from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.ops.analytic import black_scholes_price
from spectralmc_tpu.ops.gbm import (
    BlackScholes,
    BlackScholesContract,
    ForwardNormalization,
    PathScheme,
    build_simulation_params,
)
from spectralmc_tpu.ops.sobol import SobolConfig, SobolSampler
from tests.helpers import expect_failure, expect_success
from tests.helpers.constants import STAT_BATCHES, STAT_CONTRACTS, STAT_NETWORK_SIZE
from tests.helpers.factories import CONTRACT_BOUNDS, make_contract, make_simulation_params


def test_build_params_validation() -> None:
    assert isinstance(
        expect_failure(
            build_simulation_params(
                timesteps=0, network_size=8, batches_per_mc_run=1, mc_seed=1
            )
        ),
        InvalidSimulationParams,
    )
    err = expect_failure(
        build_simulation_params(
            timesteps=1, network_size=1 << 16, batches_per_mc_run=1 << 16, mc_seed=1
        )
    )
    assert isinstance(err, MemoryLimitExceeded)
    err64 = expect_failure(
        build_simulation_params(
            timesteps=1,
            network_size=1 << 15,
            batches_per_mc_run=1 << 15,
            mc_seed=1,
            precision=Precision.float64,
        )
    )
    assert isinstance(err64, MemoryLimitExceeded)
    assert isinstance(
        expect_failure(
            build_simulation_params(
                timesteps=1,
                network_size=8,
                batches_per_mc_run=1,
                mc_seed=1,
                precision=Precision.complex64,
            )
        ),
        InvalidSimulationParams,
    )


@pytest.mark.parametrize("precision", [Precision.float32, Precision.float64])
def test_mc_matches_analytic_oracle(precision: Precision) -> None:
    """z-score & RMSPE gates vs the closed-form Black price (ref test_gbm.py:100-140)."""
    params = make_simulation_params(
        timesteps=1,
        network_size=STAT_NETWORK_SIZE,
        batches_per_mc_run=STAT_BATCHES,
        mc_seed=2024,
        precision=precision,
    )
    sampler = expect_success(
        SobolSampler.create(BlackScholesContract, CONTRACT_BOUNDS, SobolConfig(seed=11))
    )
    contracts, _ = sampler.sample(STAT_CONTRACTS)
    engine = BlackScholes(params)

    zs: list[float] = []
    rel_errs: list[float] = []
    for contract in contracts:
        prices, engine = engine.price(contract)
        payoffs = np.asarray(prices.put_payoffs)
        mc_price = payoffs.mean()
        stderr = payoffs.std(ddof=1) / np.sqrt(payoffs.size)
        analytic = float(
            black_scholes_price(
                contract.spot,
                contract.strike,
                contract.maturity,
                contract.rate,
                contract.div_yield,
                contract.vol,
            ).put
        )
        if stderr > 0:
            zs.append((mc_price - analytic) / stderr)
        if analytic > 0.5:  # relative error is meaningless for near-zero prices
            rel_errs.append((mc_price - analytic) / analytic)

    outliers = sum(abs(z) > 3 for z in zs) / len(zs)
    rmspe = float(np.sqrt(np.mean(np.square(rel_errs))))
    assert outliers <= 0.05, f"z>3 outliers {outliers:.2%}, zs={zs}"
    assert rmspe <= 0.15, f"RMSPE {rmspe}"


def test_snapshot_resume_equals_continuous() -> None:
    """Restored engine reproduces continued prices exactly (ref test_gbm.py:143-156)."""
    params = make_simulation_params(timesteps=4, network_size=32, batches_per_mc_run=8)
    contract = make_contract()
    engine = BlackScholes(params)
    continued: list[float] = []
    for i in range(6):
        host, engine = engine.price_to_host(contract)
        continued.append(host.put)
        if i == 2:
            snap = engine.snapshot()
    restored = BlackScholes(snap)
    for expected in continued[3:]:
        host, restored = restored.price_to_host(contract)
        assert host.put == expected  # bit-exact, not approx


@pytest.mark.parametrize("scheme", [PathScheme.LOG_EULER, PathScheme.EULER])
def test_schemes_converge_to_forward(scheme: PathScheme) -> None:
    params = make_simulation_params(
        timesteps=16,
        network_size=64,
        batches_per_mc_run=64,
        scheme=scheme,
        normalization=ForwardNormalization.NONE,
    )
    contract = make_contract(vol=0.2)
    engine = BlackScholes(params)
    prices, _ = engine.price(contract)
    # E[X_T] = forward: discounted call - put = df*(E[X_T] - K)
    mean_terminal = float(
        (jnp.mean(prices.call_payoffs) - jnp.mean(prices.put_payoffs))
        / prices.discount_factor
        + contract.strike
    )
    assert abs(mean_terminal - float(prices.forward)) / float(prices.forward) < 0.02


def test_forward_normalization_pins_mean() -> None:
    params = make_simulation_params(
        timesteps=4, network_size=32, batches_per_mc_run=8,
        normalization=ForwardNormalization.MEAN,
    )
    contract = make_contract()
    engine = BlackScholes(params)
    prices, _ = engine.price(contract)
    mean_terminal = float(
        (jnp.mean(prices.call_payoffs) - jnp.mean(prices.put_payoffs)) / prices.discount_factor
        + contract.strike
    )
    np.testing.assert_allclose(mean_terminal, float(prices.forward), rtol=1e-5)


def test_full_path_matrix_layout_and_normalization() -> None:
    from spectralmc_tpu.ops.gbm import simulate_paths
    import jax

    key = jax.random.PRNGKey(0)
    contract = make_contract().as_array(jnp.float64)
    rows = simulate_paths(
        key, contract, timesteps=8, paths=4096, dtype=jnp.float64,
        scheme=PathScheme.LOG_EULER, normalize=True,
    )
    assert rows.shape == (8, 4096)
    c = make_contract()
    dt = c.maturity / 8
    for t in range(8):
        fwd = c.spot * np.exp((c.rate - c.div_yield) * dt * (t + 1))
        np.testing.assert_allclose(float(jnp.mean(rows[t])), fwd, rtol=1e-10)


def test_skip_advances_per_price_call() -> None:
    params = make_simulation_params()
    engine = BlackScholes(params)
    _, engine = engine.price(make_contract())
    _, engine = engine.price(make_contract())
    assert engine.params.skip == 2
