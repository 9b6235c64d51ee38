"""Config factories (parity: reference tests/helpers/factories.py:63-341)."""

from __future__ import annotations

from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.ops.gbm import (
    BlackScholesContract,
    SimulationParams,
    build_simulation_params,
)
from spectralmc_tpu.ops.sobol import BoundSpec, SobolConfig
from tests.helpers.result_utils import expect_success

CONTRACT_BOUNDS: dict[str, BoundSpec] = {
    "spot": BoundSpec(lower=50.0, upper=150.0),
    "strike": BoundSpec(lower=50.0, upper=150.0),
    "maturity": BoundSpec(lower=0.2, upper=2.0),
    "rate": BoundSpec(lower=0.0, upper=0.10),
    "div_yield": BoundSpec(lower=0.0, upper=0.05),
    "vol": BoundSpec(lower=0.10, upper=0.50),
}


def make_contract(**overrides: float) -> BlackScholesContract:
    base = dict(spot=100.0, strike=100.0, maturity=1.0, rate=0.03, div_yield=0.01, vol=0.25)
    base.update(overrides)
    return BlackScholesContract(**base)


def make_simulation_params(
    *,
    timesteps: int = 4,
    network_size: int = 32,
    batches_per_mc_run: int = 8,
    mc_seed: int = 7,
    skip: int = 0,
    precision: Precision = Precision.float32,
    **kwargs: object,
) -> SimulationParams:
    return expect_success(
        build_simulation_params(
            timesteps=timesteps,
            network_size=network_size,
            batches_per_mc_run=batches_per_mc_run,
            mc_seed=mc_seed,
            skip=skip,
            precision=precision,
            **kwargs,
        )
    )


def make_sobol_config(seed: int = 123, skip: int = 0) -> SobolConfig:
    return SobolConfig(seed=seed, skip=skip)
