"""Example 11 — American options: Longstaff-Schwartz on TPU.

Early exercise on the timestep grid as one backward lax.scan; the oracle is
a Bermudan-aware binomial tree restricted to the SAME exercise dates. Run:
JAX_PLATFORMS=cpu python examples/11_american_options.py
"""

# Make the repo importable when run straight from a checkout
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor JAX_PLATFORMS even where a TPU plugin overrides the env var
import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax

from spectralmc_tpu.ops.american import bermudan_tree_price, lsmc_price
from spectralmc_tpu.ops.analytic import black_scholes_price
from spectralmc_tpu.ops.gbm import BlackScholesContract
from spectralmc_tpu.ops.greeks import OptionSide


def main() -> None:
    contract = BlackScholesContract(
        spot=100.0, strike=110.0, maturity=1.0, rate=0.05, div_yield=0.0, vol=0.25
    )
    dates = 16
    result = lsmc_price(
        jax.random.PRNGKey(7), contract, timesteps=dates, paths=1 << 17,
        option=OptionSide.PUT,
    )
    tree = bermudan_tree_price(
        spot=contract.spot, strike=contract.strike, maturity=contract.maturity,
        rate=contract.rate, div_yield=contract.div_yield, vol=contract.vol,
        exercise_dates=dates, option="put",
    )
    euro = float(
        black_scholes_price(
            contract.spot, contract.strike, contract.maturity,
            contract.rate, contract.div_yield, contract.vol,
        ).put
    )
    print(f"American put (K=110, r=5%): LSMC {result.price:.4f} ± {result.std_error:.4f}")
    print(f"  Bermudan tree (same {dates} dates): {tree:.4f}")
    print(f"  European (Black):                  {euro:.4f}")
    print(f"  early-exercise premium:            {result.price - result.european:.4f}")


if __name__ == "__main__":
    main()
