"""Probe: does seconds-per-rep depend on the scanned rep count?

Through the axon tunnel every timed call pays one host round trip. The
sanctioned timing (benchmarks/_timing.py) divides it by ``reps``, so a
too-small rep count leaves an additive per-rep artifact:
s/rep = device_time + tunnel_overhead / reps. Sweeping reps at a fixed
shape separates the two: if s/rep falls as reps grows, the small-reps
figures were inflated by the tunnel, not by the device.

Run on-chip: python benchmarks/reps_probe.py [--shape american|terminal]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from benchmarks._timing import scanned_seconds_per_rep
from spectralmc_tpu.ops.gbm import BlackScholesContract, PathScheme


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reps", type=int, nargs="*", default=[10, 20, 50, 100, 200, 400])
    p.add_argument("--calls", type=int, default=3)
    args = p.parse_args()

    contract = BlackScholesContract(
        spot=100.0, strike=110.0, maturity=1.0, rate=0.05, div_yield=0.0, vol=0.25
    )
    arr = contract.as_array(jnp.float32)
    key = jax.random.PRNGKey(3)
    print("device:", jax.devices()[0].device_kind, flush=True)

    from spectralmc_tpu.ops.american import simulate_american_underlier_rows
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_american_underlier_rows_pallas,
        simulate_terminal_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    T, rows, cols = 16, 4096, 256  # the bench shape, 1.05M paths
    steps = T * rows * cols

    def terminal(k: jax.Array) -> jax.Array:
        return simulate_terminal_rows_pallas(
            k, arr, timesteps=T, rows=rows, cols=cols,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
        )

    def american_pallas(k: jax.Array) -> jax.Array:
        return simulate_american_underlier_rows_pallas(
            k, arr, timesteps=T, rows=rows, cols=cols,
            dtype=jnp.float32, option=OptionSide.PUT,
        )

    def american_xla(k: jax.Array) -> jax.Array:
        return simulate_american_underlier_rows(
            k, arr, timesteps=T, rows=rows, cols=cols,
            dtype=jnp.float32, option=OptionSide.PUT,
        )

    for name, fn in (
        ("terminal_kernel", terminal),
        ("american_pallas", american_pallas),
        ("american_xla", american_xla),
    ):
        for reps in args.reps:
            s = scanned_seconds_per_rep(fn, key, reps=reps, calls=args.calls)
            print(
                f"{name:16s} reps={reps:4d}  {s*1e3:8.3f} ms/rep  "
                f"{steps/s:.3e} path-steps/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
