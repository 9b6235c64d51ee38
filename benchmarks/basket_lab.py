"""Basket-kernel lab: engine comparison + RNG-budget accounting.

Dev tool (not part of the library). A 3-asset basket step needs THREE
correlated normals plus a lower-triangular mix — on the XLA path that is 3x
the threefry budget of GBM plus a 3x3 einsum with nothing for the MXU. The
fused kernel (gbm_pallas._basket_block_kernel) draws shared Box-Muller pairs
(assets (2a, 2a+1) take r*cos / r*sin of one draw) and mixes in registers
with the Cholesky rows baked in as immediates.

Measured v5e-1 (64 steps x 2048x256 rows, reps-sized timing — the round-2
reps=40 figures carried ~0.7 ms/rep of tunnel artifact, BENCH_r04):

  basket3 XLA scan      6.0e9   path-steps/s
  GBM XLA scan          1.62e10 (same shape, for scale)
  basket3 Pallas kernel 4.08e10 (6.8x the XLA scan)

Budget check: per underlier step the basket kernel draws 2 uniform pairs +
2 sincos folds where the GBM pair-step amortizes half a pair — a ~7x
transcendental budget, putting 4.1e10 within ~1.4x of the GBM kernel's
2.1e11 per-normal efficiency curve (like Heston, the kernel is RNG-bound;
the residual is the unrolled mix/FMA chain over 3x state).

Statistical gates run on-chip before timing: arithmetic terminal mean vs the
analytic forward (|z| < 4) and the geometric basket put vs its closed form
(|z| < 4) at 524k paths.

Run: python benchmarks/basket_lab.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from benchmarks._timing import lab_parser

    lab_parser("Basket kernel vs XLA ablation", default_reps=400).parse_args()
    from spectralmc_tpu.ops.analytic import geometric_basket_price
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        build_basket_spec,
        simulate_basket_underlier_rows,
    )
    from spectralmc_tpu.ops.gbm import PathScheme, PayoffKind, simulate_terminal_rows
    from spectralmc_tpu.ops.gbm_pallas import simulate_basket_underlier_rows_pallas

    contract = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.25], jnp.float32)
    corr = ((1.0, 0.4, 0.2), (0.4, 1.0, 0.3), (0.2, 0.3, 1.0))
    spec_a = build_basket_spec(
        weights=(0.5, 0.3, 0.2), correlation=corr, combine=BasketCombine.ARITHMETIC
    ).expect("spec")
    spec_g = build_basket_spec(
        weights=(0.5, 0.3, 0.2), correlation=corr, combine=BasketCombine.GEOMETRIC
    ).expect("spec")
    on_tpu = jax.devices()[0].platform == "tpu"

    # ---- statistical gates (on-chip only: CPU stubs the hardware PRNG)
    if on_tpu:
        t, r, c = 16, 2048, 256
        out = simulate_basket_underlier_rows_pallas(
            jax.random.PRNGKey(3), contract, spec=spec_a, timesteps=t, rows=r,
            cols=c, dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
        )
        vals = np.asarray(out).ravel()
        fwd = sum(
            w * 100.0 * m for w, m in zip(spec_a.weights, spec_a.spot_multipliers)
        ) * np.exp(0.02)
        z = (vals.mean() - fwd) / (vals.std() / np.sqrt(vals.size))
        print(f"arith terminal mean z = {z:.2f}")
        assert abs(z) < 4.0, z
        out_g = simulate_basket_underlier_rows_pallas(
            jax.random.PRNGKey(5), contract, spec=spec_g, timesteps=t, rows=r,
            cols=c, dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
        )
        g = np.asarray(out_g).ravel()
        puts = np.exp(-0.03) * np.maximum(100.0 - g, 0.0)
        oracle = float(
            geometric_basket_price(
                jnp.float64(100.0), jnp.float64(100.0), jnp.float64(1.0),
                jnp.float64(0.03), jnp.float64(0.01), jnp.float64(0.25), spec=spec_g,
            ).put
        )
        z_p = (puts.mean() - oracle) / (puts.std() / np.sqrt(puts.size))
        print(f"geom basket put z = {z_p:.2f}")
        assert abs(z_p) < 4.0, z_p

    # ---- timings
    t, r, c, reps = (64, 2048, 256, 40) if on_tpu else (8, 128, 128, 2)

    def timed(fn) -> float:
        @jax.jit
        def run(key: jax.Array) -> jax.Array:
            def body(acc, i):
                return acc + jnp.sum(fn(jax.random.fold_in(key, i))), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        k = jax.random.PRNGKey(0)
        float(run(k))
        float(run(k))
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            float(run(k))
            best = min(best, time.perf_counter() - start)
        return r * c * t * reps / best

    variants = {
        "basket3_xla": lambda key: simulate_basket_underlier_rows(
            key, contract, spec=spec_a, timesteps=t, rows=r, cols=c,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
        ),
        "gbm_xla": lambda key: simulate_terminal_rows(
            key, contract, timesteps=t, rows=r, cols=c, dtype=jnp.float32,
            scheme=PathScheme.LOG_EULER,
        ),
    }
    if on_tpu:
        variants["basket3_pallas"] = lambda key: simulate_basket_underlier_rows_pallas(
            key, contract, spec=spec_a, timesteps=t, rows=r, cols=c,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL,
        )
    results = {name: timed(fn) for name, fn in variants.items()}
    print(json.dumps({k: f"{v:.3e}" for k, v in results.items()}))


if __name__ == "__main__":
    main()
