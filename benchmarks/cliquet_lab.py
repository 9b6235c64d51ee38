"""Cliquet-kernel ablation lab (run on a real TPU: `python benchmarks/cliquet_lab.py`).

Quantifies WHY the shipped cliquet engine samples per PERIOD instead of
walking per STEP (ops/gbm_pallas.py::_gbm_cliquet_block_kernel, stream
``gbm_cliquet``). Under flat log-Euler GBM the reset period's log-return
L_j = k·drift + vol·√dt·Σ z is an exact Gaussian sum, so the three
candidate designs price the SAME distribution:

  period      — the shipped kernel: ONE draw per period, two periods per
                fused sincos pair (work ∝ n_periods)
  xla         — the production XLA fallback scan (ops/gbm.py)
  terminal    — the TERMINAL pair-step kernel at the same shape (the
                per-step-kernel ceiling: what a reset-boundary-epilogue
                kernel could AT BEST reach, since it must draw every step
                and clipping is not free)

v5e numbers that set the shipped design: the round-3 run (512 steps x
16.7M paths, k=8, reps=3) printed "1.7–2.6e11 across runs" — that spread
was mostly the ~28 ms/call tunnel round trip divided by 3 reps
(benchmarks/_timing.py's reps-sizing note). At reps-sized timing the
period kernel measures a stable 1.03e12 path-steps/s at the bench shape
(64 steps x 2M paths, k=8; BENCH_r04) vs the XLA scan's 2.39e10 — 43x —
and ~5x the terminal kernel: drawing k× fewer normals beats any epilogue
engineering, which is why no per-step cliquet kernel ships.

Timing is the sanctioned scan+float() discipline (benchmarks/_timing.py);
the round-3 version used bare block_until_ready.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from benchmarks._timing import lab_parser, rate_line
from spectralmc_tpu.ops.gbm import PathScheme, PayoffKind, simulate_underlier_rows
from spectralmc_tpu.ops.gbm_pallas import (
    simulate_terminal_rows_pallas,
    simulate_underlier_rows_pallas,
)

T, R, C, K = 512, 16384, 1024, 8
FLOOR, CAP = 0.0, 0.08


def main() -> None:
    args = lab_parser(__doc__.splitlines()[0], default_reps=300).parse_args()
    CONTRACT = jnp.array([100.0, 0.05, 1.0, 0.03, 0.01, 0.35], jnp.float32)
    rows = 2048 if args.quick else R
    cq = dict(
        timesteps=T, rows=rows, cols=C, dtype=jnp.float32,
        scheme=PathScheme.LOG_EULER, payoff=PayoffKind.CLIQUET,
        cliquet_reset_every=K, cliquet_floor=FLOOR, cliquet_cap=CAP,
    )
    print(f"shape: {T} steps x {rows}x{C} paths, reset_every={K}")
    key = jax.random.PRNGKey(0)
    work = rows * C * T
    rate_line("period", lambda k: simulate_underlier_rows_pallas(k, CONTRACT, **cq),
              key, work=work, reps=args.reps, calls=args.calls)
    rate_line("terminal", lambda k: simulate_terminal_rows_pallas(
        k, CONTRACT, timesteps=T, rows=rows, cols=C,
        dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
    ), key, work=work, reps=args.reps, calls=args.calls)
    rate_line("xla", lambda k: simulate_underlier_rows(k, CONTRACT, **cq),
              key, work=work, reps=args.reps, calls=args.calls)


if __name__ == "__main__":
    main()
