"""American LSMC lab (run on a real TPU: `python benchmarks/american_lab.py`).

Measures where American pricing runtime lives, end to end, with the
fused-moment backward induction (ops/american.py::_lsmc_backward: every
Gram/rhs entry is a monomial moment reduction; the k×k solve is an
unrolled scalar Cholesky fused into the date body). Variants:

  xla_full      — the XLA engine end to end (scan forward + fused backward)
  kernel_full   — Pallas monitor-row forward + the SAME backward + encode
                  (the shipped simulate_american_underlier_rows_pallas)
  kernel_deg1   — kernel engine at basis_degree=1 (cheapest regression;
                  the gap to kernel_full isolates the basis/solve cost)
  terminal      — the European terminal kernel at the same shape (forward
                  ceiling: what the forward costs with NO row emission)

Timing is the sanctioned discipline (benchmarks/_timing.py): reps scanned
inside one jit, float()-materialized, best-of-calls. The round-3 version of
this lab used bare block_until_ready and over-reported 47x through the
axon tunnel; every number below supersedes it.

v5e, fused backward at reps-sized timing (r4; the first r4 numbers at
reps=20 still carried +1.4 ms/rep of tunnel round trip — see
benchmarks/_timing.py): at 1M paths x 16 dates kernel_full 0.93 ms
(1.80e10 path-steps/s) and xla_full 1.53 ms (1.09e10) vs 8.9 ms before
the fusion; the 4.19M-path shape reaches 1.82e10 with no cliff (the
round-3 283x cliff was the per-date [paths,k] basis materialization +
LU spilling at 4M paths — the moment reduction never materializes a
basis matrix at all).

Also sanity-gates the kernel statistically on-chip: the Pallas engine's
Bermudan price (mean of df*max(K-u, 0)) must land within z < 4 of the XLA
engine's at 1M paths, and both within ~1% of the CRR Bermudan tree.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import lab_parser, rate_line
from spectralmc_tpu.ops.american import (
    bermudan_tree_price,
    simulate_american_underlier_rows,
)
from spectralmc_tpu.ops.gbm import BlackScholesContract
from spectralmc_tpu.ops.gbm_pallas import (
    simulate_american_underlier_rows_pallas,
    simulate_terminal_rows_pallas,
)
from spectralmc_tpu.ops.greeks import OptionSide

CONTRACT = BlackScholesContract(
    spot=100.0, strike=100.0, maturity=1.0, rate=0.05, div_yield=0.0, vol=0.25
)


def run_shape(timesteps: int, rows: int, cols: int, reps: int, calls: int) -> None:
    arr = CONTRACT.as_array(jnp.float32)
    key = jax.random.PRNGKey(3)
    steps = timesteps * rows * cols
    print(f"--- shape T={timesteps} rows={rows} cols={cols} "
          f"({rows*cols/1e6:.2f}M paths) ---", flush=True)

    common = dict(timesteps=timesteps, rows=rows, cols=cols)

    def xla_full(k):
        return simulate_american_underlier_rows(
            k, arr, dtype=jnp.float32, option=OptionSide.PUT, **common
        )

    def kernel_full(k):
        return simulate_american_underlier_rows_pallas(
            k, arr, dtype=jnp.float32, option=OptionSide.PUT, **common
        )

    def kernel_fused(k):
        # round 5: Pallas forward + the fused backward (ops/lsmc_pallas.py)
        # — VMEM-resident where the carrier fits (1M shapes), the STREAMED
        # variant past the cap (the 4.2M shape: HBM carrier, one lagged
        # policy+moment sweep per date; measured 2.363 ms / 2.84e10 there,
        # 1.58x the shared backward that used to be the fallback)
        return simulate_american_underlier_rows_pallas(
            k, arr, dtype=jnp.float32, option=OptionSide.PUT,
            fused_backward=True, **common
        )

    def kernel_deg1(k):
        return simulate_american_underlier_rows_pallas(
            k, arr, dtype=jnp.float32, option=OptionSide.PUT,
            basis_degree=1, **common
        )

    def terminal(k):
        from spectralmc_tpu.ops.gbm import PathScheme

        return simulate_terminal_rows_pallas(
            k, arr, dtype=jnp.float32, scheme=PathScheme.LOG_EULER, **common
        )

    for name, fn in (
        ("xla_full", xla_full),
        ("kernel_full", kernel_full),
        ("kernel_fused", kernel_fused),
        ("kernel_deg1", kernel_deg1),
        ("terminal", terminal),
    ):
        rate_line(name, fn, key, work=steps, reps=reps, calls=calls)

    # statistical gate at this shape: engines agree and match the tree;
    # the fused backward consumes the SAME forward rows as kernel_full, so
    # its price must agree to the estimator's reduction-order jitter
    # (ops/lsmc_pallas.py stream-version story), far inside MC noise, and
    # only a vanishing fraction of paths may flip their exercise date.
    df = float(np.exp(-CONTRACT.rate * CONTRACT.maturity))
    u_x = np.asarray(jax.jit(xla_full)(key))
    u_p = np.asarray(jax.jit(kernel_full)(key))
    u_f = np.asarray(jax.jit(kernel_fused)(key))
    px = df * np.maximum(CONTRACT.strike - u_x, 0.0)
    pp = df * np.maximum(CONTRACT.strike - u_p, 0.0)
    pf = df * np.maximum(CONTRACT.strike - u_f, 0.0)
    se = np.sqrt(px.var() / px.size + pp.var() / pp.size)
    z = abs(px.mean() - pp.mean()) / se
    tree = bermudan_tree_price(
        spot=CONTRACT.spot, strike=CONTRACT.strike, maturity=CONTRACT.maturity,
        rate=CONTRACT.rate, div_yield=CONTRACT.div_yield, vol=CONTRACT.vol,
        exercise_dates=timesteps, option="put",
    )
    flipped = float(np.mean(u_f != u_p))
    print(f"price xla={px.mean():.4f} pallas={pp.mean():.4f} z={z:.2f} "
          f"tree={tree:.4f} rel_err_pallas={abs(pp.mean()-tree)/tree:.3%}",
          flush=True)
    print(f"fused backward: price={pf.mean():.4f} "
          f"rel_vs_shared={abs(pf.mean()-pp.mean())/pp.mean():.2e} "
          f"flipped={flipped:.2e}", flush=True)


def main() -> None:
    args = lab_parser(__doc__.splitlines()[0], default_reps=400).parse_args()
    print("device:", jax.devices()[0].device_kind, flush=True)
    shapes = [
        (16, 4096, 256),   # bench shape, 1M paths
        (16, 16384, 256),  # 4.2M paths (the round-3 cliff shape)
        (64, 4096, 256),   # denser exercise grid
    ]
    if args.quick:
        shapes = shapes[:1]
    for i, (t, r, c) in enumerate(shapes):
        reps = args.reps if i == 0 else max(args.reps // 2, 1)
        if args.quick:
            reps = min(reps, 5)
        run_shape(timesteps=t, rows=r, cols=c, reps=reps, calls=args.calls)


if __name__ == "__main__":
    main()
