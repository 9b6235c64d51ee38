"""Term-structure kernel lab (run on a real TPU: `python benchmarks/term_lab.py`).

Validates and measures the gbm_term Pallas kernel against the XLA scan at
the headline GBM shape (64 steps x 2M paths):

  stat gate   — curved-market terminal mean/std and the effective-Black put
                price must land within z < 4 of the exact oracle at 2M paths
                (the distributional check interpret mode cannot do).
  flat gate   — an exactly-flat TermStructure through the wrapper must be
                BIT-identical to the flat kernel on-chip.
  throughput  — path-steps/s: term kernel vs flat kernel vs XLA-with-term.
                The phase-shift pair-step should hold the term kernel within
                ~10% of the flat kernel (same transcendental count; the SMEM
                loads are scalar-unit work).

Timing is the sanctioned scan+float() discipline (benchmarks/_timing.py);
the round-3 version used bare block_until_ready.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import lab_parser, rate_line

from spectralmc_tpu.ops.analytic import term_effective_black
from spectralmc_tpu.ops.gbm import (
    BlackScholesContract,
    PathScheme,
    PayoffKind,
    TermStructure,
    simulate_terminal_rows,
)
from spectralmc_tpu.ops.gbm_pallas import (
    simulate_terminal_rows_pallas,
    simulate_underlier_rows_pallas,
)

CONTRACT = BlackScholesContract(
    spot=100.0, strike=105.0, maturity=1.0, rate=0.05, div_yield=0.01, vol=0.25
)
T, ROWS, COLS, REPS = 64, 8192, 256, 600
TERM = TermStructure(
    vol_shape=tuple(1.5 - 1.0 * i / T for i in range(T)),
    rate_shape=tuple(0.5 + 1.0 * i / T for i in range(T)),
)


def main() -> None:
    args = lab_parser(__doc__.splitlines()[0], default_reps=REPS).parse_args()
    print(f"device: {jax.devices()[0].device_kind}")
    arr = CONTRACT.as_array(jnp.float32)
    key = jax.random.PRNGKey(7)
    rows = 1024 if args.quick else ROWS
    kw = dict(timesteps=T, rows=rows, cols=COLS, dtype=jnp.float32)

    # --- stat gate -----------------------------------------------------
    term_fn = jax.jit(
        lambda k, a: simulate_underlier_rows_pallas(
            k, a, scheme=PathScheme.LOG_EULER, payoff=PayoffKind.TERMINAL,
            term=TERM, **kw,
        )
    )
    s_t = np.asarray(term_fn(key, arr), dtype=np.float64).reshape(-1)
    oracle = term_effective_black(
        CONTRACT.spot, CONTRACT.strike, CONTRACT.maturity,
        CONTRACT.rate, CONTRACT.div_yield, CONTRACT.vol,
        vol_shape=TERM.vol_shape, rate_shape=TERM.rate_shape, div_shape=(),
    )
    mv2 = float(np.mean(np.square(TERM.vol_shape)))
    mr = float(np.mean(TERM.rate_shape))
    fwd_want = CONTRACT.spot * np.exp(
        (CONTRACT.rate * mr - CONTRACT.div_yield) * CONTRACT.maturity
    )
    se = s_t.std(ddof=1) / np.sqrt(s_t.size)
    z_fwd = (s_t.mean() - fwd_want) / se
    df = float(np.exp(-CONTRACT.rate * mr * CONTRACT.maturity))
    puts = df * np.maximum(CONTRACT.strike - s_t, 0.0)
    z_put = (puts.mean() - float(oracle.put)) / (puts.std(ddof=1) / np.sqrt(puts.size))
    print(f"forward: mc {s_t.mean():.4f} want {fwd_want:.4f} z={z_fwd:+.2f}")
    print(f"put:     mc {puts.mean():.4f} want {float(oracle.put):.4f} z={z_put:+.2f}")
    assert abs(z_fwd) < 4.0 and abs(z_put) < 4.0, "STAT GATE FAILED"

    # --- flat bit-identity on-chip --------------------------------------
    flat_term = TermStructure(vol_shape=(1.0,) * T)
    base = simulate_terminal_rows_pallas(
        key, arr, scheme=PathScheme.LOG_EULER, **kw
    )
    via_wrapper = simulate_underlier_rows_pallas(
        key, arr, scheme=PathScheme.LOG_EULER, payoff=PayoffKind.TERMINAL,
        term=flat_term, **kw,
    )
    assert np.array_equal(np.asarray(base), np.asarray(via_wrapper)), (
        "flat-term wrapper is not the flat kernel's bit stream"
    )
    print("flat-term bit-identity: OK")

    # --- throughput ------------------------------------------------------
    flat_fn = jax.jit(
        lambda k, a: simulate_terminal_rows_pallas(
            k, a, scheme=PathScheme.LOG_EULER, **kw
        )
    )
    xla_fn = jax.jit(
        lambda k, a: simulate_terminal_rows(
            k, a, scheme=PathScheme.LOG_EULER, term=TERM, **kw
        )
    )
    steps = T * rows * COLS
    reps = min(args.reps, 10) if args.quick else args.reps
    for name, fn in (("flat kernel", flat_fn), ("term kernel", term_fn),
                     ("xla + term", xla_fn)):
        rate_line(name, lambda k, _fn=fn: _fn(k, arr), key,
                  work=steps, reps=reps, calls=args.calls)


if __name__ == "__main__":
    main()
