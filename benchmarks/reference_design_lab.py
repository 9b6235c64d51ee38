"""Measure the REFERENCE'S design on OUR hardware: normals-matrix streaming.

The reference's hot path (``/root/reference/src/spectralmc/gbm.py:224-257``
+ ``async_normals.py``) pregenerates a ``[timesteps, paths]`` cuRAND normals
matrix in device memory, then steps every path reading one row per timestep
— the whole matrix streams through HBM. Our kernel generates normals
in-register inside VMEM. BASELINE.json's ``vs_baseline`` uses an engineering
estimate of that design's A100 ceiling (~2e10 path-steps/s); this lab
measures the SAME DESIGN on the same TPU chip as our kernel, giving a
hardware-controlled comparison no estimate can:

  variant "reference_design"  — materialize normals in HBM, then scan rows
  variant "fused_xla"         — our XLA path (counter-keyed, no matrix)
  variant "fused_pallas"      — our production kernel

Run: python benchmarks/reference_design_lab.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

# repo-root import WITHOUT PYTHONPATH: setting PYTHONPATH (to anything)
# breaks the axon TPU plugin's registration in this image.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

CONTRACT = (100.0, 100.0, 1.0, 0.03, 0.01, 0.25)


@functools.partial(jax.jit, static_argnames=("timesteps", "paths"))
def reference_design(key: jax.Array, contract: jax.Array, *, timesteps: int, paths: int):
    """The reference's two-phase structure: full normals matrix, then step."""
    spot, _, maturity, rate, div_yield, vol = (contract[i] for i in range(6))
    dt = maturity / timesteps
    drift = (rate - div_yield - 0.5 * vol * vol) * dt
    vol_sdt = vol * jnp.sqrt(dt)
    # phase 1: the normals matrix lives in HBM (reference async_normals pool)
    normals = jax.random.normal(key, (timesteps, paths), jnp.float32)

    # phase 2: walk timesteps consuming one row each (reference kernel loop)
    def body(logx, z_row):
        return logx + drift + vol_sdt * z_row, None

    log0 = jnp.full((paths,), jnp.log(spot), jnp.float32)
    log_t, _ = jax.lax.scan(body, log0, normals)
    return jnp.exp(log_t)


def bench(fn, key, reps: int, work: int) -> float:
    @jax.jit
    def run(k):
        def body(acc, i):
            out = fn(jax.random.fold_in(k, i))
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    float(run(key)); float(run(key))
    best = float("inf")
    for c in range(3):
        t0 = time.perf_counter()
        float(run(jax.random.fold_in(key, c)))
        best = min(best, time.perf_counter() - t0)
    return work * reps / best


def main() -> None:
    from benchmarks._timing import lab_parser

    args = lab_parser("HBM-normals reference design vs fused", default_reps=300).parse_args()
    from spectralmc_tpu.ops.gbm import PathScheme, simulate_terminal_rows
    from spectralmc_tpu.ops.gbm_pallas import simulate_terminal_rows_pallas

    timesteps, rows, cols, reps = 64, 8192, 256, args.reps
    if args.quick:
        rows, reps = 1024, min(reps, 10)
    paths = rows * cols
    contract = jnp.array(CONTRACT, jnp.float32)
    key = jax.random.PRNGKey(0)
    work = paths * timesteps

    rate_ref = bench(
        lambda k: reference_design(k, contract, timesteps=timesteps, paths=paths),
        key, reps, work,
    )
    rate_xla = bench(
        lambda k: simulate_terminal_rows(
            k, contract, timesteps=timesteps, rows=rows, cols=cols,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
        ),
        key, reps, work,
    )
    rate_pallas = bench(
        lambda k: simulate_terminal_rows_pallas(
            k, contract, timesteps=timesteps, rows=rows, cols=cols,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
        ),
        key, reps, work,
    )
    print(f"reference_design (HBM normals matrix): {rate_ref:.3e} path-steps/s")
    print(f"fused_xla (counter-keyed, no matrix):  {rate_xla:.3e} path-steps/s")
    print(f"fused_pallas (in-VMEM, hw PRNG):       {rate_pallas:.3e} path-steps/s")
    print(f"pallas vs reference design, same chip: {rate_pallas / rate_ref:.1f}x")


if __name__ == "__main__":
    main()
