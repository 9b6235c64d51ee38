"""Headline benchmark: GBM Monte-Carlo path throughput per chip.

The driver runs this on real TPU hardware and records the single JSON line
printed to stdout. The reference publishes no throughput numbers
(BASELINE.md: its own methodology review calls the benchmark nonexistent), so
``vs_baseline`` is measured against the BASELINE.json aspiration of 5x an
A100-class chip running the reference's Numba-CUDA kernel. Absent a measured
A100 number we use a documented engineering estimate for the reference
kernel's throughput ceiling: the kernel is RNG-bound; cuRAND philox + EM
stepping on A100 sustains ~2e10 path-steps/s in fp32 (80 SMs * ~2.5e8
path-steps/s/SM). vs_baseline = (our path-steps/s) / (5 * 2e10).

Secondary metrics (fused train steps/sec, char-fn MAE) print to stderr.

Usage: python bench.py [--tiny]   (--tiny: CPU-sized sanity run)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_PATH_STEPS_PER_SEC = 2.0e10  # documented estimate, see module docstring
BASELINE_MULTIPLier = 5.0


def bench_mc_throughput(*, timesteps: int, batches: int, network: int, reps: int) -> float:
    """Path-steps/sec of the GBM simulator (one chip)."""
    from spectralmc_tpu.ops.gbm import PathScheme, simulate_terminal_rows

    key = jax.random.PRNGKey(0)
    contract = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.25], dtype=jnp.float32)

    def run(k: jax.Array) -> jax.Array:
        rows = simulate_terminal_rows(
            k,
            contract,
            timesteps=timesteps,
            rows=batches,
            cols=network,
            dtype=jnp.float32,
            scheme=PathScheme.LOG_EULER,
        )
        return jnp.sum(rows)

    run_jit = jax.jit(run)
    run_jit(key).block_until_ready()  # compile
    start = time.perf_counter()
    acc = 0.0
    for i in range(reps):
        acc += float(run_jit(jax.random.fold_in(key, i)))
    elapsed = time.perf_counter() - start
    paths = batches * network
    return paths * timesteps * reps / elapsed


def bench_train_step(*, timesteps: int, batches: int, network: int, batch_size: int,
                     reps: int) -> float:
    """Fused train steps/sec (one chip)."""
    import __graft_entry__ as ge

    model, sim, table, carry = ge._build(
        dict(timesteps=timesteps, network_size=network, batches_per_mc_run=batches)
    )
    from spectralmc_tpu.training.step import make_fused_batch

    one = make_fused_batch(model, sim, table, batch_size=batch_size, learning_rate=1e-3)
    step = jax.jit(lambda c: one(c, None))
    carry, _ = step(carry)
    jax.block_until_ready(carry["params"])  # compile + warmup
    start = time.perf_counter()
    for _ in range(reps):
        carry, metrics = step(carry)
    jax.block_until_ready(carry["params"])
    return reps / (time.perf_counter() - start)


def main() -> None:
    tiny = "--tiny" in sys.argv
    if tiny:
        mc = dict(timesteps=16, batches=64, network=256, reps=3)
        tr = dict(timesteps=4, batches=8, network=32, batch_size=8, reps=3)
    else:
        # production-scale single-chip workload (BASELINE.json config 3 class)
        mc = dict(timesteps=64, batches=8192, network=256, reps=10)  # 2M paths
        tr = dict(timesteps=16, batches=512, network=128, batch_size=64, reps=5)

    path_steps_per_sec = bench_mc_throughput(**mc)
    steps_per_sec = bench_train_step(**tr)
    print(
        f"[bench] device={jax.devices()[0].platform} "
        f"train_steps_per_sec={steps_per_sec:.3f} "
        f"(B={tr['batch_size']} contracts x {tr['batches'] * tr['network']} paths x "
        f"{tr['timesteps']} steps each)",
        file=sys.stderr,
    )
    vs = path_steps_per_sec / (BASELINE_MULTIPLier * A100_REFERENCE_PATH_STEPS_PER_SEC)
    print(
        json.dumps(
            {
                "metric": "gbm_path_steps_per_sec_chip",
                "value": path_steps_per_sec,
                "unit": "path-steps/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
