"""Shared lab timing: the one sanctioned methodology for on-chip numbers.

Every ablation lab times through :func:`scanned_seconds_per_rep` so that all
published figures share bench.py's discipline (bench.py:56-90):

* reps are amortized INSIDE one jit via ``lax.scan`` — one dispatch per
  timed call, so per-dispatch tunnel latency cannot dominate;
* each scan iteration folds the loop index into the key, so no iteration is
  loop-invariant and XLA cannot hoist the work out of the scan;
* the scanned outputs are reduced to one f32 scalar and the timed call ends
  in ``float(...)`` — host materialization. Through the axon tunnel,
  ``block_until_ready`` alone under-reports (the round-3 american_lab
  printed 47x the honest number this way); float() is the ground truth.
* best-of-``calls`` rejects tunnel/scheduler noise (±10-30% run to run)
  without changing what is measured.

Labs must pass an ``fn`` that actually consumes its key; a key-ignoring fn
is loop-invariant and will be hoisted, yielding a meaningless time.

REPS SIZING (round 4, benchmarks/reps_probe.py): one timed call costs
~28 ms of tunnel round trip ON TOP of the device work — s/rep fits
``device + 28ms/reps`` across engines — so an under-repped lab
UNDER-reports by an additive per-rep artifact (at reps=20 that is
+1.4 ms/rep: larger than the American kernel itself). Size ``reps`` so a
call carries at least ~0.5 s of device work (artifact <= ~5%); sweep
reps with reps_probe.py when the device time is unknown.
"""

from __future__ import annotations

import argparse
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def scanned_seconds_per_rep(
    fn: Callable[[jax.Array], Any],
    key: jax.Array,
    *,
    reps: int,
    calls: int = 3,
) -> float:
    """Best-of-``calls`` wall seconds per rep of ``fn`` (key -> pytree).

    ``fn`` is scanned ``reps`` times inside one jit with a distinct folded
    key per iteration; outputs are sum-reduced to a scalar; each timed call
    materializes the scalar on host with float().
    """

    @jax.jit
    def run(k: jax.Array) -> jax.Array:
        def body(acc: jax.Array, i: jax.Array):
            out = fn(jax.random.fold_in(k, i))
            total = acc
            for leaf in jax.tree_util.tree_leaves(out):
                total = total + jnp.sum(leaf).astype(jnp.float32)
            return total, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    # Pre-derive keys outside the timed region; warm up twice (compile, then
    # the host-transfer path), exactly as bench.py does.
    keys = [jax.random.fold_in(key, 10_000 + c) for c in range(calls + 1)]
    float(run(keys[0]))
    float(run(keys[0]))
    best = float("inf")
    for k in keys[1:]:
        start = time.perf_counter()
        float(run(k))
        best = min(best, time.perf_counter() - start)
    return best / reps


def rate_line(
    name: str,
    fn: Callable[[jax.Array], Any],
    key: jax.Array,
    *,
    work: int,
    reps: int,
    calls: int = 3,
) -> float:
    """Time ``fn`` and print one aligned '<name>: <rate> path-steps/s' line.

    ``work`` is the per-rep unit count (e.g. rows*cols*timesteps); returns
    the rate in units/s.
    """
    sec = scanned_seconds_per_rep(fn, key, reps=reps, calls=calls)
    rate = work / sec
    print(f"{name:>14s}: {sec * 1e3:9.3f} ms  {rate:.3e} path-steps/s", flush=True)
    return rate


def lab_parser(description: str, *, default_reps: int) -> argparse.ArgumentParser:
    """Common lab CLI: never runs a chip job from ``--help``.

    Labs call ``parse_args()`` at the top of ``main()``; all work happens
    after parsing, so ``--help`` exits before any JAX dispatch.
    """
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--reps", type=int, default=default_reps,
        help=f"scanned reps per timed call (default {default_reps})",
    )
    p.add_argument(
        "--calls", type=int, default=3,
        help="timed calls per variant; best is kept (default 3)",
    )
    p.add_argument(
        "--quick", action="store_true",
        help="smallest shape / fewest reps only — a fast smoke run",
    )
    return p
