"""Heston-kernel variant lab: where do the cycles go, and what can be shaved?

Dev tool (not part of the library). The GBM kernel runs at ~1.68e11
path-steps/s; Heston at ~4.7e10. A Heston step inherently needs TWO normals
(variance + orthogonal spot component) where GBM's pair-stepping amortizes
ONE per two steps — a ~4x transcendental budget — so ~4.2e10 is the naive
expectation. Variants probe the remaining slack:

  baseline       — the production kernel body (gbm_pallas._heston_block_kernel)
  fused_sincos   — one fold + shared x^2 powers for sin AND cos
  hoisted        — variance recursion with host-precomputed scalars
                   (1-kappa*dt, kappa*theta*dt, xi*sqrt_dt) + sqrt(v*dt) fusion
  phase_shift    — z_s = r*sin(theta + phi) with phi=asin(rho) precomputed
                   host-side (removes the rho/rho_bar linear combine)
  all            — fused_sincos + hoisted + phase_shift
  norng          — RNG replaced by a constant (upper bound: everything else)
  rngonly        — RNG + sum only (upper bound: normals generation alone)

Run: python benchmarks/heston_lab.py [--block ROWSxCOLS]
"""

from __future__ import annotations

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_2_24 = float(2.0**-24)
_HALF_ULP = float(2.0**-25)
_TWO_PI = 2.0 * math.pi


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(_INV_2_24)


def _sin_turns(t):
    qf = jnp.round(jnp.float32(2.0) * t)
    x = jnp.float32(_TWO_PI) * (t - jnp.float32(0.5) * qf)
    sign = jnp.where(qf.astype(jnp.int32) & 1, jnp.float32(-1.0), jnp.float32(1.0))
    y = x * x
    p = jnp.float32(2.7557319e-6)
    p = p * y + jnp.float32(-1.9841270e-4)
    p = p * y + jnp.float32(8.3333333e-3)
    p = p * y + jnp.float32(-1.6666667e-1)
    p = p * y + jnp.float32(1.0)
    return sign * x * p


def _sincos_turns(t):
    """(sin(2*pi*t), cos(2*pi*t)) with ONE fold and shared x^2 powers."""
    qf = jnp.round(jnp.float32(2.0) * t)
    x = jnp.float32(_TWO_PI) * (t - jnp.float32(0.5) * qf)
    sign = jnp.where(qf.astype(jnp.int32) & 1, jnp.float32(-1.0), jnp.float32(1.0))
    y = x * x
    ps = jnp.float32(2.7557319e-6)
    ps = ps * y + jnp.float32(-1.9841270e-4)
    ps = ps * y + jnp.float32(8.3333333e-3)
    ps = ps * y + jnp.float32(-1.6666667e-1)
    ps = ps * y + jnp.float32(1.0)
    pc = jnp.float32(2.4801587e-5)
    pc = pc * y + jnp.float32(-1.3888889e-3)
    pc = pc * y + jnp.float32(4.1666667e-2)
    pc = pc * y + jnp.float32(-5.0e-1)
    pc = pc * y + jnp.float32(1.0)
    return sign * x * ps, sign * pc  # cos folds with the same half-turn sign


def make_kernel(variant: str, timesteps: int, shape):
    def kernel(params_ref, seeds_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        seed_a = seeds_ref[0, 0] ^ ((i + 1) * jnp.int32(0x1E3779B1) + j * jnp.int32(0x05EBCA6B))
        seed_b = seeds_ref[0, 1] ^ ((j + 1) * jnp.int32(0x42B2AE35) + i * jnp.int32(0x27D4EB2F))
        pltpu.prng_seed(seed_a, seed_b)
        spot = params_ref[0, 0]
        maturity = params_ref[0, 2]
        rate = params_ref[0, 3]
        div_yield = params_ref[0, 4]
        v0 = params_ref[0, 5]
        kappa = params_ref[0, 6]
        theta = params_ref[0, 7]
        xi = params_ref[0, 8]
        rho = params_ref[0, 9]
        phase_turns = params_ref[0, 10]  # asin(rho)/(2*pi), host-precomputed
        dt = maturity / jnp.float32(timesteps)
        sqrt_dt = jnp.sqrt(dt)
        rho_bar = jnp.sqrt(jnp.float32(1.0) - rho * rho)
        rq_dt = (rate - div_yield) * dt
        one_m_kdt = jnp.float32(1.0) - kappa * dt
        ktheta_dt = kappa * theta * dt
        xi_sdt = xi * sqrt_dt

        if variant == "rngonly":
            def step(t, acc):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                zv = r * _sin_turns(u2 + jnp.float32(0.25))
                zw = r * _sin_turns(u2)
                return acc + zv + zw

            out_ref[:, :] = jax.lax.fori_loop(
                0, timesteps, step, jnp.zeros(shape, jnp.float32)
            )
            return

        if variant == "norng":
            def step(t, carry):
                logx, v = carry
                z_v = jnp.full(shape, 0.1, jnp.float32)
                z_w = jnp.full(shape, -0.1, jnp.float32)
                z_s = rho * z_v + rho_bar * z_w
                v_plus = jnp.maximum(v, jnp.float32(0.0))
                sqrt_v = jnp.sqrt(v_plus)
                logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v * sqrt_dt * z_s
                v = v + kappa * (theta - v_plus) * dt + xi * sqrt_v * sqrt_dt * z_v
                return (logx, v)

            log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
            vinit = jnp.full(shape, 1.0, jnp.float32) * v0
            logx, _ = jax.lax.fori_loop(0, timesteps, step, (log0, vinit))
            out_ref[:, :] = jnp.exp(logx)
            return

        use_sincos = variant in ("fused_sincos", "all", "sincos_hoist")
        use_hoist = variant in ("hoisted", "all", "sincos_hoist")
        use_phase = variant in ("phase_shift", "all")

        def step(t, carry):
            logx, v = carry
            u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform(shape)
            r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
            if use_phase:
                # z_v = r*cos(theta); z_s = rho*z_v + rho_bar*r*sin(theta)
                #     = r*sin(theta + phi) with sin(phi)=rho, cos(phi)=rho_bar
                z_v = r * _sin_turns(u2 + jnp.float32(0.25))
                z_s = r * _sin_turns(u2 + phase_turns)
            elif use_sincos:
                s, c = _sincos_turns(u2)
                z_v = r * c
                z_s = rho * z_v + rho_bar * (r * s)
            else:
                z_v = r * _sin_turns(u2 + jnp.float32(0.25))
                z_s = rho * z_v + rho_bar * (r * _sin_turns(u2))
            v_plus = jnp.maximum(v, jnp.float32(0.0))
            if use_hoist:
                sqrt_v_sdt = jnp.sqrt(v_plus * dt)
                logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v_sdt * z_s
                v = v_plus * one_m_kdt + ktheta_dt + xi * sqrt_v_sdt * z_v
            else:
                sqrt_v = jnp.sqrt(v_plus)
                logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v * sqrt_dt * z_s
                v = v + kappa * (theta - v_plus) * dt + xi * sqrt_v * sqrt_dt * z_v
            return (logx, v)

        log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
        vinit = jnp.full(shape, 1.0, jnp.float32) * v0
        logx, _ = jax.lax.fori_loop(0, timesteps, step, (log0, vinit))
        out_ref[:, :] = jnp.exp(logx)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "timesteps", "rows", "cols", "br", "bc"))
def simulate(variant, key, contract, *, timesteps, rows, cols, br, bc):
    key_data = jax.random.key_data(key)
    seeds = key_data.astype(jnp.int32).reshape(1, 2)
    rho = contract[9]
    phase = jnp.arcsin(rho) / jnp.float32(_TWO_PI)
    params = jnp.concatenate([contract, phase.reshape(1)]).astype(jnp.float32).reshape(1, 11)
    kernel = make_kernel(variant, timesteps, (br, bc))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(rows // br, cols // bc),
            in_specs=[
                pl.BlockSpec((1, 11), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(params, seeds)


def main() -> None:
    from benchmarks._timing import lab_parser

    parser = lab_parser("Heston kernel variant ablation", default_reps=300)
    parser.add_argument("--block", type=str, default="256x256",
                        help="kernel block as RxC (default 256x256)")
    args = parser.parse_args()
    rows, cols, timesteps, reps = 8192, 256, 64, args.reps
    if args.quick:
        rows, reps = 1024, min(reps, 20)
    br, bc = map(int, args.block.split("x"))
    contract = jnp.array(
        [100.0, 100.0, 1.0, 0.03, 0.01, 0.04, 1.5, 0.04, 0.5, -0.7], jnp.float32
    )
    key = jax.random.PRNGKey(0)
    variants = [
        "baseline", "fused_sincos", "hoisted", "phase_shift", "all",
        "sincos_hoist", "norng", "rngonly",
    ]
    for variant in variants:
        @jax.jit
        def run(k, _v=variant):
            def body(acc, i):
                out = simulate(_v, jax.random.fold_in(k, i), contract,
                               timesteps=timesteps, rows=rows, cols=cols, br=br, bc=bc)
                return acc + jnp.sum(out), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        float(run(key)); float(run(key))
        best = float("inf")
        for c in range(3):
            t0 = time.perf_counter()
            float(run(jax.random.fold_in(key, c)))
            best = min(best, time.perf_counter() - t0)
        rate = rows * cols * timesteps * reps / best
        print(f"{variant:14s} block=({br},{bc}) {rate:.3e} path-steps/s")


if __name__ == "__main__":
    main()
