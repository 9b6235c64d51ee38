"""Merton-kernel ablation lab (run on a real TPU: `python benchmarks/merton_lab.py`).

Isolates the in-register Poisson sampler's cost inside the fused Merton
kernel. Variants (same draw order; count math varies):

  full        — scalar-cdf while_loop, early exit via max(u) (the kernel's
                original form; exact for any mu)
  nojump      — counts forced to 0 after drawing u_c (ceiling: diffusion+BM)
  nocount     — u_c never drawn (absolute ceiling; different stream)
  fixed8/16   — statically unrolled inverse-CDF terms, NO tail loop
  fixed8max   — fixed8 + the max(u) cross-lane reduction alone (cost probe)
  fixed8cond  — fixed8 + lax.cond'ed second block (exact to 16)
  whileconst  — while with a constant bound (no reduction, no early exit)
  unroll8tail — 8 unrolled terms + while tail (exact, bit-identical to full)

v5e numbers that set the SHIPPED sampler to fixed-16 (_POISSON_TERMS = 16,
ops/gbm_pallas.py): nocount 1.06e11, nojump 6.55e10, fixed8 5.47e10,
fixed16 4.36e10, fixed8max 4.76e10, fixed8cond 4.25e10, whileconst 5.7e9,
unroll8tail 3.03e10, full 2.79e10 path-steps/s — Mosaic's while machinery
costs 45% even at zero tail iterations, and for lam*dt <= ~3.2 the fixed-16
cap is unreachable by 24-bit uniforms, so fixed-16 trades nothing real.
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks._timing import lab_parser, scanned_seconds_per_rep
from spectralmc_tpu.ops.gbm_pallas import (
    _bm_radius,
    _fori_unrolled,
    _HALF_ULP,
    _poisson_counts,
    _sincos_turns,
    _uniform_24bit,
)

R, C, T = 4096, 16384, 64
BLOCK = (256, 256)
PARAMS = dict(
    spot=100.0, maturity=1.0, rate=0.03, div_yield=0.01,
    vol=0.2, lam=0.5, jump_mean=-0.1, jump_std=0.25,
)


def _poisson_while(u: jax.Array, mu: jax.Array) -> jax.Array:
    """The exact-any-mu while_loop sampler (the shipped kernel's ORIGINAL
    form, kept here as the lab baseline after fixed-16 replaced it): scalar
    cdf recursion, early exit once the cdf clears the block's max uniform."""
    p0 = jnp.exp(-mu)
    u_max = jnp.max(u)

    def cond(carry) -> jax.Array:
        k, _p, cdf, _cnt = carry
        return jnp.logical_and(k < jnp.float32(64.0), cdf <= u_max)

    def body(carry):
        k, p, cdf, cnt = carry
        cnt = cnt + (u >= cdf).astype(jnp.float32)
        p = p * mu / k
        cdf = cdf + p
        return (k + jnp.float32(1.0), p, cdf, cnt)

    _, _, _, cnt = jax.lax.while_loop(
        cond, body, (jnp.float32(1.0), p0, p0, jnp.zeros_like(u))
    )
    return cnt


def _poisson_unrolled_tail(u: jax.Array, mu: jax.Array, unroll: int = 8) -> jax.Array:
    """EXACT counts, bit-identical to _poisson_counts: the first `unroll`
    cdf levels are evaluated with static control flow (no scalar loop, no
    early-exit reduction), and the while tail runs only when the block's max
    uniform clears the unrolled cdf — rare for production lam*dt."""
    p = jnp.exp(-mu)
    cdf = p
    cnt = jnp.zeros_like(u)
    for k in range(1, unroll + 1):
        cnt = cnt + (u >= cdf).astype(jnp.float32)
        p = p * mu / jnp.float32(k)
        cdf = cdf + p

    u_max = jnp.max(u)

    def cond(carry) -> jax.Array:
        k, _p, cdf_, _c = carry
        return jnp.logical_and(k < jnp.float32(64.0), cdf_ <= u_max)

    def body(carry):
        k, p_, cdf_, c_ = carry
        c_ = c_ + (u >= cdf_).astype(jnp.float32)
        p_ = p_ * mu / k
        cdf_ = cdf_ + p_
        return (k + jnp.float32(1.0), p_, cdf_, c_)

    _, _, _, cnt = jax.lax.while_loop(
        cond, body, (jnp.float32(unroll + 1), p, cdf, cnt)
    )
    return cnt


def make_kernel(variant: str):
    def kernel(params_ref, seeds_ref, out_ref, *, timesteps: int) -> None:
        i = pl.program_id(0) + seeds_ref[0, 2]
        j = pl.program_id(1)
        seed_a = seeds_ref[0, 0] ^ ((i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF)
                                    + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF))
        seed_b = seeds_ref[0, 1] ^ ((j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF)
                                    + i * jnp.int32(0x27D4EB2F))
        pltpu.prng_seed(seed_a, seed_b)
        spot, maturity = params_ref[0, 0], params_ref[0, 1]
        rate, div_yield, vol = params_ref[0, 2], params_ref[0, 3], params_ref[0, 4]
        lam, jm, js = params_ref[0, 5], params_ref[0, 6], params_ref[0, 7]
        dt = maturity / jnp.float32(timesteps)
        vol_sdt = vol * jnp.sqrt(dt)
        m = jnp.exp(jm + jnp.float32(0.5) * js * js) - jnp.float32(1.0)
        drift = (rate - div_yield - lam * m - jnp.float32(0.5) * vol * vol) * dt
        lam_dt = lam * dt
        shape = BLOCK

        def step(logx):
            u1 = _uniform_24bit(shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(shape)
            radius = _bm_radius(u1)
            sin_t, cos_t = _sincos_turns(u2)
            z_d, z_j = radius * cos_t, radius * sin_t
            if variant == "nocount":
                jump = jnp.float32(0.0)
            else:
                u_c = _uniform_24bit(shape)

                def fixed_terms(n0: int, n1: int, p, cdf, cnt):
                    for k in range(n0, n1 + 1):
                        cnt = cnt + (u_c >= cdf).astype(jnp.float32)
                        p = p * lam_dt / jnp.float32(k)
                        cdf = cdf + p
                    return p, cdf, cnt

                if variant == "full":
                    cnt = _poisson_while(u_c, lam_dt)
                elif variant == "nojump":
                    cnt = jnp.float32(0.0) * u_c
                elif variant == "fixed8":
                    _, _, cnt = fixed_terms(
                        1, 8, jnp.exp(-lam_dt), jnp.exp(-lam_dt),
                        jnp.zeros(shape, jnp.float32),
                    )
                elif variant == "fixed16":
                    _, _, cnt = fixed_terms(
                        1, 16, jnp.exp(-lam_dt), jnp.exp(-lam_dt),
                        jnp.zeros(shape, jnp.float32),
                    )
                elif variant == "fixed8max":
                    # fixed8 + the cross-lane reduction alone (cost probe)
                    _, cdf, cnt = fixed_terms(
                        1, 8, jnp.exp(-lam_dt), jnp.exp(-lam_dt),
                        jnp.zeros(shape, jnp.float32),
                    )
                    cnt = cnt + jnp.float32(0.0) * jnp.max(u_c)
                elif variant == "fixed8cond":
                    # fixed8, then a lax.cond'ed second fixed block only when
                    # some lane still clears the cdf (exact to 16; beyond-16
                    # mass < 1e-6 for lam*dt <= 4)
                    p, cdf, cnt = fixed_terms(
                        1, 8, jnp.exp(-lam_dt), jnp.exp(-lam_dt),
                        jnp.zeros(shape, jnp.float32),
                    )
                    cnt = jax.lax.cond(
                        jnp.max(u_c) >= cdf,
                        lambda: fixed_terms(9, 16, p, cdf, cnt)[2],
                        lambda: cnt,
                    )
                elif variant == "whileconst":
                    # while with NO reduction: loop until the cdf clears the
                    # largest representable uniform (1 - 2^-24)
                    p0 = jnp.exp(-lam_dt)

                    def cond(carry):
                        k, _p, cdf_, _c = carry
                        return jnp.logical_and(
                            k < jnp.float32(64.0),
                            cdf_ <= jnp.float32(1.0 - 2.0**-24),
                        )

                    def body(carry):
                        k, p_, cdf_, c_ = carry
                        c_ = c_ + (u_c >= cdf_).astype(jnp.float32)
                        p_ = p_ * lam_dt / k
                        cdf_ = cdf_ + p_
                        return (k + jnp.float32(1.0), p_, cdf_, c_)

                    _, _, _, cnt = jax.lax.while_loop(
                        cond, body,
                        (jnp.float32(1.0), p0, p0, jnp.zeros(shape, jnp.float32)),
                    )
                else:  # unroll8tail
                    cnt = _poisson_unrolled_tail(u_c, lam_dt)
                jump = cnt * jm + js * jnp.sqrt(cnt) * z_j
            return logx + drift + vol_sdt * z_d + jump

        log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
        out_ref[:, :] = jnp.exp(_fori_unrolled(timesteps, step, log0))

    return kernel


def run(variant: str, *, rows: int = R, reps: int = 20, calls: int = 3) -> float:
    params = jnp.asarray(
        [[PARAMS["spot"], PARAMS["maturity"], PARAMS["rate"], PARAMS["div_yield"],
          PARAMS["vol"], PARAMS["lam"], PARAMS["jump_mean"], PARAMS["jump_std"]]],
        jnp.float32,
    )
    call = pl.pallas_call(
        functools.partial(make_kernel(variant), timesteps=T),
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(rows // BLOCK[0], C // BLOCK[1]),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(BLOCK, lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )

    def fn(k: jax.Array) -> jax.Array:
        # derive the kernel's SMEM seed triple from the scan key so no scan
        # iteration is loop-invariant (benchmarks/_timing.py requires it)
        seeds = jax.random.randint(k, (1, 3), 0, 2**31 - 1, jnp.int32)
        return call(params, seeds)

    out = jax.jit(fn)(jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(out).all())
    sec = scanned_seconds_per_rep(fn, jax.random.PRNGKey(1), reps=reps, calls=calls)
    return rows * C * T / sec


def main() -> None:
    args = lab_parser(__doc__.splitlines()[0], default_reps=200).parse_args()
    # exactness cross-checks before timing anything: the tail variant equals
    # the exact while sampler everywhere; the SHIPPED fixed-16 sampler
    # equals it wherever the cap is unreachable (lam*dt <= ~3.2)
    u = jax.random.uniform(jax.random.PRNGKey(0), (1 << 16,), jnp.float32)
    for mu in (0.01, 0.5, 3.0, 8.0):
        a = np.asarray(_poisson_while(u, jnp.float32(mu)))
        b = np.asarray(_poisson_unrolled_tail(u, jnp.float32(mu)))
        np.testing.assert_array_equal(a, b, err_msg=f"mu={mu}")
        if mu <= 3.2:
            c = np.asarray(_poisson_counts(u, jnp.float32(mu)))
            np.testing.assert_array_equal(a, c, err_msg=f"fixed16 mu={mu}")
    print("unroll8tail == while counts (all mu); fixed16 == while (mu <= 3.2)")
    rows = 512 if args.quick else R
    variants = ("fixed16", "full") if args.quick else (
        "nocount", "nojump", "fixed8", "fixed16", "fixed8max", "fixed8cond",
        "whileconst", "unroll8tail", "full",
    )
    for variant in variants:
        ps = run(variant, rows=rows, reps=args.reps, calls=args.calls)
        print(f"{variant:12s} {ps:.3e} path-steps/s", flush=True)


if __name__ == "__main__":
    main()
