"""Kernel-variant lab: isolate what's slow in the fused GBM Pallas kernel.

Dev tool (not part of the library). Each variant swaps one piece of the
Box-Muller + log-Euler pipeline so per-op costs on the VPU can be measured on
real hardware. Run: python benchmarks/pallas_lab.py
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

_TWO_PI = 2.0 * math.pi
_INV_2_24 = float(2.0**-24)
_HALF_ULP = float(2.0**-25)


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(_INV_2_24)


def make_kernel(variant: str, timesteps: int, shape):
    def kernel(params_ref, seeds_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        spot = params_ref[0, 0]
        rate = params_ref[0, 3]
        div_yield = params_ref[0, 4]
        vol = params_ref[0, 5]
        seed_a = seeds_ref[0, 0] ^ ((i + 1) * jnp.int32(0x1E3779B1) + j * jnp.int32(0x05EBCA6B))
        seed_b = seeds_ref[0, 1] ^ ((j + 1) * jnp.int32(0x42B2AE35) + i * jnp.int32(0x27D4EB2F))
        pltpu.prng_seed(seed_a, seed_b)
        maturity = params_ref[0, 2]
        dt = maturity / jnp.float32(timesteps)
        sqrt_dt = jnp.sqrt(dt)
        vol_sdt = vol * sqrt_dt
        drift = (rate - div_yield - jnp.float32(0.5) * vol * vol) * dt

        if variant == "baseline":  # current production kernel body
            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                radius = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                angle = jnp.float32(_TWO_PI) * u2
                z_sum = radius * (jnp.cos(angle) + jnp.sin(angle))
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant == "rng_only":  # just RNG + fma, no transcendentals
            def step(t, logx):
                u1 = _uniform(shape)
                u2 = _uniform(shape)
                z_sum = (u1 + u2 - jnp.float32(1.0)) * jnp.float32(3.464)
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant == "log_only":
            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                z_sum = jnp.log(u1) * (u2 - jnp.float32(0.5))
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant == "sincos_only":
            def step(t, logx):
                u1 = _uniform(shape)
                u2 = _uniform(shape)
                angle = jnp.float32(_TWO_PI) * u2
                z_sum = (u1 - jnp.float32(0.5)) * (jnp.cos(angle) + jnp.sin(angle))
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant == "sqrtlog":
            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                radius = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                z_sum = radius * (u2 - jnp.float32(0.5)) * jnp.float32(2.0)
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant == "erfinv":  # one normal per step via inverse CDF
            def step(t, logx):
                u = _uniform(shape)
                z = jax.lax.erf_inv(jnp.float32(2.0) * u - jnp.float32(1.0) + jnp.float32(2.0**-24))
                z = z * jnp.float32(math.sqrt(2.0))
                return logx + drift + vol_sdt * z
            n_iters = timesteps
        elif variant == "clt8":  # sum of 8 uniforms (no transcendentals at all)
            def step(t, logx):
                acc = _uniform(shape)
                for _ in range(7):
                    acc = acc + _uniform(shape)
                z = (acc - jnp.float32(4.0)) * jnp.float32(math.sqrt(12.0 / 8.0))
                return logx + drift + vol_sdt * z
            n_iters = timesteps
        elif variant == "polybm_bits":
            # Like polybm, but uniforms via exponent-splice bitcast:
            # 0x3F800000 | (bits >> 9) is a float in [1, 2) with a 23-bit
            # uniform mantissa; subtracting 1 gives [0, 1) with no int->float
            # cast on the hot path.
            def u01(shape_):
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape_), jnp.uint32)
                f = pltpu.bitcast(
                    jnp.uint32(0x3F800000) | (bits >> jnp.uint32(9)), jnp.float32
                )
                return f - jnp.float32(1.0)

            def sin_folded2(t):
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

            def step(t, logx):
                u1 = u01(shape) + jnp.float32(2.0**-24)
                u2 = u01(shape)
                radius = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                z_sum = radius * jnp.float32(math.sqrt(2.0)) * sin_folded2(
                    u2 + jnp.float32(0.125)
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant in ("polybm_fastlog", "polybm_fastlog_s"):
            # polybm + bit-extraction ln: x = 2^e * m with m in [sqrt2/2, sqrt2)
            # (sqrt2-centered so u near 1 lands at w near 0, where the series
            # error VANISHES — no cancellation against e*ln2). ln m via
            # Taylor deg-9 in w = m-1 (no divide) or the atanh s-form
            # (one divide, error ~s^9).
            _SQRT2_MANT = 0x3504F3  # mantissa bits of sqrt(2)
            _LN2 = 0.6931471805599453

            def fast_ln(x):
                b = pltpu.bitcast(x, jnp.uint32)
                mant = b & jnp.uint32(0x007FFFFF)
                adj = (mant > jnp.uint32(_SQRT2_MANT)).astype(jnp.int32)
                e = (
                    pltpu.bitcast(b >> jnp.uint32(23), jnp.int32)
                    - jnp.int32(127)
                    + adj
                )
                m = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32)
                m = jnp.where(adj, m * jnp.float32(0.5), m)
                if variant == "polybm_fastlog_s":
                    s = (m - jnp.float32(1.0)) / (m + jnp.float32(1.0))
                    y = s * s
                    p = jnp.float32(2.0 / 7.0)
                    p = p * y + jnp.float32(2.0 / 5.0)
                    p = p * y + jnp.float32(2.0 / 3.0)
                    p = p * y + jnp.float32(2.0)
                    ln_m = s * p
                else:
                    w = m - jnp.float32(1.0)
                    p = jnp.float32(1.0 / 9.0)
                    p = p * w + jnp.float32(-1.0 / 8.0)
                    p = p * w + jnp.float32(1.0 / 7.0)
                    p = p * w + jnp.float32(-1.0 / 6.0)
                    p = p * w + jnp.float32(1.0 / 5.0)
                    p = p * w + jnp.float32(-0.25)
                    p = p * w + jnp.float32(1.0 / 3.0)
                    p = p * w + jnp.float32(-0.5)
                    p = p * w + jnp.float32(1.0)
                    ln_m = w * p
                return e.astype(jnp.float32) * jnp.float32(_LN2) + ln_m

            def sin_folded3(t):
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

            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                radius = jnp.sqrt(jnp.float32(-2.0) * fast_ln(u1))
                z_sum = radius * jnp.float32(math.sqrt(2.0)) * sin_folded3(
                    u2 + jnp.float32(0.125)
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        elif variant in ("polybm_rsqrt", "polybm_unroll4", "polybm_rsqrt_unroll4", "polybm_rsqrt_unroll8"):
            # rsqrt: radius = x * rsqrt(x) — hardware reciprocal-sqrt path if
            # Mosaic has one. unroll4: 4 pair-steps per fori iteration for ILP.
            def sin_folded4(t):
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

            use_rsqrt = "rsqrt" in variant
            unroll = 8 if "unroll8" in variant else (4 if "unroll4" in variant else 1)

            def pair(logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                x = jnp.float32(-2.0) * jnp.log(u1)
                if use_rsqrt:
                    radius = x * jax.lax.rsqrt(x)
                else:
                    radius = jnp.sqrt(x)
                z_sum = radius * jnp.float32(math.sqrt(2.0)) * sin_folded4(
                    u2 + jnp.float32(0.125)
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum

            def step(t, logx):
                for _ in range(unroll):
                    logx = pair(logx)
                return logx
            n_iters = timesteps // (2 * unroll)
        elif variant == "polybm_rsqrt_unrollarg":
            # same as polybm_rsqrt_unroll4 but via fori_loop's unroll kwarg
            def sin_folded5(t):
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

            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                x = jnp.float32(-2.0) * jnp.log(u1)
                radius = x * jax.lax.rsqrt(x)
                z_sum = radius * jnp.float32(math.sqrt(2.0)) * sin_folded5(
                    u2 + jnp.float32(0.125)
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = ("unroll4", timesteps // 2)
        elif variant == "polybm":
            # Pair-step Box-Muller with ONE polynomial sine:
            # z1+z2 = r*(cos+sin)(theta) = r*sqrt(2)*sin(theta + pi/4).
            # theta+pi/4 = 2*pi*(u2 + 1/8); fold to x in [-pi/2, pi/2] with
            # half-turn index q, sin = (-1)^q * P9(x), P9 = Taylor deg 9.
            def sin_folded(t):
                qf = jnp.round(jnp.float32(2.0) * t)
                x = jnp.float32(_TWO_PI) * (t - jnp.float32(0.5) * qf)
                q = qf.astype(jnp.int32)
                sign = jnp.where(q & 1, jnp.float32(-1.0), jnp.float32(1.0))
                y = x * x
                p = jnp.float32(2.7557319e-6)
                p = p * y + jnp.float32(-1.9841270e-4)
                p = p * y + jnp.float32(8.3333333e-3)
                p = p * y + jnp.float32(-1.6666667e-1)
                p = p * y + jnp.float32(1.0)
                return sign * x * p

            def step(t, logx):
                u1 = _uniform(shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform(shape)
                radius = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                z_sum = radius * jnp.float32(math.sqrt(2.0)) * sin_folded(
                    u2 + jnp.float32(0.125)
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum
            n_iters = timesteps // 2
        else:
            raise ValueError(variant)

        log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
        if isinstance(n_iters, tuple):
            # Mosaic fori_loop supports only unroll=1 or full unroll
            logx = jax.lax.fori_loop(0, n_iters[1], step, log0, unroll=n_iters[1])
        else:
            logx = jax.lax.fori_loop(0, n_iters, step, log0)
        out_ref[:, :] = jnp.exp(logx)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "timesteps", "rows", "cols", "br", "bc", "reps"))
def run_variant(key, contract, *, variant, timesteps, rows, cols, br, bc, reps):
    kd = jax.random.key_data(key).astype(jnp.int32).reshape(1, 2)
    params = contract.astype(jnp.float32).reshape(1, 6)
    kernel = make_kernel(variant, timesteps, (br, bc))
    grid = (rows // br, cols // bc)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=3 * rows * cols * timesteps,
        ),
    )

    def body(acc, i):
        out = call(params, kd + i)
        return acc + jnp.sum(out), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
    return acc


def main():
    from benchmarks._timing import lab_parser

    parser = lab_parser("GBM terminal-kernel variant/block ablation", default_reps=1000)
    parser.add_argument("--prod-sweep", action="store_true",
                        help="block sweep for the production variant only")
    args = parser.parse_args()
    # reps scanned inside one jit + HOST materialization (float(...)) per
    # timed call: block_until_ready alone under-reports through the axon
    # tunnel (docs/performance.md methodology note). Best-of-3 rejects
    # scheduler noise.
    timesteps, rows, cols, reps = 64, 8192, 256, args.reps
    if args.quick:
        rows, reps = 1024, min(reps, 20)
    key = jax.random.PRNGKey(0)
    contract = jnp.array([100.0, 100.0, 1.0, 0.03, 0.01, 0.25], jnp.float32)
    variants = [
        "baseline",
        "rng_only",
        "log_only",
        "sincos_only",
        "sqrtlog",
        "erfinv",
        "clt8",
        "polybm",
        "polybm_fastlog",
        "polybm_fastlog_s",
        "polybm_rsqrt",
        "polybm_unroll4",
        "polybm_rsqrt_unroll4",
        "polybm_rsqrt_unroll8",
    ]
    blocks = [(256, 256), (512, 256), (1024, 256), (2048, 256), (512, 128), (8192, 256)]
    def time_one(v: str, br: int, bc: int) -> None:
        # ONE timing harness for both sweeps (warm-up + best-of-3); an
        # oversize block makes grid=(rows//br, cols//bc) empty — the kernel
        # never launches and the "timing" is scan overhead, a 5x false
        # positive caught in round 3
        if br > rows or bc > cols:
            print(f"{v:22s} block=({br:5d},{bc:4d})  SKIPPED: empty grid")
            return
        try:
            f = lambda k: run_variant(k, contract, variant=v, timesteps=timesteps,
                                      rows=rows, cols=cols, br=br, bc=bc, reps=reps)
            float(f(key))
            el = math.inf
            for n in range(1, 4):
                t0 = time.perf_counter()
                float(f(jax.random.fold_in(key, n)))
                el = min(el, time.perf_counter() - t0)
            ps = rows * cols * timesteps * reps / el
            print(f"{v:22s} block=({br:5d},{bc:4d})  {el*1000:8.1f} ms  {ps:.3e} path-steps/s")
        except Exception as e:  # noqa: BLE001
            print(f"{v:22s} block=({br:5d},{bc:4d})  FAILED: {e}", file=sys.stderr)

    if args.prod_sweep:
        # block sweep for the PRODUCTION variant only (round 3: the earlier
        # sweep covered baseline; the shipped kernel was never swept)
        for v in ["polybm_rsqrt_unroll4", "polybm_rsqrt_unroll8"]:
            for (br, bc) in [(256, 256), (512, 256), (1024, 256), (512, 128)]:
                time_one(v, br, bc)
        return
    print(f"shape: {rows}x{cols}, t={timesteps}, reps={reps}; device={jax.devices()[0].device_kind}")
    for v in variants:
        for (br, bc) in blocks if v == "baseline" else [(256, 256)]:
            time_one(v, br, bc)


if __name__ == "__main__":
    main()
