"""Fused GBM Monte-Carlo Pallas kernel: in-kernel RNG + path stepping.

This is the TPU-native replacement for the reference's hot kernel
(``/root/reference/src/spectralmc/gbm.py:224-257`` ``SimulateBlackScholes``,
1 CUDA thread per path over a precomputed cuRAND normals matrix) and its
normals pipeline (``async_normals.py``) — the N1+N2 fusion of SURVEY §2.9:

* The ``[rows, cols]`` path state lives in **VMEM** for the whole timestep
  loop; nothing but the terminal values ever touches HBM. The reference
  streams a ``[timesteps, paths]`` normals matrix through HBM.
* Normals come from the **hardware PRNG** (``pltpu.prng_random_bits``) +
  Box–Muller, generated in-register each step — no normals matrix exists.
* Each grid block seeds the PRNG from (threefry key words, block ids), so
  draws are independent across blocks and deterministic per
  (seed, draw counter, topology).

Determinism contract: the XLA path (``gbm.simulate_terminal_rows``) defines
the *canonical* bit stream; this kernel has its own (hardware PRNG ≠
threefry). ``SimulationParams.implementation`` records which engine produced
a checkpoint, so resume stays bit-exact per engine. Cross-engine agreement is
statistical (same distribution), enforced by tests and the analytic-oracle
gate.

float32 only (TPU VPU); float64 requests fall back to the XLA path.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

from spectralmc_tpu.core.aliases import PyTree

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectralmc_tpu.ops.gbm import (
    BARRIER_PAYOFFS,
    LOOKBACK_MAX_PAYOFFS,
    LOOKBACK_PAYOFFS,
    PathScheme,
    PayoffKind,
    lookback_underlier,
)

# Block shape: (8, 128) is the fp32 min tile; (256, 256) keeps a 256 KiB state
# block resident in VMEM with room for the two random-bit buffers.
BLOCK_ROWS = 256
BLOCK_COLS = 256

_TWO_PI = 2.0 * math.pi
# Box-Muller: u1 in (0, 1] built from the top 24 bits; 2^-24 keeps the
# mantissa exact and 1/2^25 offsets zero so log(u1) is finite.
_INV_2_24 = float(2.0**-24)
_HALF_ULP = float(2.0**-25)


# The hardware kernels' bit streams are versioned PER MODEL FAMILY: any
# change to the in-kernel RNG/transcendental evaluation order changes the
# stream, and a mid-stream checkpoint must not silently continue on a
# different one (the same contract as engine recording). History:
#   gbm v1    — round 1 (pair-step + folded deg-9 sine + jnp.sqrt radius).
#   gbm v2    — round 2's x*rsqrt(x) radius, versioned defensively in round
#               3: the sqrt ≡ x*rsqrt(x) identity is backend-dependent (it
#               FAILS on the CPU backend for ~40% of the radius domain at
#               one ulp), so it must not be assumed stable across TPU
#               generations/compiler versions. test_gbm_pallas.py carries a
#               TPU-gated exhaustive bit-identity check documenting the
#               current backend's behavior.
#   heston v1 — round 1 (two _sin_turns per step).
#   heston v2 — round 2 (fused _sincos_turns + hoisted variance scalars);
#               shares the v2 radius, same defensive bump rationale.
#   basket v1 — round 3 (paired sincos normals + static Cholesky mix).
#   merton v1 — round 3 (sincos Gaussian pair + scalar-cdf inverse-CDF
#               Poisson from one extra uniform; counts shared across
#               antithetic partners).
#   gbm_term v1 — round 3 term-structure kernel: per-step (drift, vol·√dt)
#               from an SMEM table; the TERMINAL pair-step survives per-step
#               vols via the phase-shift identity v_a·cosθ + v_b·sinθ =
#               R·sin(θ+φ) with per-pair (R, φ) computed outside the kernel.
#               Runs ONLY for genuinely curved TermStructures (flat curves
#               are the flat kernel's program, bit-identically).
#   american_gbm v1 — round 3 monitor-row kernel (pair-step within a monitor
#               segment + one single step on odd segment lengths; the
#               backward induction consumes the emitted rows in XLA and is
#               not part of the bit stream).
#   american_heston / american_merton_jump / american_basket_gbm v1 — round 3
#               monitor-row variants of the European kernels (per-step draw
#               order identical to the family kernel; no pair-step — Heston/
#               basket recursions are state-dependent and Merton keeps the
#               per-step Poisson semantics).
#   gbm_cliquet v1 — round 3 cliquet kernel: ONE Gaussian draw per reset
#               period (under flat log-Euler GBM the period log-return is an
#               exact Gaussian sum, so per-period sampling is the identical
#               distribution with reset_every× fewer draws), pair-stepping
#               two PERIODS per fused sincos. A distinct program — and a
#               distinct stream — from the per-step kernels.
PALLAS_STREAM_VERSIONS: dict[str, int] = {
    "gbm": 2,
    "gbm_term": 1,
    "gbm_cliquet": 1,
    "heston": 3,
    "basket_gbm": 1,
    "merton_jump": 1,
    "american_gbm": 1,
    "american_heston": 1,
    "american_merton_jump": 1,
    "american_basket_gbm": 1,
}


def pallas_stream_version(
    model: "object", payoff: "object | None" = None, *, term: bool = False
) -> int:
    """Current stream version for a (ModelKind[, PayoffKind]) pair — by value,
    avoids an import. The AMERICAN payoff kinds run a DIFFERENT forward
    kernel (monitor rows, not terminal values), so their stream is versioned
    under its own ``american_{family}`` key: a rebuild of the European
    terminal kernel must not invalidate American checkpoints or vice versa.
    ``term=True`` (a genuinely curved ``TermStructure`` on GBM) selects the
    term kernel's own ``gbm_term`` key for the same reason — its per-step
    SMEM coefficient path is a separate program from the flat kernel.
    """
    family = getattr(model, "value", str(model))
    payoff_value = str(getattr(payoff, "value", payoff)) if payoff is not None else ""
    if payoff_value.startswith("american"):
        return PALLAS_STREAM_VERSIONS[f"american_{family}"]
    if payoff_value == "cliquet" and family == "gbm" and not term:
        # the per-period cliquet kernel is its own program (and only GBM has
        # one — other dynamics resolve cliquets to the XLA engine). Curved
        # terms break the per-period Gaussian aggregation, so a curved-term
        # cliquet is NOT that program — fall through to the term key rather
        # than misreport the stream for an out-of-band query.
        return PALLAS_STREAM_VERSIONS["gbm_cliquet"]
    if term and family == "gbm":
        return PALLAS_STREAM_VERSIONS["gbm_term"]
    return PALLAS_STREAM_VERSIONS[family]


def resolve_lsmc_backward(sim: "object", *, rows: int, sharded: bool = False) -> int:
    """The LSMC backward version that will ACTUALLY run for this sim shape —
    0 = the shared XLA backward, 1 = the VMEM-resident fused kernel, 2 = the
    streamed fused kernel for carriers past the VMEM budget
    (``LSMC_BACKWARD_VERSIONS``; the wrapper prefers VMEM where it fits).

    The backward analogue of ``gbm.resolve_implementation``: the trainer
    records this in ``GbmCVNNPricerConfig.lsmc_backward_version`` so a
    checkpoint can never claim a backward that did not run (the fused
    backward's reduction order decides near-boundary exercise bits —
    ops/lsmc_pallas.py's stream-version story). Must mirror
    ``simulate_american_underlier_rows_pallas``'s own routing exactly:
    * the sim requests it (``lsmc_fused_backward``; build_simulation_params
      already restricts the knob to GBM American, flat term, no cross-fit);
    * the PALLAS engine actually runs (same ``resolve_implementation`` gate
      as the forward kernel — the fused backward consumes the Pallas
      forward's monitor rows);
    * the kernel accepts the shape (``lsmc_fused_backward_supported``); a
      mesh ``paths`` axis rejects — the per-date moment psum is a cross-chip
      collective no single-core kernel can own (``sharded=True``).
    """
    if not getattr(sim, "lsmc_fused_backward", False):
        return 0
    from spectralmc_tpu.ops.gbm import SimImplementation, resolve_implementation
    from spectralmc_tpu.ops.lsmc_pallas import (
        LSMC_BACKWARD_VERSIONS,
        lsmc_fused_backward_supported,
        lsmc_streamed_backward_supported,
    )

    if resolve_implementation(sim, rows=rows) != SimImplementation.PALLAS:
        return 0
    shape = dict(
        dtype=sim.precision.to_jnp(),
        rows=rows,
        cols=sim.network_size,
        n_monitor=max(sim.timesteps // sim.lsmc_exercise_every, 1),
        cross_fit=sim.lsmc_cross_fit,
        axis_name="paths" if sharded else None,
    )
    if lsmc_fused_backward_supported(**shape):
        return LSMC_BACKWARD_VERSIONS["fused"]
    if lsmc_streamed_backward_supported(**shape):
        return LSMC_BACKWARD_VERSIONS["fused_streamed"]
    return 0


def pallas_supported(*, dtype: jnp.dtype, rows: int, cols: int) -> bool:
    """Whether the fused hardware kernel can honor this request.

    Single source of truth for every fallback decision AND for
    ``gbm.resolve_implementation`` — the engine recorded in a checkpoint must
    be the one that actually ran, so this predicate and the kernels' fallback
    branches may never diverge (VERDICT r1 weak #2: a PALLAS checkpoint
    resumed where the kernel can't run must fail loudly, not silently switch
    bit streams).
    """
    return (
        jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
        # hardware wants a real TPU and (8, 128) tile alignment
        and jax.default_backend() == "tpu"
        and cols % 128 == 0
        and rows % 8 == 0
    )


def _uniform_24bit(shape: tuple[int, int]) -> jax.Array:
    """Uniform in [0, 1) from the top 24 PRNG bits (exact float32 mantissa).

    prng_random_bits yields *signed* int32: bitcast to uint32 for a logical
    shift, then back to int32 (top 8 bits now zero, so the value is
    non-negative) because Mosaic can't cast uint32->float32.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(_INV_2_24)


def _sin_turns(t: jax.Array) -> jax.Array:
    """sin(2*pi*t) via half-turn folding + degree-9 odd Taylor polynomial.

    Mosaic's libm-grade sin/cos dominated the first kernel (~80% of runtime,
    measured by ablation); on the fold x is in [-pi/2, pi/2] where the Taylor
    tail error is <4e-6 — far below the 24-bit uniform quantization already
    in the stream, so the normals' distribution is unaffected.
    """
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


def _sincos_turns(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sin, cos)(2*pi*t) sharing ONE half-turn fold and the x^2 powers.

    The Heston step needs two normals per draw — r*cos(theta) and
    r*sin(theta) — so evaluating both polynomials off one fold beats two
    separate ``_sin_turns`` calls by ~20% end-to-end (benchmarks/
    heston_lab.py ablation). cos(x + q*pi) carries the same (-1)^q factor as
    sin, so the fold's sign applies to both. Degree-10 even Taylor: max
    error 4.6e-7 on the fold — same class as the sine poly, far below the
    stream's statistical resolution.
    """
    qf = jnp.round(jnp.float32(2.0) * t)
    x = jnp.float32(_TWO_PI) * (t - jnp.float32(0.5) * qf)
    sign = jnp.where(qf.astype(jnp.int32) & 1, jnp.float32(-1.0), jnp.float32(1.0))
    y = x * x
    ps = jnp.float32(2.7557319e-6)
    ps = ps * y + jnp.float32(-1.9841270e-4)
    ps = ps * y + jnp.float32(8.3333333e-3)
    ps = ps * y + jnp.float32(-1.6666667e-1)
    ps = ps * y + jnp.float32(1.0)
    pc = jnp.float32(-2.7557319e-7)
    pc = pc * y + jnp.float32(2.4801587e-5)
    pc = pc * y + jnp.float32(-1.3888889e-3)
    pc = pc * y + jnp.float32(4.1666667e-2)
    pc = pc * y + jnp.float32(-5.0e-1)
    pc = pc * y + jnp.float32(1.0)
    return sign * x * ps, sign * pc



def _bm_radius(u1: jax.Array) -> jax.Array:
    """Box-Muller radius sqrt(-2 ln u) as ``x * rsqrt(x)``.

    Schedules measurably better than ``jnp.sqrt`` inside the unrolled loop
    (pallas_lab.py: polybm 1.63e11 → polybm_rsqrt_unroll4 1.75e11
    path-steps/s with the unroll below). The substitution IS a stream change
    — sqrt(x) ≡ x*rsqrt(x) holds bit-exactly on the Mosaic backend it was
    verified on, but the identity is backend-dependent (on the CPU backend
    ~40% of the radius domain differs by one ulp), so the kernels carry
    stream version v2 (PALLAS_STREAM_VERSIONS) rather than assuming the
    identity across TPU generations. test_gbm_pallas.py's TPU-gated
    exhaustive check documents the current backend's status.

    The half-ulp offset makes u1 round to exactly 1.0 once per ~2^24 draws
    (1 − 2^-25 is halfway between fp32 neighbours; ties-to-even lands on 1),
    where x = 0 and ``x * rsqrt(x)`` is 0·inf = NaN. Flooring the rsqrt
    argument at 1e-30 pins that lane to sqrt's 0 (0 · rsqrt(1e-30) = 0) and
    changes no other lane: the smallest nonzero x is −2·ln(1 − 2⁻²⁴) ≈
    1.19e-7, far above the floor.
    """
    x = jnp.float32(-2.0) * jnp.log(u1)
    return _radius_from_sq(x)


def _radius_from_sq(x: jax.Array) -> jax.Array:
    """``sqrt(x)`` as ``x * rsqrt(x)`` for a precomputed x = r² (same emitted
    ops as ``_bm_radius`` — callers that also need r² reuse x instead of
    squaring the radius back)."""
    return x * jax.lax.rsqrt(jnp.maximum(x, jnp.float32(1e-30)))


def _fori_unrolled(
    n: int, body: "Callable[[PyTree], PyTree]", init: PyTree, unroll: int = 4
) -> PyTree:
    """fori_loop over ``body(carry)`` in groups of ``unroll`` + remainder.

    Mosaic's fori_loop supports only unroll=1 or full unroll; grouping by 4
    gives the full unroll's ILP win (+8%, pallas_lab.py) with bounded code
    size at large timesteps. Execution order — hence the stateful PRNG's bit
    stream — is exactly the sequential loop's.
    """

    def grouped(_t: jax.Array, carry: PyTree) -> PyTree:
        for _ in range(unroll):
            carry = body(carry)
        return carry

    carry = init
    if n >= unroll:
        carry = jax.lax.fori_loop(0, n // unroll, grouped, carry)
    for _ in range(n % unroll):
        carry = body(carry)
    return carry


def _fori_unrolled_idx(
    n: int, body: "Callable[[PyTree, jax.Array], PyTree]", init: PyTree, unroll: int = 4
) -> PyTree:
    """``_fori_unrolled`` whose body receives the step index: ``body(t, c)``.

    Needed by the term-structure kernel, whose per-step coefficients live in
    an SMEM table indexed by ``t`` (scalar SMEM loads — the natural TPU way
    to feed a dynamic loop per-iteration constants). Execution order — hence
    the stateful PRNG's bit stream — is exactly the sequential loop's.
    """

    def grouped(g: jax.Array, carry: PyTree) -> PyTree:
        for k in range(unroll):
            carry = body(g * unroll + k, carry)
        return carry

    carry = init
    if n >= unroll:
        carry = jax.lax.fori_loop(0, n // unroll, grouped, carry)
    base = (n // unroll) * unroll
    for k in range(n % unroll):
        carry = body(base + k, carry)
    return carry


def _term_coeff_tables(
    contract: jax.Array, term_shapes: tuple[tuple[float, ...], ...], timesteps: int
) -> tuple[jax.Array, jax.Array]:
    """(step [T,2], pair [ceil(T/2),2]) f32 SMEM payloads for the term kernel.

    step[t] = (log-drift_t·dt, vol_t·√dt). pair[p] packs the phase-shift
    constants that keep the Box–Muller pair-step alive under per-step vols:

        v_a·r·cos θ + v_b·r·sin θ = r·R·sin(θ + φ),
        R = √(v_a² + v_b²)·√dt,  φ = atan2(v_a, v_b) / 2π  (turns)

    — the flat kernel's ``√2·sin(θ + 1/8)`` is the v_a = v_b special case.
    One sine per TWO timesteps survives arbitrary vol curves; the constants
    are computed here, outside the kernel, once per contract.
    """
    vs, rs, qs = term_shapes
    dtype = jnp.float32
    _, _, maturity, rate, div_yield, vol = (contract[i].astype(dtype) for i in range(6))
    dt = maturity / jnp.asarray(timesteps, dtype)
    sqrt_dt = jnp.sqrt(dt)
    vsa, rsa, qsa = (jnp.asarray(s, dtype) for s in (vs, rs, qs))
    vol_t = vol * vsa
    drift = (rate * rsa - div_yield * qsa - 0.5 * vol_t * vol_t) * dt
    vol_sdt = vol_t * sqrt_dt
    step = jnp.stack([drift, vol_sdt], axis=1)  # [T, 2]
    n_pairs = max(timesteps // 2, 1)
    va = vol_sdt[0 : 2 * n_pairs : 2]
    vb = vol_sdt[1 : 2 * n_pairs : 2]
    radius = jnp.sqrt(va * va + vb * vb)
    phi_turns = jnp.arctan2(va, vb) * jnp.float32(1.0 / _TWO_PI)
    pair = jnp.stack([radius, phi_turns], axis=1)  # [T//2, 2]
    return step, pair


def _gbm_term_block_kernel(
    params_ref,  # SMEM (1, 6): spot, strike, maturity, rate, div, vol
    seeds_ref,  # SMEM (1, 3) int32: threefry key words + row-block offset
    step_ref,  # SMEM (T, 2): per-step (drift*dt, vol*sqrt_dt)
    pair_ref,  # SMEM (ceil(T/2), 2): per-pair (R, phi_turns)
    out_ref,  # VMEM (BLOCK_ROWS, BLOCK_COLS)
    *,
    timesteps: int,
    payoff: PayoffKind,
    rows_per_block: int,
    cols_per_block: int,
    barrier_rel: float | None = None,
    antithetic: bool = False,
) -> None:
    """Log-Euler GBM under piecewise-constant curves (stream ``gbm_term``).

    Identical PRNG discipline to ``_gbm_block_kernel`` (same seeds mixing,
    same draw order per payoff branch); only the per-step coefficients come
    from SMEM tables instead of in-register flat scalars. LOG_EULER only —
    the reflection-Euler compatibility scheme stays on the XLA engine.
    """
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    spot = params_ref[0, 0]
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def step_single(t: jax.Array, logx: jax.Array) -> jax.Array:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        z = _mirror(_bm_radius(u1) * _sin_turns(u2 + jnp.float32(0.25)))
        return logx + step_ref[t, 0] + step_ref[t, 1] * z

    inv_n = jnp.float32(1.0 / timesteps)
    log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    if payoff == PayoffKind.TERMINAL:
        # phase-shifted pair step: both Box–Muller outputs advance two
        # steps with ONE sine even though the two vols differ
        def step_pair(p: jax.Array, logx: jax.Array) -> jax.Array:
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            z_mix = _mirror(
                _bm_radius(u1) * pair_ref[p, 0] * _sin_turns(u2 + pair_ref[p, 1])
            )
            t = 2 * p
            return logx + (step_ref[t, 0] + step_ref[t + 1, 0]) + z_mix

        logx = _fori_unrolled_idx(timesteps // 2, step_pair, log0)
        if timesteps % 2:
            logx = step_single(jnp.int32(timesteps - 1), logx)
        out_ref[:, :] = jnp.exp(logx)
    elif payoff in BARRIER_PAYOFFS or payoff in LOOKBACK_PAYOFFS:
        lookback = payoff in LOOKBACK_PAYOFFS
        up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
        extreme_fn = jnp.maximum if up else jnp.minimum

        def step_barrier(
            t: jax.Array, carry: tuple[jax.Array, jax.Array]
        ) -> tuple[jax.Array, jax.Array]:
            logx, ext = carry
            logx = step_single(t, logx)
            return (logx, extreme_fn(ext, logx))

        logx, ext = _fori_unrolled_idx(timesteps, step_barrier, (log0, log0))
        if lookback:
            out_ref[:, :] = lookback_underlier(
                payoff, params_ref[0, 1], jnp.exp(ext), jnp.exp(logx)
            )
        else:
            level = jnp.log(spot * jnp.float32(barrier_rel))
            knocked = ext >= level if up else ext <= level
            out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], jnp.exp(logx))
    elif payoff == PayoffKind.VARIANCE_SWAP:
        # state-free RV: per-step vols break the phase-shift z1+z2 trick,
        # but ONE _sincos_turns fold still yields both increments of a pair
        # (inc_a on r·cos, inc_b on r·sin — independent normals)
        def step_pair_var(p: jax.Array, acc: jax.Array) -> jax.Array:
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            radius = _bm_radius(u1)
            sin_t, cos_t = _sincos_turns(u2)
            t = 2 * p
            inc_a = step_ref[t, 0] + step_ref[t, 1] * _mirror(radius * cos_t)
            inc_b = step_ref[t + 1, 0] + step_ref[t + 1, 1] * _mirror(radius * sin_t)
            return acc + inc_a * inc_a + inc_b * inc_b

        acc = _fori_unrolled_idx(
            timesteps // 2, step_pair_var, jnp.zeros(shape, jnp.float32)
        )
        if timesteps % 2:
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            z = _mirror(_bm_radius(u1) * _sin_turns(u2 + jnp.float32(0.25)))
            t_last = jnp.int32(timesteps - 1)
            inc = step_ref[t_last, 0] + step_ref[t_last, 1] * z
            acc = acc + inc * inc
        out_ref[:, :] = acc / params_ref[0, 2]
    else:
        geometric = payoff == PayoffKind.ASIAN_GEOMETRIC

        def step_acc(
            t: jax.Array, carry: tuple[jax.Array, jax.Array]
        ) -> tuple[jax.Array, jax.Array]:
            logx, acc = carry
            logx = step_single(t, logx)
            acc = acc + (logx if geometric else jnp.exp(logx))
            return (logx, acc)

        _, acc = _fori_unrolled_idx(
            timesteps, step_acc, (log0, jnp.zeros(shape, jnp.float32))
        )
        out_ref[:, :] = jnp.exp(acc * inv_n) if geometric else acc * inv_n


def _gbm_block_kernel(
    params_ref,  # SMEM (1, 6): spot, strike, maturity, rate, div, vol
    seeds_ref,  # SMEM (1, 3) int32: threefry key words + row-block offset
    out_ref,  # VMEM (BLOCK_ROWS, BLOCK_COLS)
    *,
    timesteps: int,
    scheme: PathScheme,
    payoff: PayoffKind,
    rows_per_block: int,
    cols_per_block: int,
    barrier_rel: float | None = None,
    antithetic: bool = False,
) -> None:
    # Global row-block index: a mesh shard owning rows [k, k+n) passes
    # row_block_offset = k // block_rows, so its blocks draw the same streams
    # the unsharded kernel assigns to those rows (shard-stable when k is
    # block-aligned; independent streams otherwise).
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    spot = params_ref[0, 0]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    # Mix the threefry key words with the block coordinates (Mosaic caps
    # prng_seed at 2 values); large odd constants decorrelate neighbours.
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    maturity = params_ref[0, 2]
    dt = maturity / jnp.float32(timesteps)
    sqrt_dt = jnp.sqrt(dt)
    vol_sdt = vol * sqrt_dt
    shape = (rows_per_block, cols_per_block)

    # Antithetic: the kernel's pairing is IN-BLOCK — generate normals for the
    # top half of the block and mirror them negated onto the bottom half
    # (block-seeded PRNG streams cannot be shared across blocks). Engine
    # pairings differ from the XLA path's global-half convention, which is
    # fine: the engines' bit streams differ anyway and each is checkpointed.
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def normals() -> jax.Array:
        # One Box-Muller output: z = r*cos(2*pi*u2) = r*sin(2*pi*(u2 + 1/4)).
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        return _mirror(_bm_radius(u1) * _sin_turns(u2 + jnp.float32(0.25)))

    inv_n = jnp.float32(1.0 / timesteps)
    if scheme == PathScheme.LOG_EULER:
        drift = (rate - div_yield - jnp.float32(0.5) * vol * vol) * dt

        def step_single(logx: jax.Array) -> jax.Array:
            return logx + drift + vol_sdt * normals()

        log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
        if payoff == PayoffKind.TERMINAL:
            # Log-Euler increments are additive, so both Box–Muller outputs
            # advance two timesteps per draw; their sum needs only ONE sine:
            # z1 + z2 = r*(cos+sin)(theta) = r*sqrt(2)*sin(theta + pi/4).
            def step_pair(logx: jax.Array) -> jax.Array:
                u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform_24bit(gen_shape)
                z_sum = _mirror(
                    _bm_radius(u1)
                    * jnp.float32(math.sqrt(2.0))
                    * _sin_turns(u2 + jnp.float32(0.125))
                )
                return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum

            logx = _fori_unrolled(timesteps // 2, step_pair, log0)
            if timesteps % 2:
                logx = step_single(logx)
            out_ref[:, :] = jnp.exp(logx)
        elif payoff in BARRIER_PAYOFFS or payoff in LOOKBACK_PAYOFFS:
            # knockout/lookback: track the path's running log-extreme in
            # VMEM; barriers mask knocked paths to strike, lookbacks emit
            # the extreme through the shared underlier encoding
            lookback = payoff in LOOKBACK_PAYOFFS
            up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
            extreme_fn = jnp.maximum if up else jnp.minimum

            def step_barrier(
                carry: tuple[jax.Array, jax.Array]
            ) -> tuple[jax.Array, jax.Array]:
                logx, ext = carry
                logx = step_single(logx)
                return (logx, extreme_fn(ext, logx))

            logx, ext = _fori_unrolled(timesteps, step_barrier, (log0, log0))
            if lookback:
                out_ref[:, :] = lookback_underlier(
                    payoff, params_ref[0, 1], jnp.exp(ext), jnp.exp(logx)
                )
            else:
                level = jnp.log(spot * jnp.float32(barrier_rel))
                knocked = ext >= level if up else ext <= level
                out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], jnp.exp(logx))
        elif payoff == PayoffKind.VARIANCE_SWAP:
            # RV is STATE-FREE under log-Euler, and the pair-step shortcut
            # survives squaring: with a = drift, b = vol·√dt,
            #   (a+b·z1)² + (a+b·z2)² = 2a² + b²·r² + 2ab·(z1+z2),
            #   z1+z2 = r·√2·sin(θ+π/4),  r² = −2·ln u1
            # — ONE sine and ZERO exp per TWO timesteps; x = r² is reused
            # instead of squaring the radius back.
            base_c = jnp.float32(2.0) * drift * drift
            b_sq = vol_sdt * vol_sdt
            cross_c = jnp.float32(2.0 * math.sqrt(2.0)) * drift * vol_sdt

            def step_pair_var(acc: jax.Array) -> jax.Array:
                u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
                u2 = _uniform_24bit(gen_shape)
                x = jnp.float32(-2.0) * jnp.log(u1)  # r²
                s = _radius_from_sq(x) * _sin_turns(u2 + jnp.float32(0.125))
                base = base_c + b_sq * x
                delta = cross_c * s
                if antithetic:  # z → −z flips only the cross term
                    return acc + jnp.concatenate([base + delta, base - delta], axis=0)
                return acc + base + delta

            def step_single_var(acc: jax.Array) -> jax.Array:
                inc = drift + vol_sdt * normals()
                return acc + inc * inc

            acc = _fori_unrolled(
                timesteps // 2, step_pair_var, jnp.zeros(shape, jnp.float32)
            )
            if timesteps % 2:
                acc = step_single_var(acc)
            out_ref[:, :] = acc / maturity
        else:
            # Path-dependent average: every intermediate state feeds the
            # running sum, so the pair-step shortcut does not apply.
            geometric = payoff == PayoffKind.ASIAN_GEOMETRIC

            def step_acc(
                carry: tuple[jax.Array, jax.Array]
            ) -> tuple[jax.Array, jax.Array]:
                logx, acc = carry
                logx = step_single(logx)
                acc = acc + (logx if geometric else jnp.exp(logx))
                return (logx, acc)

            _, acc = _fori_unrolled(
                timesteps, step_acc, (log0, jnp.zeros(shape, jnp.float32))
            )
            out_ref[:, :] = jnp.exp(acc * inv_n) if geometric else acc * inv_n
    else:
        growth = jnp.float32(1.0) + (rate - div_yield) * dt

        def step_euler(x: jax.Array) -> jax.Array:
            return jnp.abs(x * (growth + vol_sdt * normals()))

        x0 = jnp.full(shape, 1.0, jnp.float32) * spot
        if payoff == PayoffKind.TERMINAL:
            out_ref[:, :] = _fori_unrolled(timesteps, step_euler, x0)
        elif payoff in BARRIER_PAYOFFS or payoff in LOOKBACK_PAYOFFS:
            lookback = payoff in LOOKBACK_PAYOFFS
            up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
            extreme_fn = jnp.maximum if up else jnp.minimum

            def step_euler_barrier(
                carry: tuple[jax.Array, jax.Array]
            ) -> tuple[jax.Array, jax.Array]:
                x, ext = carry
                x = step_euler(x)
                return (x, extreme_fn(ext, x))

            x, ext = _fori_unrolled(timesteps, step_euler_barrier, (x0, x0))
            if lookback:
                out_ref[:, :] = lookback_underlier(payoff, params_ref[0, 1], ext, x)
            else:
                level = spot * jnp.float32(barrier_rel)
                knocked = ext >= level if up else ext <= level
                out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], x)
        elif payoff == PayoffKind.VARIANCE_SWAP:
            # the ratio x'/x = |growth + vol·√dt·z| is state-free, so the
            # Euler RV needs no path state either
            def step_euler_var(acc: jax.Array) -> jax.Array:
                inc = jnp.log(jnp.abs(growth + vol_sdt * normals()))
                return acc + inc * inc

            acc = _fori_unrolled(
                timesteps, step_euler_var, jnp.zeros(shape, jnp.float32)
            )
            out_ref[:, :] = acc / maturity
        else:
            geometric = payoff == PayoffKind.ASIAN_GEOMETRIC

            def step_euler_acc(
                carry: tuple[jax.Array, jax.Array]
            ) -> tuple[jax.Array, jax.Array]:
                x, acc = carry
                x = step_euler(x)
                acc = acc + (jnp.log(x) if geometric else x)
                return (x, acc)

            _, acc = _fori_unrolled(
                timesteps, step_euler_acc, (x0, jnp.zeros(shape, jnp.float32))
            )
            out_ref[:, :] = jnp.exp(acc * inv_n) if geometric else acc * inv_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "scheme", "payoff", "barrier_rel",
        "antithetic", "interpret",
    ),
)
def _simulate_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    scheme: PathScheme,
    payoff: PayoffKind = PayoffKind.TERMINAL,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    if rows % block_rows or cols % block_cols:
        raise ValueError(
            f"pallas path needs rows/cols divisible by block ({block_rows},{block_cols})"
        )
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 6)

    kernel = functools.partial(
        _gbm_block_kernel,
        timesteps=timesteps,
        scheme=scheme,
        payoff=payoff,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        barrier_rel=barrier_rel,
        antithetic=antithetic,
    )
    grid = (rows // block_rows, cols // block_cols)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=3 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)


def _gbm_cliquet_block_kernel(
    params_ref,  # SMEM (1, 6): spot, strike, maturity, rate, div, vol
    seeds_ref,  # SMEM (1, 3) int32: threefry key words + row-block offset
    out_ref,  # VMEM (BLOCK_ROWS, BLOCK_COLS)
    *,
    timesteps: int,
    reset_every: int,
    floor: float,
    cap: float,
    rows_per_block: int,
    cols_per_block: int,
    antithetic: bool,
) -> None:
    """Cliquet accumulator u = Σ_j clip(exp(L_j) − 1, floor, cap), sampling
    each period's log-return L_j DIRECTLY: under flat log-Euler GBM,
    L_j = k·drift + vol·√dt·Σ_{t∈period} z_t is an exact Gaussian sum, so one
    N(k·drift, k·vol²·dt) draw per period is the identical distribution with
    ``reset_every``× fewer draws. Periods are clipped independently, so the
    TERMINAL pair-step's one-sine sum shortcut does not apply — instead two
    periods share one Box–Muller draw pair via the fused ``_sincos_turns``
    (z1 = r·cosθ like ``normals()``, z2 = r·sinθ — the Heston kernel's
    convention). Stream key ``gbm_cliquet`` (PALLAS_STREAM_VERSIONS)."""
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    spot = params_ref[0, 0]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    del spot  # the accumulator is in RETURN units; spot never enters
    maturity = params_ref[0, 2]
    dt = maturity / jnp.float32(timesteps)
    n_periods = timesteps // reset_every
    period_drift = (rate - div_yield - jnp.float32(0.5) * vol * vol) * dt * jnp.float32(
        reset_every
    )
    period_vol = vol * jnp.sqrt(dt * jnp.float32(reset_every))
    floor_c = jnp.float32(floor)
    cap_c = jnp.float32(cap)
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def _clipped(z: jax.Array) -> jax.Array:
        ret = jnp.exp(period_drift + period_vol * z) - jnp.float32(1.0)
        return jnp.clip(ret, floor_c, cap_c)

    def period_pair(acc: jax.Array) -> jax.Array:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        r = _bm_radius(u1)
        s, c = _sincos_turns(u2)
        return acc + _clipped(_mirror(r * c)) + _clipped(_mirror(r * s))

    acc = _fori_unrolled(n_periods // 2, period_pair, jnp.zeros(shape, jnp.float32))
    if n_periods % 2:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        z = _mirror(_bm_radius(u1) * _sin_turns(u2 + jnp.float32(0.25)))
        acc = acc + _clipped(z)
    out_ref[:, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "reset_every", "floor", "cap",
        "antithetic", "interpret",
    ),
)
def _simulate_cliquet_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    reset_every: int,
    floor: float,
    cap: float,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    if rows % block_rows or cols % block_cols:
        raise ValueError(
            f"pallas path needs rows/cols divisible by block ({block_rows},{block_cols})"
        )
    if antithetic and block_rows % 2:
        # hardware always has block_rows % 8 == 0; reachable via interpret
        # mode, where half-block mirroring would otherwise fail with an
        # opaque concatenate shape error at trace time
        raise ValueError(
            f"antithetic pairing needs an even row block, got block_rows={block_rows}"
        )
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 6)

    n_periods = timesteps // reset_every
    kernel = functools.partial(
        _gbm_cliquet_block_kernel,
        timesteps=timesteps,
        reset_every=reset_every,
        floor=floor,
        cap=cap,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        antithetic=antithetic,
    )
    grid = (rows // block_rows, cols // block_cols)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        # the work scales with PERIODS, not timesteps — that is the point
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * cols * n_periods,
            bytes_accessed=rows * cols * 4,
            transcendentals=3 * rows * cols * n_periods,
        ),
        interpret=interpret,
    )(params, seeds)


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "payoff", "barrier_rel",
        "antithetic", "term_shapes", "interpret",
    ),
)
def _simulate_term_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    payoff: PayoffKind,
    term_shapes: tuple[tuple[float, ...], ...],
    barrier_rel: float | None = None,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    if rows % block_rows or cols % block_cols:
        raise ValueError(
            f"pallas path needs rows/cols divisible by block ({block_rows},{block_cols})"
        )
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 6)
    step, pair = _term_coeff_tables(contract, term_shapes, timesteps)

    kernel = functools.partial(
        _gbm_term_block_kernel,
        timesteps=timesteps,
        payoff=payoff,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        barrier_rel=barrier_rel,
        antithetic=antithetic,
    )
    grid = (rows // block_rows, cols // block_cols)
    n_pairs = max(timesteps // 2, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (timesteps, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (n_pairs, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=3 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds, step, pair)


def simulate_terminal_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    scheme: PathScheme,
    row_offset: jax.Array | int = 0,
    antithetic_half: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-accelerated terminal rows; falls back to XLA when unsupported."""
    interpretable = (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
    )
    if not (interpretable or pallas_supported(dtype=dtype, rows=rows, cols=cols)):
        from spectralmc_tpu.ops.gbm import simulate_terminal_rows

        return simulate_terminal_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
        )
    return _simulate_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        scheme=scheme,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        interpret=interpret,
    )


def terminal_pathwise_vjp(
    g: jax.Array,
    s_t: jax.Array,
    contract: jax.Array,
    term_factors: tuple[float, float, float] | None = None,
) -> jax.Array:
    """Cotangent on the 6-vector contract from cotangent ``g`` on log-Euler
    terminal values ``s_t`` — WITHOUT re-running the simulation.

    Under log-Euler, ``log S_T = log S0 + (r−q−v²/2)·T + v·√dt·Z`` with
    ``Z = Σ z_t`` a pure function of integer-keyed normals (never of the
    contract), so the per-path stochastic term ``W = v·√dt·Z`` is recoverable
    from the OUTPUT alone: ``W = log(S_T/S0) − (r−q−v²/2)·T``. The full
    pathwise Jacobian follows elementwise:

        ∂logS_T/∂S0 = 1/S0            ∂logS_T/∂K = 0
        ∂logS_T/∂T  = (r−q−v²/2) + W/(2T)
        ∂logS_T/∂r  = T               ∂logS_T/∂q = −T
        ∂logS_T/∂v  = −v·T + W/v

    This is the exact reverse-mode rule for the map the kernel computes (to
    f32 rounding in the W recovery — irrelevant against MC noise), which is
    how the Pallas engine gets Greeks without a Mosaic backward pass: the
    forward kernel's own samples ARE the residuals (VERDICT r2 weak #5c).

    ``term_factors = (mv2, mr, mq)`` — (mean(vs²), mean(rs), mean(qs)) of a
    TermStructure's shapes — generalizes the rule to curved markets: the
    contract scalars multiply EVERY step uniformly, so
    ``log S_T = log S0 + (r·mr − q·mq − ½v²·mv2)·T + W`` with the same
    output-only W recovery, and the Jacobian is the flat one with the
    effective factors (∂/∂r = mr·T, ∂/∂v = −v·mv2·T + W/v, …).
    """
    dtype = s_t.dtype
    spot, _, maturity, rate, div_yield, vol = (
        contract[i].astype(dtype) for i in range(6)
    )
    mv2, mr, mq = term_factors if term_factors is not None else (1.0, 1.0, 1.0)
    mu = rate * mr - div_yield * mq - 0.5 * vol * vol * mv2
    w = jnp.log(s_t / spot) - mu * maturity
    gs = g * s_t  # cotangent on log S_T
    total = jnp.sum(gs)
    d_spot = total / spot
    d_mat = jnp.sum(gs * (mu + w / (2.0 * maturity)))
    d_rate = mr * maturity * total
    d_div = -mq * maturity * total
    d_vol = jnp.sum(gs * (-vol * mv2 * maturity + w / vol))
    zero = jnp.zeros((), dtype)
    return jnp.stack([d_spot, zero, d_mat, d_rate, d_div, d_vol]).astype(
        contract.dtype
    )


@functools.lru_cache(maxsize=None)
def _terminal_pallas_diff(
    timesteps: int,
    rows: int,
    cols: int,
    antithetic: bool,
    term_shapes: tuple[tuple[float, ...], ...] | None = None,
) -> "jax.custom_vjp":
    if term_shapes is not None:
        vs, rs, qs = term_shapes
        n = float(timesteps)
        factors = (
            sum(v * v for v in vs) / n,
            sum(rs) / n,
            sum(qs) / n,
        )
    else:
        factors = None

    @jax.custom_vjp
    def f(key: jax.Array, contract: jax.Array) -> jax.Array:
        if term_shapes is not None:
            return _simulate_term_rows_pallas_f32(
                key,
                contract,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                payoff=PayoffKind.TERMINAL,
                term_shapes=term_shapes,
                antithetic=antithetic,
            )
        return _simulate_rows_pallas_f32(
            key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            scheme=PathScheme.LOG_EULER,
            antithetic=antithetic,
        )

    def fwd(
        key: jax.Array, contract: jax.Array
    ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
        out = f(key, contract)
        return out, (out, contract)

    def bwd(
        res: tuple[jax.Array, jax.Array], g: jax.Array
    ) -> tuple[None, jax.Array]:
        out, contract = res
        return (None, terminal_pathwise_vjp(g, out, contract, factors))

    f.defvjp(fwd, bwd)
    return f


def simulate_terminal_rows_pallas_diff(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    antithetic_half: int | None = None,
    term: "object | None" = None,
) -> jax.Array:
    """Differentiable Pallas terminal simulator (log-Euler TERMINAL only).

    Forward = the fused hardware kernel; backward = the analytic pathwise
    rule (``terminal_pathwise_vjp``) over the kernel's OWN samples — Greeks
    at kernel speed, no XLA-stream recompute, no second bit stream. Falls
    back to the (autodiff-transparent) XLA path where the kernel can't run.
    Curved ``term`` structures route to the term kernel with the
    effective-factor backward rule; flat ones are the flat program.
    """
    if term is not None and term.is_flat():
        term = None
    if not pallas_supported(dtype=dtype, rows=rows, cols=cols):
        from spectralmc_tpu.ops.gbm import simulate_terminal_rows

        return simulate_terminal_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=PathScheme.LOG_EULER,
            antithetic_half=antithetic_half,
            term=term,
        )
    return _terminal_pallas_diff(
        timesteps,
        rows,
        cols,
        antithetic_half is not None,
        term.shapes(timesteps) if term is not None else None,
    )(contract_key, contract)


def simulate_terminal_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    batches: int,
    network_size: int,
    dtype: jnp.dtype,
    scheme: PathScheme,
    interpret: bool = False,
) -> jax.Array:
    """Flat ``[batches * network_size]`` terminal values (engine-facing API)."""
    return simulate_terminal_rows_pallas(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=batches,
        cols=network_size,
        dtype=dtype,
        scheme=scheme,
        interpret=interpret,
    ).reshape(batches * network_size)


def simulate_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    scheme: PathScheme,
    payoff: PayoffKind,
    row_offset: jax.Array | int = 0,
    barrier_rel: float | None = None,
    antithetic_half: int | None = None,
    forward_start_step: int | None = None,
    cliquet_reset_every: int | None = None,
    cliquet_floor: float | None = None,
    cliquet_cap: float | None = None,
    term: "object | None" = None,
    interpret: bool = False,
) -> jax.Array:
    """Payoff underliers (terminal, path average, or knockout-masked
    terminal) via the fused kernel.

    Terminal payoffs route through ``simulate_terminal_rows_pallas``; Asian
    kinds accumulate the running average and barrier kinds the running
    extreme in VMEM (one extra [rows, cols] block, one normal per timestep —
    the pair-step shortcut needs increments only and does not apply). Falls
    back to the XLA ``simulate_underlier_rows`` off-TPU or for unsupported
    shapes/dtypes.

    A genuinely curved ``term`` (TermStructure) routes to the term kernel
    (stream ``gbm_term``, LOG_EULER only); an exactly-flat term is the same
    program as no term and takes the flat kernel.
    """
    if term is not None and term.is_flat():
        term = None  # flat curves are bit-identical to no curves
    if payoff == PayoffKind.CLIQUET:
        # per-period kernel (stream ``gbm_cliquet``): flat log-Euler only —
        # curved terms / EULER lose the Gaussian-sum aggregation, so they
        # keep the XLA scan (resolve_implementation mirrors this gate)
        assert (  # enforced by build_simulation_params
            cliquet_reset_every is not None
            and cliquet_floor is not None
            and cliquet_cap is not None
        )
        cq_supported = (
            interpret
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and rows % min(BLOCK_ROWS, rows) == 0
            and cols % min(BLOCK_COLS, cols) == 0
        ) or pallas_supported(dtype=dtype, rows=rows, cols=cols)
        if cq_supported and scheme == PathScheme.LOG_EULER and term is None:
            return _simulate_cliquet_rows_pallas_f32(
                contract_key,
                contract,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                reset_every=cliquet_reset_every,
                floor=cliquet_floor,
                cap=cliquet_cap,
                antithetic=antithetic_half is not None,
                row_offset=row_offset,
                interpret=interpret,
            )
        from spectralmc_tpu.ops.gbm import simulate_underlier_rows

        return simulate_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            payoff=payoff,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            cliquet_reset_every=cliquet_reset_every,
            cliquet_floor=cliquet_floor,
            cliquet_cap=cliquet_cap,
            term=term,
        )
    if payoff == PayoffKind.FORWARD_START:
        # u = spot·S_T/S_m is a TERMINAL walk of the TAIL steps alone (the
        # ratio never sees steps < m under either scheme), so the forward-
        # start kernel IS the terminal kernel at timesteps' = N−m with the
        # contract's maturity rescaled to preserve dt (the kernels derive
        # dt = maturity/timesteps; the stream is the terminal stream of the
        # tail length). Curved terms slice their coefficient tables to the
        # tail below.
        assert forward_start_step is not None  # enforced by build_simulation_params
        m = forward_start_step
        tail = timesteps - m
        fs_supported = (
            interpret
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and rows % min(BLOCK_ROWS, rows) == 0
            and cols % min(BLOCK_COLS, cols) == 0
        ) or pallas_supported(dtype=dtype, rows=rows, cols=cols)
        if not fs_supported or (term is not None and scheme != PathScheme.LOG_EULER):
            # fall back to the XLA FORWARD_START stream (t-keyed tail), NOT
            # the terminal-tail trick — the fallback must be the engine the
            # checkpoint records
            from spectralmc_tpu.ops.gbm import simulate_underlier_rows

            return simulate_underlier_rows(
                contract_key,
                contract,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                dtype=dtype,
                scheme=scheme,
                payoff=payoff,
                row_offset=row_offset,
                antithetic_half=antithetic_half,
                forward_start_step=forward_start_step,
                term=term,
            )
        contract_tail = contract.at[2].multiply(tail / timesteps)
        if term is not None:
            vs, rs, qs = term.shapes(timesteps)
            return _simulate_term_rows_pallas_f32(
                contract_key,
                contract_tail,
                timesteps=tail,
                rows=rows,
                cols=cols,
                payoff=PayoffKind.TERMINAL,
                term_shapes=(vs[m:], rs[m:], qs[m:]),
                antithetic=antithetic_half is not None,
                row_offset=row_offset,
                interpret=interpret,
            )
        return simulate_terminal_rows_pallas(
            contract_key,
            contract_tail,
            timesteps=tail,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
    if payoff == PayoffKind.DIGITAL:
        # digital = sign transform of the SAME terminal draw: every route
        # below (term kernel, flat kernel, XLA fallback) is inherited
        # stream-identically (ops/gbm.py::PayoffKind.DIGITAL)
        terminal = simulate_underlier_rows_pallas(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            term=term,
            interpret=interpret,
        )
        strike = contract[1].astype(dtype)
        return strike + jnp.sign(terminal - strike)
    if term is not None:
        if scheme == PathScheme.LOG_EULER and (
            (
                interpret
                and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
                and rows % min(BLOCK_ROWS, rows) == 0
                and cols % min(BLOCK_COLS, cols) == 0
            )
            or pallas_supported(dtype=dtype, rows=rows, cols=cols)
        ):
            return _simulate_term_rows_pallas_f32(
                contract_key,
                contract,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                payoff=payoff,
                term_shapes=term.shapes(timesteps),
                barrier_rel=barrier_rel,
                antithetic=antithetic_half is not None,
                row_offset=row_offset,
                interpret=interpret,
            )
        from spectralmc_tpu.ops.gbm import simulate_underlier_rows

        return simulate_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            payoff=payoff,
            row_offset=row_offset,
            barrier_rel=barrier_rel,
            antithetic_half=antithetic_half,
            term=term,
        )
    if payoff == PayoffKind.TERMINAL:
        return simulate_terminal_rows_pallas(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
    interpretable = (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
    )
    if not (interpretable or pallas_supported(dtype=dtype, rows=rows, cols=cols)):
        from spectralmc_tpu.ops.gbm import simulate_underlier_rows

        return simulate_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            scheme=scheme,
            payoff=payoff,
            row_offset=row_offset,
            barrier_rel=barrier_rel,
            antithetic_half=antithetic_half,
        )
    return _simulate_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        scheme=scheme,
        payoff=payoff,
        barrier_rel=barrier_rel,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# American (LSMC) monitor-row kernel — the forward pass of the Bermudan
# pricer (ops/american.py). The backward induction is the fused-moment
# reduction in ops/american.py::_lsmc_backward (every Gram/rhs entry a
# monomial moment sum; unrolled scalar Cholesky) and stays in XLA; before
# that fusion the per-date basis-matrix regression dominated end-to-end
# pricing (~93% at 1M paths x 16 dates — benchmarks/american_lab.py), so
# the forward kernel alone is NOT the whole performance story.
# --------------------------------------------------------------------------


# Out-block VMEM budget for the [n_monitor, block_rows, block_cols] emission.
# The out block is DOUBLE-BUFFERED across grid steps, so its footprint is
# 2x this budget; a quarter of the 16 MiB v5e scoped-VMEM limit leaves the
# other half for the state block and random-bit buffers. (8 MiB here let
# T=64 pick block_rows=128 — an exactly-8MiB block whose double buffer blew
# the 16 MiB scoped limit by 212 KiB once scan machinery was added.)
# Block rows shrink (256 -> 8) until the block fits.
_MONITOR_VMEM_BUDGET = 4 * 1024 * 1024
# Full static unroll of the monitor loop caps code size here; production
# American grids are 8-64 dates (bench: 16).
_MONITOR_MAX_DATES = 128


def _monitor_block_rows(
    rows: int, block_cols: int, n_monitor: int, n_state: int = 1
) -> int | None:
    """Largest block-row count whose out block(s) fit the VMEM budget.

    ``n_state`` is the number of emitted [n_monitor, rows, cols] row-sets:
    1 for GBM/Merton (the spot is Markov), 2 for Heston (price + variance)
    and arithmetic baskets (price + dispersion) whose regression basis needs
    the second state variable.
    """
    for br in (256, 128, 64, 32, 16, 8):
        if (
            rows % br == 0
            and n_state * n_monitor * br * block_cols * 4 <= _MONITOR_VMEM_BUDGET
        ):
            return br
    return None


def pallas_american_supported(
    *,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    timesteps: int,
    exercise_every: int,
    n_state: int = 1,
) -> bool:
    """Whether a fused American monitor-row kernel can honor this request.

    Single source of truth for ``gbm.resolve_implementation``'s AMERICAN
    branch and the wrappers' own fallbacks (the ``pallas_supported``
    contract: the engine recorded in a checkpoint must be the one that ran).
    """
    if exercise_every < 1 or timesteps % exercise_every:
        return False
    n_monitor = timesteps // exercise_every
    return (
        pallas_supported(dtype=dtype, rows=rows, cols=cols)
        and 2 <= n_monitor <= _MONITOR_MAX_DATES
        and _monitor_block_rows(rows, min(BLOCK_COLS, cols), n_monitor, n_state)
        is not None
    )


def _american_monitor_interpretable(
    *,
    interpret: bool,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    timesteps: int,
    exercise_every: int,
    n_state: int = 1,
) -> bool:
    """Interpreter-mode acceptance — same structural gates minus the TPU."""
    if not (interpret and jnp.dtype(dtype) == jnp.dtype(jnp.float32)):
        return False
    if exercise_every < 1 or timesteps % exercise_every:
        return False
    n_monitor = timesteps // exercise_every
    return (
        2 <= n_monitor <= _MONITOR_MAX_DATES
        and cols % min(BLOCK_COLS, cols) == 0
        and _monitor_block_rows(rows, min(BLOCK_COLS, cols), n_monitor, n_state)
        is not None
    )


def _american_seeds_params(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    block_rows: int,
    row_offset: jax.Array | int,
    param_dim: int,
) -> tuple[jax.Array, jax.Array]:
    """(params, seeds) SMEM payloads shared by every monitor-row launch."""
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, param_dim)
    return params, seeds


def _encode_american_rows(
    price_rows: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    exercise_every: int,
    put: bool,
    basis_degree: int,
    axis_name: str | None,
    extra_rows: jax.Array | None = None,
    cross_fit: bool = False,
) -> jax.Array:
    """Backward induction + encode over kernel-emitted monitor rows.

    Every contract layout puts (strike, maturity, rate) at slots 1-3
    (BlackScholesContract/HestonContract/MertonContract ``as_array``), so
    one encode serves all four dynamics — and it is byte-identical to the
    XLA engines' ``ops.american.encode_monitor_prices`` tail.
    """
    from spectralmc_tpu.ops.american import encode_monitor_prices

    strike, maturity, rate = (contract[i].astype(jnp.float32) for i in (1, 2, 3))
    dt = maturity / jnp.asarray(timesteps, jnp.float32)
    return encode_monitor_prices(
        price_rows,
        strike=strike,
        maturity=maturity,
        rate=rate,
        disc_monitor=jnp.exp(-rate * dt * jnp.float32(exercise_every)),
        dtype=jnp.float32,
        put=put,
        basis_degree=basis_degree,
        axis_name=axis_name,
        extra_rows=extra_rows,
        cross_fit=cross_fit,
    )


def _gbm_monitor_block_kernel(
    params_ref,  # SMEM (1, 6): spot, strike, maturity, rate, div, vol
    seeds_ref,  # SMEM (1, 3) int32: threefry key words + row-block offset
    out_ref,  # VMEM (n_monitor, block_rows, block_cols) PRICE rows
    *,
    timesteps: int,
    exercise_every: int,
    rows_per_block: int,
    cols_per_block: int,
    antithetic: bool,
) -> None:
    """Log-Euler GBM emitting exp(log S) at every monitor date.

    Within a monitor segment only the segment END is observed, so log-Euler's
    additive increments admit the terminal kernel's pair-step shortcut:
    ``exercise_every // 2`` pair steps (one Box–Muller draw advances two
    timesteps via z1+z2 = r·√2·sin(θ+π/4)) plus one single step on odd
    segment lengths. The monitor loop is statically unrolled
    (n_monitor <= _MONITOR_MAX_DATES). Draw order per segment — pairs then
    the odd single — IS the american_gbm v1 stream definition.
    """
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    spot = params_ref[0, 0]
    maturity = params_ref[0, 2]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    dt = maturity / jnp.float32(timesteps)
    vol_sdt = vol * jnp.sqrt(dt)
    drift = (rate - div_yield - jnp.float32(0.5) * vol * vol) * dt
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def step_single(logx: jax.Array) -> jax.Array:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        z = _mirror(_bm_radius(u1) * _sin_turns(u2 + jnp.float32(0.25)))
        return logx + drift + vol_sdt * z

    def step_pair(logx: jax.Array) -> jax.Array:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        z_sum = _mirror(
            _bm_radius(u1)
            * jnp.float32(math.sqrt(2.0))
            * _sin_turns(u2 + jnp.float32(0.125))
        )
        return logx + jnp.float32(2.0) * drift + vol_sdt * z_sum

    logx = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    for d in range(timesteps // exercise_every):
        logx = _fori_unrolled(exercise_every // 2, step_pair, logx)
        if exercise_every % 2:
            logx = step_single(logx)
        out_ref[d, :, :] = jnp.exp(logx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "put", "basis_degree", "exercise_every",
        "antithetic", "axis_name", "interpret", "cross_fit", "fused_backward",
    ),
)
def _simulate_american_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    put: bool,
    basis_degree: int,
    exercise_every: int,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    axis_name: str | None = None,
    cross_fit: bool = False,
    fused_backward: int = 0,  # 0 = shared XLA, 1 = VMEM fused, 2 = streamed
    interpret: bool = False,
) -> jax.Array:
    from spectralmc_tpu.ops.american import check_monitor_grid

    check_monitor_grid(timesteps, exercise_every)
    n_monitor = timesteps // exercise_every
    block_cols = min(BLOCK_COLS, cols)
    block_rows = _monitor_block_rows(rows, block_cols, n_monitor)
    if block_rows is None or cols % block_cols:
        raise ValueError(
            f"pallas american path needs rows with a VMEM-fitting block "
            f"(rows={rows}, cols={cols}, monitors={n_monitor})"
        )
    params, seeds = _american_seeds_params(
        contract_key, contract,
        block_rows=block_rows, row_offset=row_offset, param_dim=6,
    )
    kernel = functools.partial(
        _gbm_monitor_block_kernel,
        timesteps=timesteps,
        exercise_every=exercise_every,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        antithetic=antithetic,
    )
    price_rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_monitor, rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(rows // block_rows, cols // block_cols),
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_monitor, block_rows, block_cols),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * cols * timesteps,
            bytes_accessed=n_monitor * rows * cols * 4,
            transcendentals=3 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)

    if fused_backward:
        # the fused Pallas backwards (ops/lsmc_pallas.py): 1 = the cashflow
        # carrier resident in VMEM, one HBM pass over the rows; 2 = the
        # streamed variant for carriers past the VMEM budget (HBM carrier,
        # one lagged policy+moment sweep per date). Callers route through
        # the support predicates — reaching here unsupported is a contract
        # violation, so the kernels' own errors may surface.
        from spectralmc_tpu.ops.lsmc_pallas import (
            lsmc_fused_backward,
            lsmc_streamed_backward,
        )

        strike, maturity, rate = (contract[i].astype(jnp.float32) for i in (1, 2, 3))
        dt = maturity / jnp.asarray(timesteps, jnp.float32)
        backward = lsmc_fused_backward if fused_backward == 1 else lsmc_streamed_backward
        return backward(
            price_rows,
            strike=strike,
            disc_monitor=jnp.exp(-rate * dt * jnp.float32(exercise_every)),
            df_total=jnp.exp(-rate * maturity),
            put=put,
            basis_degree=basis_degree,
            interpret=interpret,
        )
    return _encode_american_rows(
        price_rows, contract,
        timesteps=timesteps, exercise_every=exercise_every,
        put=put, basis_degree=basis_degree, axis_name=axis_name,
        cross_fit=cross_fit,
    )


def simulate_american_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    option: "object",
    basis_degree: int = 5,
    exercise_every: int = 1,
    row_offset: jax.Array | int = 0,
    antithetic_half: int | None = None,
    axis_name: str | None = None,
    cross_fit: bool = False,
    fused_backward: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``[rows, cols]`` synthetic AMERICAN underliers with the fused
    monitor-row kernel as the forward pass (ops/american.py docstring for
    the encoding contract). By default the backward induction —
    ``encode_monitor_prices`` — is byte-for-byte the XLA engine's estimator,
    so the two engines differ ONLY in the forward bit stream (hardware PRNG
    vs threefry), exactly the terminal kernels' contract.

    ``fused_backward=True`` (checkpointed via
    ``SimulationParams.lsmc_fused_backward``) runs a fused Pallas backward
    instead (ops/lsmc_pallas.py): the VMEM-resident kernel where the
    carrier fits, the STREAMED variant past the VMEM cap — the same
    estimator definition at different float reduction orders, versioned
    under ``LSMC_BACKWARD_VERSIONS`` — see that module's stream-version
    story. When neither can honor the request (cross-fit pair, mesh axis,
    unsupported shape) it falls back to the shared XLA backward; the
    trainer records the EFFECTIVE backward through
    ``resolve_lsmc_backward``'s predicates so checkpoints never claim a
    backward that did not run. Falls back to the XLA path entirely when the
    forward kernel is unsupported.
    """
    from spectralmc_tpu.ops.greeks import OptionSide

    backward_kind = 0
    if fused_backward:
        from spectralmc_tpu.ops.lsmc_pallas import (
            lsmc_fused_backward_supported,
            lsmc_streamed_backward_supported,
        )

        n_monitor = max(timesteps // exercise_every, 1)
        if lsmc_fused_backward_supported(
            dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor,
            cross_fit=cross_fit, axis_name=axis_name,
        ) or (
            interpret
            and _fused_backward_ok_interpret(
                dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor,
                cross_fit=cross_fit, axis_name=axis_name,
            )
        ):
            backward_kind = 1
        elif lsmc_streamed_backward_supported(
            dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor,
            cross_fit=cross_fit, axis_name=axis_name,
        ) or (
            interpret
            and _streamed_backward_ok_interpret(
                dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor,
                cross_fit=cross_fit, axis_name=axis_name,
            )
        ):
            backward_kind = 2
    if not (
        _american_monitor_interpretable(
            interpret=interpret, dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every,
        )
        or pallas_american_supported(
            dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every,
        )
    ):
        from spectralmc_tpu.ops.american import simulate_american_underlier_rows

        return simulate_american_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            option=option,
            basis_degree=basis_degree,
            exercise_every=exercise_every,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            axis_name=axis_name,
            cross_fit=cross_fit,
        )
    return _simulate_american_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        put=option == OptionSide.PUT,
        basis_degree=basis_degree,
        exercise_every=exercise_every,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        axis_name=axis_name,
        cross_fit=cross_fit,
        fused_backward=backward_kind,
        interpret=interpret,
    )


def _fused_backward_ok_interpret(
    *,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
    cross_fit: bool,
    axis_name: str | None,
) -> bool:
    """Interpreter-mode fused-backward acceptance (hermetic test path)."""
    from spectralmc_tpu.ops.lsmc_pallas import _fused_backward_interpretable

    return (
        not cross_fit
        and axis_name is None
        and _fused_backward_interpretable(
            interpret=True, dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor
        )
    )


def _streamed_backward_ok_interpret(
    *,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
    cross_fit: bool,
    axis_name: str | None,
) -> bool:
    """Interpreter-mode streamed-backward acceptance (hermetic test path)."""
    from spectralmc_tpu.ops.lsmc_pallas import _streamed_backward_interpretable

    return (
        not cross_fit
        and axis_name is None
        and _streamed_backward_interpretable(
            interpret=True, dtype=dtype, rows=rows, cols=cols, n_monitor=n_monitor
        )
    )


# --------------------------------------------------------------------------
# Heston kernel (second model family; ops/heston.py defines the XLA path)
# --------------------------------------------------------------------------


def _heston_block_kernel(
    params_ref,  # SMEM (1, 10): spot strike T r q v0 kappa theta xi rho
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    out_ref,  # VMEM (rows_per_block, cols_per_block)
    *,
    timesteps: int,
    payoff: PayoffKind,
    rows_per_block: int,
    cols_per_block: int,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    forward_start_step: int | None = None,
) -> None:
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
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
    dt = maturity / jnp.float32(timesteps)
    sqrt_dt = jnp.sqrt(dt)
    rho_bar = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    rq_dt = (rate - div_yield) * dt
    # hoisted variance-recursion scalars; full truncation keeps RAW v as the
    # base (only drift/diffusion see v+): v' = v + k*theta*dt - k*dt*v+ + ...
    kdt = kappa * dt
    ktheta_dt = kappa * theta * dt
    shape = (rows_per_block, cols_per_block)

    geometric = payoff == PayoffKind.ASIAN_GEOMETRIC
    barrier = payoff in BARRIER_PAYOFFS
    lookback = payoff in LOOKBACK_PAYOFFS
    variance = payoff == PayoffKind.VARIANCE_SWAP
    forward_start = payoff == PayoffKind.FORWARD_START
    track_extreme = barrier or lookback
    up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
    extreme_fn = jnp.maximum if up else jnp.minimum
    inv_n = jnp.float32(1.0 / timesteps)
    # in-block antithetic pairing (see _gbm_block_kernel): negating the 2D
    # Gaussian pair preserves the spot-variance correlation
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def step(
        carry: tuple[jax.Array, jax.Array, jax.Array]
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        logx, v, acc = carry
        # ONE Box-Muller pair per step: r*cos and r*sin are independent
        # normals — z_v drives the variance, z_w the orthogonal spot part.
        # sin+cos come from one fold with shared powers (_sincos_turns):
        # +21% end-to-end vs two separate sine evaluations (heston_lab.py).
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        radius = _bm_radius(u1)
        sin_t, cos_t = _sincos_turns(u2)
        z_v = _mirror(radius * cos_t)
        z_s = rho * z_v + rho_bar * _mirror(radius * sin_t)
        v_plus = jnp.maximum(v, jnp.float32(0.0))
        # sqrt(v)*sqrt(dt) fused into one sqrt; recursion uses hoisted scalars
        sqrt_v_sdt = jnp.sqrt(v_plus * dt)
        if variance:
            inc = rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v_sdt * z_s
            logx = logx + inc
            acc = acc + inc * inc
            v = v + ktheta_dt - kdt * v_plus + xi * sqrt_v_sdt * z_v
            return (logx, v, acc)
        logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v_sdt * z_s
        v = v + ktheta_dt - kdt * v_plus + xi * sqrt_v_sdt * z_v
        if track_extreme:
            acc = extreme_fn(acc, logx)
        elif payoff != PayoffKind.TERMINAL:
            acc = acc + (logx if geometric else jnp.exp(logx))
        return (logx, v, acc)

    log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    vinit = jnp.full(shape, 1.0, jnp.float32) * v0
    if forward_start:
        # the variance state couples S_m to the tail: walk the full path and
        # capture ln S_m (state after step m−1) in a third VMEM block
        def step_fs(
            t: jax.Array, carry: tuple[jax.Array, jax.Array, jax.Array]
        ) -> tuple[jax.Array, jax.Array, jax.Array]:
            logx, v, cap = carry
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            radius = _bm_radius(u1)
            sin_t, cos_t = _sincos_turns(u2)
            z_v = _mirror(radius * cos_t)
            z_s = rho * z_v + rho_bar * _mirror(radius * sin_t)
            v_plus = jnp.maximum(v, jnp.float32(0.0))
            sqrt_v_sdt = jnp.sqrt(v_plus * dt)
            logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v_sdt * z_s
            v = v + ktheta_dt - kdt * v_plus + xi * sqrt_v_sdt * z_v
            cap = jnp.where(t == jnp.int32(forward_start_step - 1), logx, cap)
            return (logx, v, cap)

        logx, _, cap = _fori_unrolled_idx(timesteps, step_fs, (log0, vinit, log0))
        out_ref[:, :] = spot * jnp.exp(logx - cap)  # spot·S_T/S_m
        return
    logx, _, acc = _fori_unrolled(
        timesteps,
        step,
        (log0, vinit, log0 if track_extreme else jnp.zeros(shape, jnp.float32)),
    )
    if lookback:
        out_ref[:, :] = lookback_underlier(
            payoff, params_ref[0, 1], jnp.exp(acc), jnp.exp(logx)
        )
    elif barrier:
        level = jnp.log(spot * jnp.float32(barrier_rel))
        knocked = acc >= level if up else acc <= level
        out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], jnp.exp(logx))
    elif payoff == PayoffKind.TERMINAL:
        out_ref[:, :] = jnp.exp(logx)
    elif variance:
        out_ref[:, :] = acc / maturity  # annualized RV (ops/gbm.py::PayoffKind)
    elif geometric:
        out_ref[:, :] = jnp.exp(acc * inv_n)
    else:
        out_ref[:, :] = acc * inv_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "payoff", "barrier_rel", "antithetic",
        "forward_start_step", "interpret",
    ),
)
def _simulate_heston_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    payoff: PayoffKind,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    forward_start_step: int | None = None,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 10)
    kernel = functools.partial(
        _heston_block_kernel,
        timesteps=timesteps,
        payoff=payoff,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        barrier_rel=barrier_rel,
        antithetic=antithetic,
        forward_start_step=forward_start_step,
    )
    grid = (rows // block_rows, cols // block_cols)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 10), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=24 * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=5 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)


def simulate_heston_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    payoff: PayoffKind,
    row_offset: jax.Array | int = 0,
    barrier_rel: float | None = None,
    antithetic_half: int | None = None,
    forward_start_step: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused Heston kernel; falls back to the XLA scan when unsupported."""
    if payoff == PayoffKind.DIGITAL:
        # digital = sign transform of the SAME terminal draw (every engine
        # route inherited; ops/gbm.py::PayoffKind.DIGITAL)
        terminal = simulate_heston_underlier_rows_pallas(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
        strike = contract[1].astype(dtype)
        return strike + jnp.sign(terminal - strike)
    interpretable = (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
    )
    if not (interpretable or pallas_supported(dtype=dtype, rows=rows, cols=cols)):
        from spectralmc_tpu.ops.heston import simulate_heston_underlier_rows

        return simulate_heston_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=payoff,
            row_offset=row_offset,
            barrier_rel=barrier_rel,
            antithetic_half=antithetic_half,
            forward_start_step=forward_start_step,
        )
    return _simulate_heston_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        payoff=payoff,
        barrier_rel=barrier_rel,
        antithetic=antithetic_half is not None,
        forward_start_step=forward_start_step,
        row_offset=row_offset,
        interpret=interpret,
    )


def _heston_monitor_block_kernel(
    params_ref,  # SMEM (1, 10): spot strike T r q v0 kappa theta xi rho
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    price_ref,  # VMEM (n_monitor, block_rows, block_cols) PRICE rows
    var_ref,  # VMEM (n_monitor, block_rows, block_cols) max(v, 0) rows
    *,
    timesteps: int,
    exercise_every: int,
    rows_per_block: int,
    cols_per_block: int,
    antithetic: bool,
) -> None:
    """Heston full-truncation Euler emitting (exp(log S), v+) per monitor
    date — BOTH state variables, because the continuation value depends on
    the variance too (ops/american.py basis augmentation [v, v·x, v²]).
    Per-step draw order is the heston v3 kernel's (one Box–Muller pair:
    z_v = r·cos drives the variance, the orthogonal part r·sin the spot);
    the stream is versioned separately as american_heston v1."""
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
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
    dt = maturity / jnp.float32(timesteps)
    rho_bar = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    rq_dt = (rate - div_yield) * dt
    kdt = kappa * dt
    ktheta_dt = kappa * theta * dt
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def step(carry: tuple[jax.Array, jax.Array]) -> tuple[jax.Array, jax.Array]:
        logx, v = carry
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        radius = _bm_radius(u1)
        sin_t, cos_t = _sincos_turns(u2)
        z_v = _mirror(radius * cos_t)
        z_s = rho * z_v + rho_bar * _mirror(radius * sin_t)
        v_plus = jnp.maximum(v, jnp.float32(0.0))
        sqrt_v_sdt = jnp.sqrt(v_plus * dt)
        logx = logx + rq_dt - jnp.float32(0.5) * v_plus * dt + sqrt_v_sdt * z_s
        v = v + ktheta_dt - kdt * v_plus + xi * sqrt_v_sdt * z_v
        return (logx, v)

    logx = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    v = jnp.full(shape, 1.0, jnp.float32) * v0
    for d in range(timesteps // exercise_every):
        logx, v = _fori_unrolled(exercise_every, step, (logx, v))
        price_ref[d, :, :] = jnp.exp(logx)
        var_ref[d, :, :] = jnp.maximum(v, jnp.float32(0.0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "put", "basis_degree", "exercise_every",
        "antithetic", "axis_name", "interpret", "cross_fit",
    ),
)
def _simulate_heston_american_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    put: bool,
    basis_degree: int,
    exercise_every: int,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    from spectralmc_tpu.ops.american import check_monitor_grid

    check_monitor_grid(timesteps, exercise_every)
    n_monitor = timesteps // exercise_every
    block_cols = min(BLOCK_COLS, cols)
    block_rows = _monitor_block_rows(rows, block_cols, n_monitor, n_state=2)
    if block_rows is None or cols % block_cols:
        raise ValueError(
            f"pallas heston-american path needs rows with a VMEM-fitting "
            f"block (rows={rows}, cols={cols}, monitors={n_monitor})"
        )
    params, seeds = _american_seeds_params(
        contract_key, contract,
        block_rows=block_rows, row_offset=row_offset, param_dim=10,
    )
    kernel = functools.partial(
        _heston_monitor_block_kernel,
        timesteps=timesteps,
        exercise_every=exercise_every,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        antithetic=antithetic,
    )
    out_struct = jax.ShapeDtypeStruct((n_monitor, rows, cols), jnp.float32)
    out_spec = pl.BlockSpec(
        (n_monitor, block_rows, block_cols),
        lambda i, j: (0, i, j),
        memory_space=pltpu.VMEM,
    )
    price_rows, var_rows = pl.pallas_call(
        kernel,
        out_shape=(out_struct, out_struct),
        grid_spec=pl.GridSpec(
            grid=(rows // block_rows, cols // block_cols),
            in_specs=[
                pl.BlockSpec((1, 10), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(out_spec, out_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=24 * rows * cols * timesteps,
            bytes_accessed=2 * n_monitor * rows * cols * 4,
            transcendentals=5 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)

    return _encode_american_rows(
        price_rows, contract,
        timesteps=timesteps, exercise_every=exercise_every,
        put=put, basis_degree=basis_degree, axis_name=axis_name,
        extra_rows=var_rows,
        cross_fit=cross_fit,
    )


def simulate_heston_american_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    option: "object",
    basis_degree: int = 5,
    exercise_every: int = 1,
    row_offset: jax.Array | int = 0,
    antithetic_half: int | None = None,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Heston American underliers via the fused monitor-row kernel; falls
    back to the XLA LSMC path when unsupported. The backward induction —
    variance-augmented basis included — is byte-identical to the XLA
    engine's (``_encode_american_rows``)."""
    from spectralmc_tpu.ops.greeks import OptionSide

    if not (
        _american_monitor_interpretable(
            interpret=interpret, dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every, n_state=2,
        )
        or pallas_american_supported(
            dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every, n_state=2,
        )
    ):
        from spectralmc_tpu.ops.american import (
            simulate_heston_american_underlier_rows,
        )

        return simulate_heston_american_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            option=option,
            basis_degree=basis_degree,
            exercise_every=exercise_every,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            axis_name=axis_name,
            cross_fit=cross_fit,
        )
    return _simulate_heston_american_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        put=option == OptionSide.PUT,
        basis_degree=basis_degree,
        exercise_every=exercise_every,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        axis_name=axis_name,
        cross_fit=cross_fit,
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# Basket kernel (third model family; ops/basket.py defines the XLA path)
# --------------------------------------------------------------------------


def _basket_block_kernel(
    params_ref,  # SMEM (1, 6): spot strike T r q vol
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    out_ref,  # VMEM (rows_per_block, cols_per_block)
    *,
    timesteps: int,
    payoff: PayoffKind,
    rows_per_block: int,
    cols_per_block: int,
    weights: tuple[float, ...],
    spot_multipliers: tuple[float, ...],
    vol_multipliers: tuple[float, ...],
    chol: tuple[tuple[float, ...], ...],
    geometric_combine: bool,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    forward_start_step: int | None = None,
) -> None:
    """Fused multi-asset GBM: A correlated log-Euler components per path.

    The basket structure (weights/multipliers/Cholesky rows) is STATIC per
    BasketSpec and baked into the kernel as immediates — the A×A mix is an
    unrolled lower-triangular FMA chain in registers, not a matmul (A is
    3-8; the MXU has nothing to chew on at that size, and the XLA path's
    einsum was VPU-bound anyway). Normals come from shared Box–Muller pairs:
    assets (2a, 2a+1) take r·cos / r·sin of ONE draw (independent normals),
    so A assets cost ⌈A/2⌉ uniform pairs per step.
    """
    a_n = len(weights)
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    spot = params_ref[0, 0]
    maturity = params_ref[0, 2]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    dt = maturity / jnp.float32(timesteps)
    sqrt_dt = jnp.sqrt(dt)
    # per-asset scalars (traced from SMEM x static multipliers)
    sig_sdt = [vol * jnp.float32(m) * sqrt_dt for m in vol_multipliers]
    drift = [
        (rate - div_yield - jnp.float32(0.5) * (vol * jnp.float32(m)) ** 2) * dt
        for m in vol_multipliers
    ]
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    geometric_time = payoff == PayoffKind.ASIAN_GEOMETRIC
    barrier = payoff in BARRIER_PAYOFFS
    lookback = payoff in LOOKBACK_PAYOFFS
    track_extreme = barrier or lookback
    terminal = payoff == PayoffKind.TERMINAL
    up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
    extreme_fn = jnp.maximum if up else jnp.minimum
    inv_n = jnp.float32(1.0 / timesteps)

    def raw_normals() -> list[jax.Array]:
        z: list[jax.Array] = []
        for _pair in range((a_n + 1) // 2):
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            radius = _bm_radius(u1)
            sin_t, cos_t = _sincos_turns(u2)
            z.append(_mirror(radius * cos_t))
            if len(z) < a_n:
                z.append(_mirror(radius * sin_t))
        return z

    def basket_value(logx: list[jax.Array]) -> jax.Array:
        if geometric_combine:
            acc = jnp.float32(weights[0]) * logx[0]
            for a in range(1, a_n):
                acc = acc + jnp.float32(weights[a]) * logx[a]
            return jnp.exp(acc)
        acc = jnp.float32(weights[0]) * jnp.exp(logx[0])
        for a in range(1, a_n):
            acc = acc + jnp.float32(weights[a]) * jnp.exp(logx[a])
        return acc

    def advance(logx: tuple[jax.Array, ...]) -> list[jax.Array]:
        z = raw_normals()
        new_logx = []
        for a in range(a_n):
            # lower-triangular Cholesky mix, unrolled with static immediates
            zm = jnp.float32(chol[a][0]) * z[0]
            for b in range(1, a + 1):
                if chol[a][b] != 0.0:
                    zm = zm + jnp.float32(chol[a][b]) * z[b]
            new_logx.append(logx[a] + drift[a] + sig_sdt[a] * zm)
        return new_logx

    log0 = tuple(
        jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot * jnp.float32(m))
        for m in spot_multipliers
    )

    if payoff == PayoffKind.FORWARD_START:
        # arithmetic combine reaches here (the wrapper routes the geometric
        # combine through the terminal-tail trick): walk the full path and
        # capture B_m (state after step m−1)
        def step_fs(
            t: jax.Array, carry: tuple[tuple[jax.Array, ...], jax.Array]
        ) -> tuple[tuple[jax.Array, ...], jax.Array]:
            logx, cap = carry
            new_logx = advance(logx)
            cap = jnp.where(
                t == jnp.int32(forward_start_step - 1), basket_value(new_logx), cap
            )
            return (tuple(new_logx), cap)

        b0 = basket_value(list(log0))
        logx_f, cap_f = _fori_unrolled_idx(timesteps, step_fs, (log0, b0))
        # u = B₀·B_T/B_m (ops/gbm.py::PayoffKind.FORWARD_START)
        out_ref[:, :] = b0 * basket_value(list(logx_f)) / cap_f
        return

    if payoff == PayoffKind.VARIANCE_SWAP:
        # realized variance of the BASKET value (combine convention): the
        # geometric combine's ln B is the weighted log-sum directly; the
        # arithmetic combine takes ln of the mixed value
        def log_basket_value(logx: tuple[jax.Array, ...]) -> jax.Array:
            if geometric_combine:
                lb = jnp.float32(weights[0]) * logx[0]
                for a in range(1, a_n):
                    lb = lb + jnp.float32(weights[a]) * logx[a]
                return lb
            return jnp.log(basket_value(logx))

        def step_var(
            carry: tuple[tuple[jax.Array, ...], jax.Array, jax.Array]
        ) -> tuple[tuple[jax.Array, ...], jax.Array, jax.Array]:
            logx, prev_lb, acc = carry
            new_logx = advance(logx)
            lb = log_basket_value(new_logx)
            inc = lb - prev_lb
            return (tuple(new_logx), lb, acc + inc * inc)

        _, _, acc_v = _fori_unrolled(
            timesteps,
            step_var,
            (log0, log_basket_value(list(log0)), jnp.zeros(shape, jnp.float32)),
        )
        out_ref[:, :] = acc_v / maturity  # annualized (ops/gbm.py::PayoffKind)
        return

    def step(carry: tuple[PyTree, jax.Array]) -> tuple[PyTree, jax.Array]:
        logx, acc = carry
        new_logx = advance(logx)
        if track_extreme:
            acc = extreme_fn(acc, basket_value(new_logx))
        elif not terminal:
            value = basket_value(new_logx)
            acc = acc + (jnp.log(value) if geometric_time else value)
        return (tuple(new_logx), acc)

    acc0 = basket_value(list(log0)) if track_extreme else jnp.zeros(shape, jnp.float32)
    logx, acc = _fori_unrolled(timesteps, step, (log0, acc0))
    logx = list(logx)
    if lookback:
        out_ref[:, :] = lookback_underlier(
            payoff, params_ref[0, 1], acc, basket_value(logx)
        )
    elif barrier:
        # level = initial basket value x barrier_rel (matches the XLA path)
        g0 = 0.0
        if geometric_combine:
            for a in range(a_n):
                g0 += weights[a] * math.log(spot_multipliers[a])
            level = spot * jnp.float32(math.exp(g0) * barrier_rel)
        else:
            for a in range(a_n):
                g0 += weights[a] * spot_multipliers[a]
            level = spot * jnp.float32(g0 * barrier_rel)
        knocked = acc >= level if up else acc <= level
        out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], basket_value(logx))
    elif terminal:
        out_ref[:, :] = basket_value(logx)
    elif geometric_time:
        out_ref[:, :] = jnp.exp(acc * inv_n)
    else:
        out_ref[:, :] = acc * inv_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "timesteps", "rows", "cols", "payoff", "barrier_rel", "antithetic",
        "forward_start_step", "interpret",
    ),
)
def _simulate_basket_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    spec: "object",
    timesteps: int,
    rows: int,
    cols: int,
    payoff: PayoffKind,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    forward_start_step: int | None = None,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    from spectralmc_tpu.ops.basket import BasketCombine, basket_cholesky

    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 6)
    chol = tuple(tuple(float(x) for x in row) for row in basket_cholesky(spec))
    kernel = functools.partial(
        _basket_block_kernel,
        timesteps=timesteps,
        payoff=payoff,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        weights=tuple(spec.weights),
        spot_multipliers=tuple(spec.spot_multipliers),
        vol_multipliers=tuple(spec.vol_multipliers),
        chol=chol,
        geometric_combine=spec.combine == BasketCombine.GEOMETRIC,
        barrier_rel=barrier_rel,
        antithetic=antithetic,
        forward_start_step=forward_start_step,
    )
    grid = (rows // block_rows, cols // block_cols)
    a_n = spec.n_assets
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 * a_n + 2 * a_n * a_n) * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=(2 * a_n) * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)


def simulate_basket_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    spec: "object",
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    payoff: PayoffKind,
    row_offset: jax.Array | int = 0,
    barrier_rel: float | None = None,
    antithetic_half: int | None = None,
    forward_start_step: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused basket kernel; falls back to the XLA scan when unsupported."""
    from spectralmc_tpu.ops.basket import BasketCombine as _BC

    if (
        payoff == PayoffKind.FORWARD_START
        and getattr(spec, "combine", None) == _BC.GEOMETRIC
    ):
        # the geometric combine's B_T/B_m is the effective GBM's tail ratio:
        # route through the terminal kernel at the tail length with maturity
        # rescaled to preserve dt (GBM/Merton precedent). The arithmetic
        # combine couples B_m to per-asset levels and takes the in-kernel
        # capture branch below.
        assert forward_start_step is not None
        fs_supported = (
            interpret
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and rows % min(BLOCK_ROWS, rows) == 0
            and cols % min(BLOCK_COLS, cols) == 0
        ) or pallas_supported(dtype=dtype, rows=rows, cols=cols)
        if not fs_supported:
            from spectralmc_tpu.ops.basket import simulate_basket_underlier_rows

            return simulate_basket_underlier_rows(
                contract_key,
                contract,
                spec=spec,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                dtype=dtype,
                payoff=payoff,
                row_offset=row_offset,
                antithetic_half=antithetic_half,
                forward_start_step=forward_start_step,
            )
        tail = timesteps - forward_start_step
        return simulate_basket_underlier_rows_pallas(
            contract_key,
            contract.at[2].multiply(tail / timesteps),
            spec=spec,
            timesteps=tail,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
    if payoff == PayoffKind.DIGITAL:
        # digital = sign transform of the SAME terminal draw (every engine
        # route inherited; ops/gbm.py::PayoffKind.DIGITAL)
        terminal = simulate_basket_underlier_rows_pallas(
            contract_key,
            contract,
            spec=spec,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
        strike = contract[1].astype(dtype)
        return strike + jnp.sign(terminal - strike)
    interpretable = (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
    )
    if not (interpretable or pallas_supported(dtype=dtype, rows=rows, cols=cols)):
        from spectralmc_tpu.ops.basket import simulate_basket_underlier_rows

        return simulate_basket_underlier_rows(
            contract_key,
            contract,
            spec=spec,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=payoff,
            row_offset=row_offset,
            barrier_rel=barrier_rel,
            antithetic_half=antithetic_half,
            forward_start_step=forward_start_step,
        )
    return _simulate_basket_rows_pallas_f32(
        contract_key,
        contract,
        spec=spec,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        payoff=payoff,
        barrier_rel=barrier_rel,
        antithetic=antithetic_half is not None,
        forward_start_step=forward_start_step,
        row_offset=row_offset,
        interpret=interpret,
    )

def _basket_monitor_block_kernel(
    params_ref,  # SMEM (1, 6): spot strike T r q vol
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    price_ref,  # VMEM (n_monitor, block_rows, block_cols) BASKET value rows
    disp_ref,  # VMEM (n_monitor, ...) ln(B_arith/B_geom) rows (arith only)
    *,
    timesteps: int,
    exercise_every: int,
    rows_per_block: int,
    cols_per_block: int,
    weights: tuple[float, ...],
    spot_multipliers: tuple[float, ...],
    vol_multipliers: tuple[float, ...],
    chol: tuple[tuple[float, ...], ...],
    geometric_combine: bool,
    antithetic: bool,
) -> None:
    """Correlated multi-asset GBM emitting the combined BASKET value (and,
    for arithmetic combines, the log dispersion ln(B_arith/B_geom) — the
    second regression state, ops/american.py) per monitor date. Per-step
    draw order is the basket v1 kernel's (⌈A/2⌉ shared Box–Muller pairs,
    static Cholesky FMA mix); versioned american_basket_gbm v1. For
    geometric combines ``disp_ref`` is written zeros (ln B IS Markov) and
    the launch drops it."""
    a_n = len(weights)
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    spot = params_ref[0, 0]
    maturity = params_ref[0, 2]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    dt = maturity / jnp.float32(timesteps)
    sqrt_dt = jnp.sqrt(dt)
    sig_sdt = [vol * jnp.float32(m) * sqrt_dt for m in vol_multipliers]
    drift = [
        (rate - div_yield - jnp.float32(0.5) * (vol * jnp.float32(m)) ** 2) * dt
        for m in vol_multipliers
    ]
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def raw_normals() -> list[jax.Array]:
        z: list[jax.Array] = []
        for _pair in range((a_n + 1) // 2):
            u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
            u2 = _uniform_24bit(gen_shape)
            radius = _bm_radius(u1)
            sin_t, cos_t = _sincos_turns(u2)
            z.append(_mirror(radius * cos_t))
            if len(z) < a_n:
                z.append(_mirror(radius * sin_t))
        return z

    def step(logx: tuple) -> tuple:
        z = raw_normals()
        new_logx = []
        for a in range(a_n):
            zm = jnp.float32(chol[a][0]) * z[0]
            for b in range(1, a + 1):
                if chol[a][b] != 0.0:
                    zm = zm + jnp.float32(chol[a][b]) * z[b]
            new_logx.append(logx[a] + drift[a] + sig_sdt[a] * zm)
        return tuple(new_logx)

    logx = tuple(
        jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot * jnp.float32(m))
        for m in spot_multipliers
    )
    for d in range(timesteps // exercise_every):
        logx = _fori_unrolled(exercise_every, step, logx)
        lg = jnp.float32(weights[0]) * logx[0]
        for a in range(1, a_n):
            lg = lg + jnp.float32(weights[a]) * logx[a]
        if geometric_combine:
            price_ref[d, :, :] = jnp.exp(lg)
            disp_ref[d, :, :] = jnp.zeros(shape, jnp.float32)
        else:
            b_arith = jnp.float32(weights[0]) * jnp.exp(logx[0])
            for a in range(1, a_n):
                b_arith = b_arith + jnp.float32(weights[a]) * jnp.exp(logx[a])
            price_ref[d, :, :] = b_arith
            disp_ref[d, :, :] = jnp.log(b_arith) - lg


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "timesteps", "rows", "cols", "put", "basis_degree",
        "exercise_every", "antithetic", "axis_name", "interpret", "cross_fit",
    ),
)
def _simulate_basket_american_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    spec: "object",
    timesteps: int,
    rows: int,
    cols: int,
    put: bool,
    basis_degree: int,
    exercise_every: int,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    from spectralmc_tpu.ops.american import check_monitor_grid
    from spectralmc_tpu.ops.basket import BasketCombine, basket_cholesky

    check_monitor_grid(timesteps, exercise_every)
    geometric = spec.combine == BasketCombine.GEOMETRIC
    n_monitor = timesteps // exercise_every
    block_cols = min(BLOCK_COLS, cols)
    block_rows = _monitor_block_rows(rows, block_cols, n_monitor, n_state=2)
    if block_rows is None or cols % block_cols:
        raise ValueError(
            f"pallas basket-american path needs rows with a VMEM-fitting "
            f"block (rows={rows}, cols={cols}, monitors={n_monitor})"
        )
    params, seeds = _american_seeds_params(
        contract_key, contract,
        block_rows=block_rows, row_offset=row_offset, param_dim=6,
    )
    chol = tuple(tuple(float(x) for x in row) for row in basket_cholesky(spec))
    kernel = functools.partial(
        _basket_monitor_block_kernel,
        timesteps=timesteps,
        exercise_every=exercise_every,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        weights=tuple(spec.weights),
        spot_multipliers=tuple(spec.spot_multipliers),
        vol_multipliers=tuple(spec.vol_multipliers),
        chol=chol,
        geometric_combine=geometric,
        antithetic=antithetic,
    )
    out_struct = jax.ShapeDtypeStruct((n_monitor, rows, cols), jnp.float32)
    out_spec = pl.BlockSpec(
        (n_monitor, block_rows, block_cols),
        lambda i, j: (0, i, j),
        memory_space=pltpu.VMEM,
    )
    a_n = spec.n_assets
    price_rows, disp_rows = pl.pallas_call(
        kernel,
        out_shape=(out_struct, out_struct),
        grid_spec=pl.GridSpec(
            grid=(rows // block_rows, cols // block_cols),
            in_specs=[
                pl.BlockSpec((1, 6), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(out_spec, out_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 * a_n + 2 * a_n * a_n) * rows * cols * timesteps,
            bytes_accessed=2 * n_monitor * rows * cols * 4,
            transcendentals=(2 * a_n) * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)

    return _encode_american_rows(
        price_rows, contract,
        timesteps=timesteps, exercise_every=exercise_every,
        put=put, basis_degree=basis_degree, axis_name=axis_name,
        extra_rows=None if geometric else disp_rows,
        cross_fit=cross_fit,
    )


def simulate_basket_american_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    spec: "object",
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    option: "object",
    basis_degree: int = 5,
    exercise_every: int = 1,
    row_offset: jax.Array | int = 0,
    antithetic_half: int | None = None,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Basket American underliers via the fused monitor-row kernel; falls
    back to the XLA LSMC path when unsupported. Exercise compares strike
    against the COMBINED basket value; arithmetic combines carry the log
    dispersion as the second regression state (ops/american.py)."""
    from spectralmc_tpu.ops.greeks import OptionSide

    if not (
        _american_monitor_interpretable(
            interpret=interpret, dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every, n_state=2,
        )
        or pallas_american_supported(
            dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every, n_state=2,
        )
    ):
        from spectralmc_tpu.ops.american import (
            simulate_basket_american_underlier_rows,
        )

        return simulate_basket_american_underlier_rows(
            contract_key,
            contract,
            spec=spec,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            option=option,
            basis_degree=basis_degree,
            exercise_every=exercise_every,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            axis_name=axis_name,
            cross_fit=cross_fit,
        )
    return _simulate_basket_american_rows_pallas_f32(
        contract_key,
        contract,
        spec=spec,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        put=option == OptionSide.PUT,
        basis_degree=basis_degree,
        exercise_every=exercise_every,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        axis_name=axis_name,
        cross_fit=cross_fit,
        interpret=interpret,
    )


# --------------------------------------------------------------------------
# Merton kernel (fourth model family; ops/merton.py defines the XLA path)
# --------------------------------------------------------------------------


# Static inverse-CDF depth: counts cap at 16 per step. For lam*dt <= ~3.2
# the cap is UNREACHABLE — P(N > 16) < 2^-24, and a 24-bit uniform can never
# land in tail mass below 2^-24, so the capped sampler emits exactly the
# counts an unbounded inverse CDF would. Beyond that (> 3.2 expected jumps
# PER STEP — a grid coarser than any sane config) counts saturate at 16 with
# bias P(N > 16). Chosen over the exact-any-mu while_loop form after
# on-chip ablation (benchmarks/merton_lab.py): Mosaic's while machinery cost
# 45% of kernel throughput even at zero tail iterations (3.0e10 vs 4.4e10
# path-steps/s); static unrolling restores MXU/VPU pipelining.
_POISSON_TERMS = 16


def _poisson_counts(u: jax.Array, mu: jax.Array) -> jax.Array:
    """Inverse-CDF Poisson(mu) counts from one uniform per lane.

    The pmf recursion p_k = p_{k-1}*mu/k and its running cdf are SCALARS
    (they depend only on mu), so each of the ``_POISSON_TERMS`` statically
    unrolled levels costs ONE vector compare+add: a lane's count is the
    number of cdf levels at or below its uniform. See the cap note above —
    THE merton v1 count definition.

    jax.random.poisson (the XLA path) uses Knuth/transformed-rejection — a
    different bit stream entirely; the engines are separately versioned
    (PALLAS_STREAM_VERSIONS["merton_jump"]).
    """
    p = jnp.exp(-mu)
    cdf = p
    cnt = jnp.zeros_like(u)
    for k in range(1, _POISSON_TERMS + 1):
        cnt = cnt + (u >= cdf).astype(jnp.float32)
        p = p * mu / jnp.float32(k)
        cdf = cdf + p
    return cnt


def _merton_block_kernel(
    params_ref,  # SMEM (1, 9): spot strike T r q vol lam jump_mean jump_std
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    out_ref,  # VMEM (rows_per_block, cols_per_block)
    *,
    timesteps: int,
    payoff: PayoffKind,
    rows_per_block: int,
    cols_per_block: int,
    barrier_rel: float | None = None,
    antithetic: bool = False,
) -> None:
    """Fused Merton jump-diffusion: exact transition, in-register Poisson.

    Per step, ONE Box-Muller pair supplies both Gaussians — z_d = r*cos
    drives the diffusion, z_j = r*sin the jump size (independent normals,
    the Heston kernel's trick) — and ONE extra uniform drives the
    inverse-CDF Poisson count (``_poisson_counts``). Conditional on the
    count the jump sum is exactly Gaussian (ops/merton.py:239), so the step
    is bias-free like the XLA path. Draw order per step: (u1, u2) then u_c —
    THE merton_jump v1 stream definition.

    Antithetic pairing mirrors the XLA convention in-block: the Gaussian
    pair flips sign, the Poisson counts are SHARED (common random numbers
    for the jump channel — a partner with its own counts would break the
    pathwise-Greeks CRN contract, ops/merton.py:134-146).
    """
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    spot = params_ref[0, 0]
    maturity = params_ref[0, 2]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    lam = params_ref[0, 6]
    jump_mean = params_ref[0, 7]
    jump_std = params_ref[0, 8]
    dt = maturity / jnp.float32(timesteps)
    vol_sdt = vol * jnp.sqrt(dt)
    # -lam*m compensator keeps the discounted spot a martingale (merton.py:190)
    m = jnp.exp(jump_mean + jnp.float32(0.5) * jump_std * jump_std) - jnp.float32(1.0)
    drift = (rate - div_yield - lam * m - jnp.float32(0.5) * vol * vol) * dt
    lam_dt = lam * dt
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def _share(c: jax.Array) -> jax.Array:
        return jnp.concatenate([c, c], axis=0) if antithetic else c

    geometric = payoff == PayoffKind.ASIAN_GEOMETRIC
    barrier = payoff in BARRIER_PAYOFFS
    lookback = payoff in LOOKBACK_PAYOFFS
    variance = payoff == PayoffKind.VARIANCE_SWAP
    track_extreme = barrier or lookback
    up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
    extreme_fn = jnp.maximum if up else jnp.minimum
    inv_n = jnp.float32(1.0 / timesteps)

    def step(carry: tuple[PyTree, jax.Array]) -> tuple[PyTree, jax.Array]:
        logx, acc = carry
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        radius = _bm_radius(u1)
        sin_t, cos_t = _sincos_turns(u2)
        z_d = _mirror(radius * cos_t)
        z_j = _mirror(radius * sin_t)
        counts = _share(_poisson_counts(_uniform_24bit(gen_shape), lam_dt))
        jump = counts * jump_mean + jump_std * jnp.sqrt(counts) * z_j
        if variance:
            # summed first so the increment is available; the other branch
            # keeps the original association (bit-stream stability)
            inc = drift + vol_sdt * z_d + jump
            return (logx + inc, acc + inc * inc)
        logx = logx + drift + vol_sdt * z_d + jump
        if track_extreme:
            acc = extreme_fn(acc, logx)
        elif payoff != PayoffKind.TERMINAL:
            acc = acc + (logx if geometric else jnp.exp(logx))
        return (logx, acc)

    log0 = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    logx, acc = _fori_unrolled(
        timesteps, step, (log0, log0 if track_extreme else jnp.zeros(shape, jnp.float32))
    )
    if lookback:
        out_ref[:, :] = lookback_underlier(
            payoff, params_ref[0, 1], jnp.exp(acc), jnp.exp(logx)
        )
    elif barrier:
        level = jnp.log(spot * jnp.float32(barrier_rel))
        knocked = acc >= level if up else acc <= level
        out_ref[:, :] = jnp.where(knocked, params_ref[0, 1], jnp.exp(logx))
    elif payoff == PayoffKind.TERMINAL:
        out_ref[:, :] = jnp.exp(logx)
    elif variance:
        out_ref[:, :] = acc / maturity  # annualized RV (ops/gbm.py::PayoffKind)
    elif geometric:
        out_ref[:, :] = jnp.exp(acc * inv_n)
    else:
        out_ref[:, :] = acc * inv_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "payoff", "barrier_rel", "antithetic", "interpret"
    ),
)
def _simulate_merton_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    payoff: PayoffKind,
    barrier_rel: float | None = None,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    block_rows = min(BLOCK_ROWS, rows)
    block_cols = min(BLOCK_COLS, cols)
    key_data = jax.random.key_data(contract_key)
    row_block = (
        jnp.asarray(row_offset, jnp.uint32) // jnp.uint32(block_rows)
    ).astype(jnp.int32)
    seeds = jnp.concatenate(
        [key_data.astype(jnp.int32).reshape(2), row_block.reshape(1)]
    ).reshape(1, 3)
    params = contract.astype(jnp.float32).reshape(1, 9)
    kernel = functools.partial(
        _merton_block_kernel,
        timesteps=timesteps,
        payoff=payoff,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        barrier_rel=barrier_rel,
        antithetic=antithetic,
    )
    grid = (rows // block_rows, cols // block_cols)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 9), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, block_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=24 * rows * cols * timesteps,
            bytes_accessed=rows * cols * 4,
            transcendentals=5 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)


def simulate_merton_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    payoff: PayoffKind,
    row_offset: jax.Array | int = 0,
    barrier_rel: float | None = None,
    antithetic_half: int | None = None,
    forward_start_step: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused Merton kernel; falls back to the XLA scan when unsupported."""
    if payoff == PayoffKind.FORWARD_START:
        # exact transitions make the tail independent of S_m, so the
        # forward-start kernel IS the terminal kernel at the tail length
        # with maturity rescaled to preserve dt (ops/gbm_pallas.py GBM
        # precedent); unsupported shapes fall back to the XLA
        # FORWARD_START stream directly
        assert forward_start_step is not None
        fs_supported = (
            interpret
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and rows % min(BLOCK_ROWS, rows) == 0
            and cols % min(BLOCK_COLS, cols) == 0
        ) or pallas_supported(dtype=dtype, rows=rows, cols=cols)
        if not fs_supported:
            from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

            return simulate_merton_underlier_rows(
                contract_key,
                contract,
                timesteps=timesteps,
                rows=rows,
                cols=cols,
                dtype=dtype,
                payoff=payoff,
                row_offset=row_offset,
                antithetic_half=antithetic_half,
                forward_start_step=forward_start_step,
            )
        tail = timesteps - forward_start_step
        return simulate_merton_underlier_rows_pallas(
            contract_key,
            contract.at[2].multiply(tail / timesteps),
            timesteps=tail,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
    if payoff == PayoffKind.DIGITAL:
        # digital = sign transform of the SAME terminal draw (every engine
        # route inherited; ops/gbm.py::PayoffKind.DIGITAL)
        terminal = simulate_merton_underlier_rows_pallas(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=PayoffKind.TERMINAL,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            interpret=interpret,
        )
        strike = contract[1].astype(dtype)
        return strike + jnp.sign(terminal - strike)
    interpretable = (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and rows % min(BLOCK_ROWS, rows) == 0
        and cols % min(BLOCK_COLS, cols) == 0
    )
    if not (interpretable or pallas_supported(dtype=dtype, rows=rows, cols=cols)):
        from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

        return simulate_merton_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            payoff=payoff,
            row_offset=row_offset,
            barrier_rel=barrier_rel,
            antithetic_half=antithetic_half,
        )
    return _simulate_merton_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        payoff=payoff,
        barrier_rel=barrier_rel,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        interpret=interpret,
    )


def _merton_monitor_block_kernel(
    params_ref,  # SMEM (1, 9): spot strike T r q vol lam jump_mean jump_std
    seeds_ref,  # SMEM (1, 3) int32: key words + row-block offset
    out_ref,  # VMEM (n_monitor, block_rows, block_cols) PRICE rows
    *,
    timesteps: int,
    exercise_every: int,
    rows_per_block: int,
    cols_per_block: int,
    antithetic: bool,
) -> None:
    """Merton jump-diffusion emitting exp(log S) per monitor date. Per-step
    draw order is the merton v1 kernel's — (u1, u2) Box–Muller pair then the
    Poisson-count uniform, counts SHARED across antithetic partners (the CRN
    contract, ops/merton.py) — one step per timestep (no pair shortcut: the
    per-step Poisson semantics stay identical to the European kernel);
    versioned american_merton_jump v1. The spot alone is Markov, so only
    price rows are emitted."""
    i = pl.program_id(0) + seeds_ref[0, 2]
    j = pl.program_id(1)
    seed_a = seeds_ref[0, 0] ^ (
        (i + 1) * jnp.int32(0x9E3779B1 & 0x7FFFFFFF) + j * jnp.int32(0x85EBCA6B & 0x7FFFFFFF)
    )
    seed_b = seeds_ref[0, 1] ^ (
        (j + 1) * jnp.int32(0xC2B2AE35 & 0x7FFFFFFF) + i * jnp.int32(0x27D4EB2F)
    )
    pltpu.prng_seed(seed_a, seed_b)

    spot = params_ref[0, 0]
    maturity = params_ref[0, 2]
    rate = params_ref[0, 3]
    div_yield = params_ref[0, 4]
    vol = params_ref[0, 5]
    lam = params_ref[0, 6]
    jump_mean = params_ref[0, 7]
    jump_std = params_ref[0, 8]
    dt = maturity / jnp.float32(timesteps)
    vol_sdt = vol * jnp.sqrt(dt)
    m = jnp.exp(jump_mean + jnp.float32(0.5) * jump_std * jump_std) - jnp.float32(1.0)
    drift = (rate - div_yield - lam * m - jnp.float32(0.5) * vol * vol) * dt
    lam_dt = lam * dt
    shape = (rows_per_block, cols_per_block)
    gen_shape = (rows_per_block // 2, cols_per_block) if antithetic else shape

    def _mirror(z: jax.Array) -> jax.Array:
        return jnp.concatenate([z, -z], axis=0) if antithetic else z

    def _share(c: jax.Array) -> jax.Array:
        return jnp.concatenate([c, c], axis=0) if antithetic else c

    def step(logx: jax.Array) -> jax.Array:
        u1 = _uniform_24bit(gen_shape) + jnp.float32(_HALF_ULP)
        u2 = _uniform_24bit(gen_shape)
        radius = _bm_radius(u1)
        sin_t, cos_t = _sincos_turns(u2)
        z_d = _mirror(radius * cos_t)
        z_j = _mirror(radius * sin_t)
        counts = _share(_poisson_counts(_uniform_24bit(gen_shape), lam_dt))
        jump = counts * jump_mean + jump_std * jnp.sqrt(counts) * z_j
        return logx + drift + vol_sdt * z_d + jump

    logx = jnp.full(shape, 0.0, jnp.float32) + jnp.log(spot)
    for d in range(timesteps // exercise_every):
        logx = _fori_unrolled(exercise_every, step, logx)
        out_ref[d, :, :] = jnp.exp(logx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "put", "basis_degree", "exercise_every",
        "antithetic", "axis_name", "interpret", "cross_fit",
    ),
)
def _simulate_merton_american_rows_pallas_f32(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    put: bool,
    basis_degree: int,
    exercise_every: int,
    antithetic: bool = False,
    row_offset: jax.Array | int = 0,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    from spectralmc_tpu.ops.american import check_monitor_grid

    check_monitor_grid(timesteps, exercise_every)
    n_monitor = timesteps // exercise_every
    block_cols = min(BLOCK_COLS, cols)
    block_rows = _monitor_block_rows(rows, block_cols, n_monitor)
    if block_rows is None or cols % block_cols:
        raise ValueError(
            f"pallas merton-american path needs rows with a VMEM-fitting "
            f"block (rows={rows}, cols={cols}, monitors={n_monitor})"
        )
    params, seeds = _american_seeds_params(
        contract_key, contract,
        block_rows=block_rows, row_offset=row_offset, param_dim=9,
    )
    kernel = functools.partial(
        _merton_monitor_block_kernel,
        timesteps=timesteps,
        exercise_every=exercise_every,
        rows_per_block=block_rows,
        cols_per_block=block_cols,
        antithetic=antithetic,
    )
    price_rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_monitor, rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(rows // block_rows, cols // block_cols),
            in_specs=[
                pl.BlockSpec((1, 9), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_monitor, block_rows, block_cols),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=24 * rows * cols * timesteps,
            bytes_accessed=n_monitor * rows * cols * 4,
            transcendentals=5 * rows * cols * timesteps,
        ),
        interpret=interpret,
    )(params, seeds)

    return _encode_american_rows(
        price_rows, contract,
        timesteps=timesteps, exercise_every=exercise_every,
        put=put, basis_degree=basis_degree, axis_name=axis_name,
        cross_fit=cross_fit,
    )


def simulate_merton_american_underlier_rows_pallas(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    option: "object",
    basis_degree: int = 5,
    exercise_every: int = 1,
    row_offset: jax.Array | int = 0,
    antithetic_half: int | None = None,
    axis_name: str | None = None,
    cross_fit: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Merton American underliers via the fused monitor-row kernel; falls
    back to the XLA LSMC path when unsupported."""
    from spectralmc_tpu.ops.greeks import OptionSide

    if not (
        _american_monitor_interpretable(
            interpret=interpret, dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every,
        )
        or pallas_american_supported(
            dtype=dtype, rows=rows, cols=cols,
            timesteps=timesteps, exercise_every=exercise_every,
        )
    ):
        from spectralmc_tpu.ops.american import (
            simulate_merton_american_underlier_rows,
        )

        return simulate_merton_american_underlier_rows(
            contract_key,
            contract,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            option=option,
            basis_degree=basis_degree,
            exercise_every=exercise_every,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            axis_name=axis_name,
            cross_fit=cross_fit,
        )
    return _simulate_merton_american_rows_pallas_f32(
        contract_key,
        contract,
        timesteps=timesteps,
        rows=rows,
        cols=cols,
        put=option == OptionSide.PUT,
        basis_degree=basis_degree,
        exercise_every=exercise_every,
        antithetic=antithetic_half is not None,
        row_offset=row_offset,
        axis_name=axis_name,
        cross_fit=cross_fit,
        interpret=interpret,
    )
