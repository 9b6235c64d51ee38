"""Fused Pallas generation kernel for the SOBOL_BB sampling path.

One kernel computes scrambled-Sobol bits -> inverse-CDF normals -> the
Brownian-bridge contraction, writing ONLY the bridged output to HBM. The
XLA pipeline it replaces (``ops/qmc.py::qmc_effective_normals_multi``)
materializes the ``[dims, count]`` normal matrix once (write + read) around
the bridge matmul, so at the QMC lab shape (64 steps x 2M paths, 512 MiB a
pass) generation pays ~3x the fused path's traffic. Measured on v5e in
``benchmarks/qmc_lab.py`` (the round-4 rebuild left the bridge MATMUL as
the binding generation op at ~3.5 ms vs a ~1.3 ms HBM bound; fusing removes
the operand round-trip entirely).

BIT-EXACTNESS CONTRACT (why this is a drop-in, not a new stream): the fused
kernel reproduces the XLA path's output bit for bit —

* the Sobol bits are the same GF(2) algebra over the same split tables
  (``ops/sobol.py::sobol_uint32_t``): point ``n = start + p`` factors into a
  high-bits table row (``c_hi``, seam + digital shift folded in, computed in
  XLA and streamed through the grid) and a low-bits table row
  (``y_lo[n & 1023]``, passed pre-rotated by ``start & 1023`` so any traced
  shard offset is a pure index remap);
* the inverse CDF is the same ``sqrt(2)*erf_inv(2u-1)`` float ops — XLA:TPU
  and Mosaic lower ``erf_inv`` f32 to identical code (probed bit-identical
  on v5e, asserted by ``tests/test_qmc_pallas.py`` in interpret mode and
  on-chip when a TPU is present);
* the bridge contraction is the same ``HIGHEST``-precision f32
  ``dot_general`` on the MXU, K = bridge levels <= 64 in one systolic pass,
  so splitting the point axis across grid steps cannot change any output
  column.

Because the bits, the normals and the contraction are bit-identical, a
``SOBOL_BB`` checkpoint trained on either path resumes on the other with
the same stream — no ``PALLAS_STREAM_VERSIONS`` entry is needed and
``resolve_implementation`` still records the XLA engine for QMC sims (the
fusion is an internal detail of the GENERATOR, not a path-kernel engine).

Reference anchor: the reference has no QMC path sampling at all (its Sobol
use is contract-domain sampling, sobol_sampler.py; path normals are always
cuRAND draws, async_normals.py:213-217) — this module is extension
performance work on the repo's own SOBOL_BB capability.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectralmc_tpu.ops._sobol_directions import MAX_DIMENSION
from spectralmc_tpu.ops.sobol import BITS, _SPLIT_LOG2, _gray_select

_LENGTH = 1 << _SPLIT_LOG2  # low-table points per block (1024)
_MAX_SUB = 8  # sub-blocks (of _LENGTH points) per grid step


def qmc_fused_supported(
    *, timesteps: int, factors: int, count: int, dtype: jnp.dtype
) -> bool:
    """Whether the fused generation kernel can honor this request.

    Mirrors the ``pallas_supported`` discipline (ops/gbm_pallas.py:141): the
    caller falls back to the XLA pipeline — same bits either way, so unlike
    the path-kernel engines no checkpoint field hangs off this predicate.
    Conditions: no padded dimensions (the hybrid threefry tail of
    ``qmc_effective_normals_multi`` takes the XLA bridge), f32 compute, a
    whole number of split-table blocks, and a real TPU.
    """
    return (
        timesteps * factors <= MAX_DIMENSION
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and count % _LENGTH == 0
        and count >= _LENGTH
        and jax.default_backend() == "tpu"
    )


def _inv_cdf_kernel(bits: jax.Array) -> jax.Array:
    """uint32 Sobol fractions -> normals, Mosaic flavor of qmc._inv_cdf.

    Same float ops in the same order, including the top-bucket inf guard
    (see qmc._inv_cdf); only the integer conversion route differs (Mosaic
    cannot cast uint32->float32, so shift then bitcast to int32 — the top 8
    bits are zero, making the int32 value equal and the conversion exact
    either way).
    """
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    u = (top24.astype(jnp.float32) + jnp.float32(0.5)) * jnp.float32(2.0**-24)
    x = jnp.float32(2.0) * u - jnp.float32(1.0)
    x = jnp.where(top24 == jnp.int32(0xFFFFFF), jnp.float32(1.0 - 2.0**-24), x)
    root2 = jnp.float32(1.4142135623730951)
    return root2 * jax.lax.erf_inv(x)


def _bridge_block_kernel(
    off_ref,  # SMEM (1, 1) int32: start & (_LENGTH-1), the low-table rotation
    bb_ref,  # VMEM (T, T) f32: Brownian-bridge increment map
    ylo_ref,  # VMEM (d, _LENGTH) u32: low split table, PRE-ROTATED by off
    ca_ref,  # VMEM (1, d, S) u32: c_hi row for each sub-block's FIRST points
    cb_ref,  # VMEM (1, d, S) u32: c_hi row after the seam (c_hi[j+1])
    out_ref,  # VMEM (T, F, S*_LENGTH) f32: bridged effective normals
    *,
    timesteps: int,
    factors: int,
    sub_blocks: int,
) -> None:
    """One grid step: S sub-blocks of 1024 points, generated and bridged.

    Per sub-block: bits = select(lane < 1024-off, c_hi[j], c_hi[j+1]) XOR
    the rotated low table (the exact point-index algebra is derived in
    ``_fused_effective_normals``), inverse-CDF to normals, then one
    ``[T, T] @ [T, 1024]`` MXU dot per factor writes the output columns.
    Nothing but the output ever touches HBM.
    """
    d = timesteps * factors
    off = off_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, sub_blocks, _LENGTH), 2)
    pick_a = lane < (jnp.int32(_LENGTH) - off)
    ylo = ylo_ref[...]
    # ONE batched select/XOR/inverse over all S sub-blocks, then one MXU dot
    # per factor on the full [d, S*1024] panel (the per-sub-block variant
    # measured ~40% slower on v5e: eight K=64 N=1024 dots underfeed the MXU
    # and the revectorized erf_inv chain re-issues per chunk).
    sel = jnp.where(pick_a, ca_ref[0][:, :, None], cb_ref[0][:, :, None])
    bits = (sel ^ ylo[:, None, :]).reshape(d, sub_blocks * _LENGTH)
    z = _inv_cdf_kernel(bits)  # [d, S*1024] f32, factor-major rows
    for f in range(factors):
        zf = z[f * timesteps : (f + 1) * timesteps]
        out_ref[:, f, :] = jax.lax.dot_general(
            bb_ref[...],
            zf,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit, static_argnames=("timesteps", "factors", "count", "interpret")
)
def _fused_effective_normals(
    directions: jax.Array,  # [d, BITS] u32, flat (level*F + factor) order
    shift: jax.Array,  # [d] u32: host LMS shift ^ per-draw digital shift
    bb: jax.Array,  # [T, T] f32 bridge matrix
    start: jax.Array | int,
    *,
    timesteps: int,
    factors: int,
    count: int,
    interpret: bool = False,
) -> jax.Array:
    """``[T, factors, count]`` bridged normals, bit-identical to the XLA path.

    XLA-side prep is all O(count/1024)-sized table work; the O(count) work
    happens in the kernel. Point-index algebra (``n = start + p``, output
    index ``p``): with ``q = (start & 1023) + p``,

    * low bits: ``n & 1023 = (p + off) & 1023`` — a rotation of the y_lo
      table by ``off``, applied HERE (one [1024, d] roll) so the kernel
      indexes it directly;
    * high bits: ``n >> 10 = (start >> 10) + (q >> 10)`` and within output
      sub-block j the covering block is j while ``p & 1023 < 1024 - off``
      and j+1 after — the kernel's two-row select. ``c_hi`` therefore
      carries ``count/1024 + 1`` rows (the +1 covers any misalignment; at
      off = 0 the second row is simply never selected).

    The factor interleave (flat dim = level*factors + factor,
    ops/qmc.py:139-145) is resolved by permuting the DIRECTION TABLE rows to
    factor-major before any point is generated — permuting the table
    permutes every point's dims identically, so in-kernel factor slices are
    contiguous and the bits stay those of the documented flat order.
    """
    d = timesteps * factors
    if directions.shape[0] != d:
        raise ValueError(
            f"fused QMC path needs unpadded dimensions: table {directions.shape[0]} != "
            f"timesteps*factors {d} (caller must route padded sims to the XLA bridge)"
        )
    if count % _LENGTH:
        raise ValueError(f"count {count} must be a multiple of {_LENGTH}")
    m = count // _LENGTH
    sub_blocks = math.gcd(m, _MAX_SUB)
    grid = m // sub_blocks

    if factors > 1:
        # perm[f*T + l] = l*factors + f: factor-major row f*T+l pulls flat dim
        # l*F + f (level l of factor f)
        i = jnp.arange(d, dtype=jnp.int32)
        perm = (i % timesteps) * factors + i // timesteps
        directions = directions[perm]
        shift = shift[perm]

    start_u = jnp.asarray(start, jnp.uint32)
    blk0 = start_u >> jnp.uint32(_SPLIT_LOG2)
    off = (start_u & jnp.uint32(_LENGTH - 1)).astype(jnp.int32)

    j = jnp.arange(_LENGTH, dtype=jnp.uint32)
    y_lo = _gray_select(directions, j ^ (j >> 1), _SPLIT_LOG2, 0)  # [1024, d]
    y_lo_rot = jnp.roll(y_lo, -off, axis=0).T  # [d, 1024], row p -> n&1023

    blk = blk0 + jnp.arange(m + 1, dtype=jnp.uint32)
    gray_blk = blk ^ (blk >> 1)
    c_hi = _gray_select(directions, gray_blk, BITS - _SPLIT_LOG2, _SPLIT_LOG2)
    seam = (jnp.uint32(0) - (blk & jnp.uint32(1)))[:, None] & directions[
        None, :, _SPLIT_LOG2 - 1
    ].reshape(1, d)
    c_hi = c_hi ^ seam ^ shift[None, :]  # [m + 1, d]
    # grid-major 3-D packing: block g carries its S sub-block columns as the
    # FULL trailing dims (Mosaic requires trailing block dims divisible by
    # (8, 128) or equal to the array's — S is neither, so make it the array)
    c_a = c_hi[:-1].reshape(grid, sub_blocks, d).transpose(0, 2, 1)  # [g, d, S]
    c_b = c_hi[1:].reshape(grid, sub_blocks, d).transpose(0, 2, 1)  # [g, d, S]

    kernel = functools.partial(
        _bridge_block_kernel,
        timesteps=timesteps,
        factors=factors,
        sub_blocks=sub_blocks,
    )
    points_per_step = sub_blocks * _LENGTH
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((timesteps, factors, count), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (timesteps, timesteps), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((d, _LENGTH), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, d, sub_blocks), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, d, sub_blocks), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (timesteps, factors, points_per_step),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * timesteps * d * count,
            bytes_accessed=timesteps * factors * count * 4,
            transcendentals=6 * d * count,
        ),
        interpret=interpret,
    )(off.reshape(1, 1), bb, y_lo_rot, c_a, c_b)


# --------------------------------------------------------------------------
# Fused QMC-fed walk (round 5): generation + log-Euler path walk, one kernel
# --------------------------------------------------------------------------


def qmc_walk_supported(
    *, timesteps: int, count: int, dtype: jnp.dtype
) -> bool:
    """Whether the fused QMC WALK kernel can honor this request.

    Same acceptance as the generation kernel (single factor) — the walk is
    the generation kernel plus an in-VMEM scan, so anything the generator
    rejects (padded dims, non-f32, partial blocks, no TPU) the walk rejects
    too. Like the generation fusion this is an internal routing detail, not
    an engine: the emitted payoff underliers are BIT-IDENTICAL to the XLA
    scan over the fused generator's tensor (gated on-chip by
    tests/test_qmc_pallas.py), so no checkpoint field hangs off it.
    """
    return qmc_fused_supported(
        timesteps=timesteps, factors=1, count=count, dtype=dtype
    )


def _walk_block_kernel(
    off_ref,  # SMEM (1, 1) int32: start & (_LENGTH-1), the low-table rotation
    wp_ref,  # SMEM (1, 3) f32: log_spot, per-step log drift, vol·√dt
    bb_ref,  # VMEM (T, T) f32: Brownian-bridge increment map
    ylo_ref,  # VMEM (d, _LENGTH) u32: low split table, PRE-ROTATED by off
    ca_ref,  # VMEM (1, d, S) u32: c_hi row for each sub-block's FIRST points
    cb_ref,  # VMEM (1, d, S) u32: c_hi row after the seam (c_hi[j+1])
    out_ref,  # VMEM (1, S*_LENGTH) f32: the walk accumulator (Σ_t log S_t)
    *,
    timesteps: int,
    sub_blocks: int,
) -> None:
    """One grid step: S sub-blocks of 1024 paths, generated, bridged, WALKED.

    The generation half is ``_bridge_block_kernel`` verbatim (same bits);
    the bridged effective normals then feed the flat log-Euler recursion
    ``logx ← (logx + drift) + vol√dt · eff[t]`` with the Asian-geometric
    accumulator ``acc ← acc + logx`` — the same expression trees as the XLA
    scan body (ops/gbm.py), whose f32 adds/muls are IEEE-exact on both
    backends, so the emitted accumulator is bit-identical to scanning the
    generator's tensor. Nothing [T, ·]-sized ever reaches HBM: traffic is
    the split tables in and ONE f32 per path out.
    """
    d = timesteps
    off = off_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, sub_blocks, _LENGTH), 2)
    pick_a = lane < (jnp.int32(_LENGTH) - off)
    ylo = ylo_ref[...]
    sel = jnp.where(pick_a, ca_ref[0][:, :, None], cb_ref[0][:, :, None])
    bits = (sel ^ ylo[:, None, :]).reshape(d, sub_blocks * _LENGTH)
    z = _inv_cdf_kernel(bits)  # [T, S*1024] f32
    eff = jax.lax.dot_general(
        bb_ref[...],
        z,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [T, S*1024] bridged per-step normals
    log_spot = wp_ref[0, 0]
    drift = wp_ref[0, 1]
    vol_sdt = wp_ref[0, 2]
    n = sub_blocks * _LENGTH
    logx = jnp.full((1, n), 0.0, jnp.float32) + log_spot
    acc = jnp.zeros((1, n), jnp.float32)
    for t in range(timesteps):
        logx = (logx + drift) + vol_sdt * eff[t : t + 1, :]
        acc = acc + logx
    out_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("timesteps", "count", "interpret")
)
def _fused_qmc_walk_acc(
    directions: jax.Array,  # [T, BITS] u32
    shift: jax.Array,  # [T] u32: host LMS shift ^ per-draw digital shift
    bb: jax.Array,  # [T, T] f32 bridge matrix
    start: jax.Array | int,
    log_spot: jax.Array,
    drift: jax.Array,  # per-step log drift (flat)
    vol_sdt: jax.Array,  # vol·√dt (flat)
    *,
    timesteps: int,
    count: int,
    interpret: bool = False,
) -> jax.Array:
    """``[count]`` Asian-geometric log accumulators Σ_t log S_t, fused.

    XLA-side prep is identical to ``_fused_effective_normals`` (same tables,
    same point-index algebra — that docstring derives it); the kernel walks
    the bridged normals in VMEM instead of writing them, so the honest
    path-dependent QMC sim stops paying the [T, rows, cols] tensor's HBM
    round trip (docs/performance.md's round-5 target: generation+walk at
    the pseudo scan's rate or better).
    """
    d = timesteps
    if directions.shape[0] != d:
        raise ValueError(
            f"fused QMC walk needs unpadded dimensions: table "
            f"{directions.shape[0]} != timesteps {d}"
        )
    if count % _LENGTH:
        raise ValueError(f"count {count} must be a multiple of {_LENGTH}")
    m = count // _LENGTH
    sub_blocks = math.gcd(m, _MAX_SUB)
    grid = m // sub_blocks

    start_u = jnp.asarray(start, jnp.uint32)
    blk0 = start_u >> jnp.uint32(_SPLIT_LOG2)
    off = (start_u & jnp.uint32(_LENGTH - 1)).astype(jnp.int32)

    j = jnp.arange(_LENGTH, dtype=jnp.uint32)
    y_lo = _gray_select(directions, j ^ (j >> 1), _SPLIT_LOG2, 0)  # [1024, d]
    y_lo_rot = jnp.roll(y_lo, -off, axis=0).T  # [d, 1024]

    blk = blk0 + jnp.arange(m + 1, dtype=jnp.uint32)
    gray_blk = blk ^ (blk >> 1)
    c_hi = _gray_select(directions, gray_blk, BITS - _SPLIT_LOG2, _SPLIT_LOG2)
    seam = (jnp.uint32(0) - (blk & jnp.uint32(1)))[:, None] & directions[
        None, :, _SPLIT_LOG2 - 1
    ].reshape(1, d)
    c_hi = c_hi ^ seam ^ shift[None, :]  # [m + 1, d]
    c_a = c_hi[:-1].reshape(grid, sub_blocks, d).transpose(0, 2, 1)  # [g, d, S]
    c_b = c_hi[1:].reshape(grid, sub_blocks, d).transpose(0, 2, 1)  # [g, d, S]

    wparams = jnp.stack(
        [
            jnp.asarray(log_spot, jnp.float32),
            jnp.asarray(drift, jnp.float32),
            jnp.asarray(vol_sdt, jnp.float32),
        ]
    ).reshape(1, 3)
    kernel = functools.partial(
        _walk_block_kernel, timesteps=timesteps, sub_blocks=sub_blocks
    )
    points_per_step = sub_blocks * _LENGTH
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, count), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda g: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (timesteps, timesteps), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((d, _LENGTH), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, d, sub_blocks), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, d, sub_blocks), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, points_per_step), lambda g: (0, g), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * timesteps + 4) * timesteps * count,
            bytes_accessed=count * 4,
            transcendentals=6 * timesteps * count,
        ),
        interpret=interpret,
    )(off.reshape(1, 1), wparams, bb, y_lo_rot, c_a, c_b)
    return acc.reshape(count)


def qmc_asian_geo_underliers(
    contract_key: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    mc_seed: int,
    row_offset: jax.Array | int,
    log_spot: jax.Array,
    drift: jax.Array,
    vol_sdt: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """``[rows, cols]`` ASIAN_GEOMETRIC underliers, SOBOL_BB, fully fused.

    Bit-identical drop-in for the XLA scan over
    ``qmc_effective_normals`` (ops/gbm.py's Asian branch): same scramble and
    shift stream (``_qmc_tables`` + the same key split), same bridged
    normals (the generation algebra is shared with
    ``_fused_effective_normals``), same walk expression trees, and the final
    ``exp(acc/T)`` applied HERE in XLA so every transcendental comes from
    the same lowering as the scan path. Caller must have checked
    ``qmc_walk_supported``.
    """
    from spectralmc_tpu.ops.qmc import _qmc_tables, brownian_bridge_matrix, qmc_sobol_dims

    sdims = qmc_sobol_dims(timesteps, 1)
    directions_np, host_shift_np = _qmc_tables(sdims, mc_seed)
    directions = jnp.asarray(directions_np)
    host_shift = jnp.asarray(host_shift_np)
    shift_key, _pad_key = jax.random.split(contract_key)
    draw_shift = jax.random.bits(shift_key, (sdims,), dtype=jnp.uint32)
    count = rows * cols
    start = jnp.asarray(row_offset, jnp.uint32) * jnp.uint32(cols)
    bb32 = jnp.asarray(brownian_bridge_matrix(timesteps), dtype=jnp.float32)
    acc = _fused_qmc_walk_acc(
        directions,
        host_shift ^ draw_shift,
        bb32,
        start,
        log_spot,
        drift,
        vol_sdt,
        timesteps=timesteps,
        count=count,
        interpret=interpret,
    )
    mean = acc.reshape(rows, cols) / jnp.asarray(timesteps, dtype)
    return jnp.exp(mean)


__all__ = [
    "qmc_fused_supported",
    "qmc_walk_supported",
    "qmc_asian_geo_underliers",
    "_fused_effective_normals",
    "_fused_qmc_walk_acc",
]
