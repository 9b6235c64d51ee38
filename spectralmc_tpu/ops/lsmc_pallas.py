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
LSMC_BACKWARD_VERSIONS: dict[str, int] = {"fused": 1}

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


__all__ = [
    "LSMC_BACKWARD_VERSIONS",
    "lsmc_fused_backward",
    "lsmc_fused_backward_supported",
]
