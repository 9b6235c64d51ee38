"""Deterministic stateless RNG key streams.

This module replaces the reference's entire latency-hiding cuRAND stream pool
(``/root/reference/src/spectralmc/async_normals.py:105-466``,
``ConcurrentNormGenerator`` + ``_NormGenerator``) with a *key-derivation
convention*: threefry keys are counter-addressed, so

* "enqueue ahead on a private stream" collapses to nothing — XLA dispatch is
  already asynchronous;
* the checkpointed ``skips`` offset becomes a plain integer ``counter``;
* restore is ``fold_in(key(seed), counter)`` instead of fast-forwarding a
  stateful generator (reference async_normals.py:319-321).

Everything here is pure and jit-safe; the ``counter`` may be a traced value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict

from spectralmc_tpu.core.errors.rng import InvalidCounter, InvalidShape, RngError, SeedOutOfRange
from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.core.result import Failure, Result, Success

_MAX_SEED = 2**63 - 1


class NormalStreamConfig(BaseModel):
    """Checkpointable description of a normal-matrix stream.

    Parity: ``ConcurrentNormGeneratorConfig`` (reference async_normals.py:155-165)
    — ``(rows, cols, seed, dtype, skips)`` — minus the buffer machinery.
    """

    model_config = ConfigDict(frozen=True, extra="forbid")

    rows: int
    cols: int
    seed: int
    counter: int = 0
    precision: Precision = Precision.float32


def build_normal_stream_config(
    *, rows: int, cols: int, seed: int, counter: int = 0, precision: Precision = Precision.float32
) -> Result[NormalStreamConfig, RngError]:
    if rows <= 0 or cols <= 0:
        return Failure(InvalidShape(rows=rows, cols=cols, reason="rows and cols must be positive"))
    if not (0 <= seed <= _MAX_SEED):
        return Failure(SeedOutOfRange(seed=seed, reason=f"seed must be in [0, {_MAX_SEED}]"))
    if counter < 0:
        return Failure(InvalidCounter(counter=counter, reason="counter must be non-negative"))
    return Success(
        NormalStreamConfig(rows=rows, cols=cols, seed=seed, counter=counter, precision=precision)
    )


def base_key(seed: int) -> jax.Array:
    """The root threefry key for a seed."""
    return jax.random.PRNGKey(seed)


def draw_key(key: jax.Array, counter: jax.Array | int) -> jax.Array:
    """The key for the ``counter``-th draw of a stream (the new "skip")."""
    return jax.random.fold_in(key, counter)


def normal_matrix(
    key: jax.Array,
    counter: jax.Array | int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
) -> jax.Array:
    """Standard-normal ``[rows, cols]`` matrix for draw index ``counter``.

    Bit-exact for a given (seed, counter, shape, dtype) on every backend —
    this single property subsumes the reference's snapshot/restore contract
    for its normals pool (async_normals.py:298-355).
    """
    return jax.random.normal(draw_key(key, counter), (rows, cols), dtype=dtype)


def stream_normals(cfg: NormalStreamConfig) -> jax.Array:
    """Materialize the matrix for the stream's current counter."""
    return normal_matrix(
        base_key(cfg.seed), cfg.counter, cfg.rows, cfg.cols, cfg.precision.to_jnp()
    )


def advance(cfg: NormalStreamConfig, draws: int = 1) -> NormalStreamConfig:
    """Pure successor state after ``draws`` matrices have been consumed."""
    return cfg.model_copy(update={"counter": cfg.counter + draws})
