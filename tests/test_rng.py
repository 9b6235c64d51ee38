"""Deterministic key-stream tests.

These subsume the reference's async_normals snapshot/restore contract
(tests/test_async_normals.py): with stateless keys, "restore after N draws"
must equal "continue after N draws" bit-exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.ops import rng
from tests.helpers.result_utils import expect_failure, expect_success


def test_build_config_validation() -> None:
    expect_success(rng.build_normal_stream_config(rows=4, cols=8, seed=1))
    assert expect_failure(rng.build_normal_stream_config(rows=0, cols=8, seed=1)).rows == 0
    assert expect_failure(rng.build_normal_stream_config(rows=4, cols=8, seed=-1)).seed == -1
    err = expect_failure(rng.build_normal_stream_config(rows=4, cols=8, seed=1, counter=-2))
    assert err.counter == -2


@pytest.mark.parametrize("precision", [Precision.float32, Precision.float64])
def test_resume_equals_continuous(precision: Precision) -> None:
    cfg = expect_success(
        rng.build_normal_stream_config(rows=16, cols=32, seed=42, precision=precision)
    )
    # continuous: draw 5 matrices
    continuous = []
    state = cfg
    for _ in range(5):
        continuous.append(np.asarray(rng.stream_normals(state)))
        state = rng.advance(state)
    # restore at counter=3 and continue
    restored = cfg.model_copy(update={"counter": 3})
    again = np.asarray(rng.stream_normals(restored))
    np.testing.assert_array_equal(again, continuous[3])
    assert continuous[0].dtype == precision.to_np()


def test_draws_are_distinct_and_standard_normal() -> None:
    cfg = expect_success(rng.build_normal_stream_config(rows=64, cols=256, seed=7))
    a = np.asarray(rng.stream_normals(cfg))
    b = np.asarray(rng.stream_normals(rng.advance(cfg)))
    assert not np.array_equal(a, b)
    assert abs(a.mean()) < 0.05
    assert abs(a.std() - 1.0) < 0.05


def test_counter_may_be_traced() -> None:
    import jax

    key = rng.base_key(3)

    @jax.jit
    def draw(counter):
        return rng.normal_matrix(key, counter, 4, 4, jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(draw(2)), np.asarray(rng.normal_matrix(key, 2, 4, 4, jnp.float32))
    )
