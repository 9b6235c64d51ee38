"""Precision policy (parity: reference models/numerical.py tests)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spectralmc_tpu.core.precision import Precision, ReducedPrecision, real_dtype_of
from tests.helpers.result_utils import expect_failure, expect_success


def test_dtype_maps_roundtrip() -> None:
    for p in Precision:
        assert expect_success(Precision.from_np(p.to_np())) is p
        assert jnp.dtype(p.to_jnp()).name == p.value


def test_complex_bijection() -> None:
    assert Precision.float32.to_complex() is Precision.complex64
    assert Precision.float64.to_complex() is Precision.complex128
    assert Precision.complex64.from_complex() is Precision.float32
    assert Precision.complex128.from_complex() is Precision.float64
    assert real_dtype_of(Precision.complex128) == jnp.dtype("float64")


def test_from_np_rejects_reduced() -> None:
    err = expect_failure(Precision.from_np(np.dtype("float16")))
    assert err.dtype == "float16"


def test_x64_available_under_test_config() -> None:
    # conftest enables x64; float64 must validate.
    expect_success(Precision.float64.validate_available())


def test_reduced_precision_is_storage_only() -> None:
    assert ReducedPrecision.bfloat16.to_jnp() == jnp.dtype("bfloat16")
    assert "bfloat16" not in {p.value for p in Precision}
