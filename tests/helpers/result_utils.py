"""Result unwrappers (parity: reference tests/helpers/result_utils.py)."""

from __future__ import annotations

from typing import TypeVar

from spectralmc_tpu.core.result import Failure, Result, Success

T = TypeVar("T")
E = TypeVar("E")


def expect_success(result: Result[T, E]) -> T:
    assert isinstance(result, Success), f"expected Success, got {result!r}"
    return result.value


def expect_failure(result: Result[T, E]) -> E:
    assert isinstance(result, Failure), f"expected Failure, got {result!r}"
    return result.error
