"""Result ADT behavior (parity: reference result.py semantics)."""

from __future__ import annotations

import pytest

from spectralmc_tpu.core.result import (
    Failure,
    Success,
    UnwrapError,
    collect_results,
    fold_results,
    partition_results,
)


def test_success_monadic_ops() -> None:
    res = Success(2).map(lambda x: x + 1).and_then(lambda x: Success(x * 10))
    assert res == Success(30)
    assert Success(5).unwrap_or(0) == 5
    assert Success(5).expect("boom") == 5
    assert Success(5).map_err(lambda e: "x") == Success(5)


def test_failure_short_circuits() -> None:
    res = Failure("err").map(lambda x: x + 1).and_then(lambda x: Success(x))
    assert res == Failure("err")
    assert Failure("err").unwrap_or(7) == 7
    assert Failure("err").map_err(str.upper) == Failure("ERR")
    with pytest.raises(UnwrapError):
        Failure("err").expect("boom")


def test_collect_results_first_failure_wins() -> None:
    assert collect_results([Success(1), Success(2)]) == Success((1, 2))
    assert collect_results([Success(1), Failure("a"), Failure("b")]) == Failure("a")


def test_partition_results() -> None:
    vals, errs = partition_results([Success(1), Failure("a"), Success(3)])
    assert vals == (1, 3)
    assert errs == ("a",)


def test_fold_results_early_exit() -> None:
    seen: list[int] = []

    def step(acc: int, x: int):
        seen.append(x)
        if x == 3:
            return Failure("stop")
        return Success(acc + x)

    assert fold_results([1, 2, 3, 4], step, 0) == Failure("stop")
    assert seen == [1, 2, 3]
    assert fold_results([1, 2], step, 0) == Success(3)


def test_frozen() -> None:
    s = Success(1)
    with pytest.raises(Exception):
        s.value = 2  # type: ignore[misc]
