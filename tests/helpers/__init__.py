"""Shared test helpers (parity: reference tests/helpers/)."""

from tests.helpers.result_utils import expect_failure, expect_success

__all__ = ["expect_failure", "expect_success"]
