"""Canonical test entry point (parity: reference test_runner.py:20-48,
``poetry run test-all``). Forwards to pytest with the repo defaults.

Usage: ``python -m spectralmc_tpu.test_runner [extra pytest args]``
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    import pytest

    args = ["tests/", "-q"] + (argv if argv is not None else sys.argv[1:])
    return pytest.main(args)


if __name__ == "__main__":
    raise SystemExit(main())
