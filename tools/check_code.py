#!/usr/bin/env python
"""Fail-fast static-verification pipeline (reference tools/check_code.py).

Runs every checker family in order and stops at the first failure, then
(optionally) external linters if they are installed. The reference chains
its custom checkers with ruff/black/mypy the same way (SURVEY §2.10).

    python tools/check_code.py [--no-external]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.static_checks.cli import main as family_main

FAMILIES = ("layering", "purity", "immutability", "construction", "type-safety")
EXTERNAL = (
    ("ruff", ["ruff", "check", "spectralmc_tpu", "tools", "tests"]),
    ("mypy", ["mypy", "--ignore-missing-imports", "spectralmc_tpu"]),
)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="fail-fast check pipeline")
    parser.add_argument("--no-external", action="store_true", help="skip ruff/mypy")
    args = parser.parse_args(argv)

    for family in FAMILIES:
        print(f"==> {family}")
        rc = family_main(family, [])
        if rc != 0:
            print(f"FAILED at {family}", file=sys.stderr)
            return rc

    print("==> pyproject")
    import os

    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "check_pyproject.py")],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if proc.returncode != 0:
        print("FAILED at pyproject", file=sys.stderr)
        return proc.returncode

    # annotation-coverage census (mypy is not installable in this image, so
    # the type-enforcement gap must be quantified, not silent): floors are
    # the measured round-5 values — coverage may only ratchet up, Any only
    # down (tools/type_coverage.py docstring). The round-5 sweep replaced
    # every use-site Any with honest aliases (core/aliases.py PyTree/
    # EffectResult, jax.typing ArrayLike/DTypeLike, object for opaque
    # registry values); the 8 that remain are the alias DEFINITIONS plus
    # the **kwargs shims, each a single deliberate hole.
    print("==> type-coverage")
    proc = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).parent / "type_coverage.py"),
            "--min-coverage", "100.0",
            "--max-any", "8",
        ]
    )
    if proc.returncode != 0:
        print("FAILED at type-coverage", file=sys.stderr)
        return proc.returncode

    # native basic lint (tools/lint_basic.py): the mechanical pyflakes/ruff
    # tier (unused imports, F811/F541/F632, mutable defaults, bare except)
    # implemented stdlib-only because neither tool installs in this image —
    # found and removed 6 real unused imports on its first run.
    print("==> lint")
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "lint_basic.py")]
    )
    if proc.returncode != 0:
        print("FAILED at lint", file=sys.stderr)
        return proc.returncode

    if not args.no_external:
        for name, cmd in EXTERNAL:
            if shutil.which(cmd[0]) is None:
                print(f"==> {name}: not installed, skipped")
                continue
            print(f"==> {name}")
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                print(f"FAILED at {name}", file=sys.stderr)
                return proc.returncode

    print("check-code: all clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
