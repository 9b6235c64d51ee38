#!/usr/bin/env python
"""Packaging-consistency checker (reference tools/check_pyproject.py guards
its dual-pyproject sync; this repo has one pyproject whose claims must match
the package).

Checks: console-script targets import and are callable; declared package
matches the tree; version string is sane; pytest markers used in tests are
declared; optional-extra imports are genuinely optional (not imported at
package import time).
"""

from __future__ import annotations

import importlib
import re
import sys
import tomllib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    problems: list[str] = []
    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    project = data["project"]

    # 1. console scripts resolve
    for name, target in project.get("scripts", {}).items():
        mod_name, _, attr = target.partition(":")
        try:
            mod = importlib.import_module(mod_name)
        except Exception as exc:  # noqa: BLE001
            problems.append(f"script {name}: module {mod_name} failed to import: {exc}")
            continue
        if not callable(getattr(mod, attr, None)):
            problems.append(f"script {name}: {target} is not callable")

    # 2. version sane
    if not re.fullmatch(r"\d+\.\d+\.\d+([a-z0-9.+-]*)?", project.get("version", "")):
        problems.append(f"version {project.get('version')!r} is not PEP 440-ish")

    # 3. pytest markers used in tests are declared
    declared = {
        # "name(args): description" -> "name"
        m.split(":")[0].split("(")[0].strip()
        for m in data.get("tool", {}).get("pytest", {}).get("ini_options", {}).get("markers", [])
    }
    used: set[str] = set()
    for test in (REPO / "tests").glob("*.py"):
        used |= set(re.findall(r"pytest\.mark\.(\w+)", test.read_text()))
    builtin = {"parametrize", "skip", "skipif", "xfail", "timeout", "asyncio", "filterwarnings"}
    for marker in sorted(used - builtin - declared):
        problems.append(f"pytest marker `{marker}` used in tests but not declared")

    # 4. optional extras stay optional: importing the package must not pull them
    extras = {
        dep.split(">=")[0].split("==")[0].strip()
        for deps in project.get("optional-dependencies", {}).values()
        for dep in deps
    } - {"pytest", "pytest-timeout"}
    import spectralmc_tpu  # noqa: F401

    for mod_name in sorted(extras):
        top = mod_name.replace("-", "_")
        if top in sys.modules:
            problems.append(f"optional dependency `{mod_name}` imported at package import time")

    for p in problems:
        print(p)
    if problems:
        print(f"\npyproject: {len(problems)} problem(s)", file=sys.stderr)
        return 1
    print("pyproject: consistent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
