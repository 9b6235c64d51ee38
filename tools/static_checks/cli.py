"""Shared CLI harness for the check_* tools.

Usage pattern (each thin wrapper passes its family):

    python tools/check_purity.py [paths...] [--explain RULE]

Exit codes: 0 clean, 1 violations, 2 usage error — matching the reference
storage CLI's convention (``storage/__main__.py:463-560``).
"""

from __future__ import annotations

import argparse
import sys
from typing import Sequence

from tools.static_checks.engine import library_files, run_rules
from tools.static_checks.rules import get_rule, rules_in_family


def main(family: str, argv: Sequence[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=f"spectralmc_tpu {family} checker")
    parser.add_argument("paths", nargs="*", help="files to check (default: the library)")
    parser.add_argument("--explain", metavar="RULE", help="print a rule's rationale and exit")
    parser.add_argument(
        "--list-rules", action="store_true", help="list this family's rules and exit"
    )
    parser.add_argument(
        "--fix",
        action="store_true",
        help="apply autofixes where a rule has one, then re-check",
    )
    args = parser.parse_args(argv)

    rules = rules_in_family(family)
    if args.list_rules:
        for r in rules:
            print(f"{r.rule_id}  {r.summary}")
        return 0
    if args.explain:
        rule = get_rule(args.explain.upper())
        if rule is None:
            print(f"unknown rule: {args.explain}", file=sys.stderr)
            return 2
        print(f"{rule.rule_id} ({rule.family}): {rule.summary}\n\n{rule.explain}")
        return 0

    paths = args.paths or [str(p) for p in library_files()]
    violations = run_rules(paths, rules)

    if args.fix and violations:
        from pathlib import Path

        from tools.static_checks.rules import FIXERS

        fixed_files: set[str] = set()
        for v in violations:
            fixer = FIXERS.get(v.rule_id)
            if fixer is None or v.path in fixed_files:
                continue
            target = Path(v.path)
            target.write_text(fixer(target.read_text()))
            fixed_files.add(v.path)
        if fixed_files:
            print(f"fixed {len(fixed_files)} file(s): {', '.join(sorted(fixed_files))}")
        violations = run_rules(paths, rules)  # re-check after fixes
    for v in violations:
        print(v.render())
    if violations:
        print(f"\n{family}: {len(violations)} violation(s)", file=sys.stderr)
        return 1
    print(f"{family}: clean ({len(paths)} files)")
    return 0
