"""Rule engine: one AST parse per file, N rules applied to it.

Mirrors the reference's rule-engine shape (``/root/reference/tools/purity/
rules.py``, 493 LoC) with a smaller surface: a :class:`Rule` is a named
check function over ``(tree, source, path, tier)`` returning violations.
Suppression: a line ending in ``# check: ignore[RULE-ID]`` silences that
rule on that line (explicit and greppable, like ``type: ignore[code]``).
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable, Sequence

from tools.static_checks.classifier import Tier, classify

_SUPPRESS_RE = re.compile(r"#\s*check:\s*ignore\[([A-Z]\d{3}(?:\s*,\s*[A-Z]\d{3})*)\]")


@dataclass(frozen=True)
class Violation:
    rule_id: str
    path: str
    line: int
    message: str

    def render(self) -> str:
        return f"{self.path}:{self.line}: {self.rule_id} {self.message}"


@dataclass(frozen=True)
class Rule:
    rule_id: str
    family: str  # purity | immutability | construction | type-safety | layering
    tiers: frozenset[Tier]  # tiers the rule applies to
    summary: str
    explain: str  # long-form rationale for --explain
    check: Callable[[ast.Module, str, str, Tier], Iterable[Violation]]


def _suppressed_lines(source: str) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for i, line in enumerate(source.splitlines(), start=1):
        m = _SUPPRESS_RE.search(line)
        if m:
            out[i] = {part.strip() for part in m.group(1).split(",")}
    return out


def run_rules(
    paths: Sequence[str | Path],
    rules: Sequence[Rule],
) -> list[Violation]:
    """Apply ``rules`` to every file in ``paths``; returns sorted violations."""
    violations: list[Violation] = []
    for path in paths:
        p = Path(path)
        source = p.read_text()
        try:
            tree = ast.parse(source, filename=str(p))
        except SyntaxError as exc:  # a syntax error fails every rule family
            violations.append(
                Violation("E000", str(p), exc.lineno or 0, f"syntax error: {exc.msg}")
            )
            continue
        tier = classify(p)
        suppressed = _suppressed_lines(source)
        for rule in rules:
            if tier not in rule.tiers:
                continue
            for v in rule.check(tree, source, str(p), tier):
                if rule.rule_id in suppressed.get(v.line, set()):
                    continue
                violations.append(v)
    return sorted(violations, key=lambda v: (v.path, v.line, v.rule_id))


def library_files(root: str | Path = "spectralmc_tpu") -> list[Path]:
    """All library python files (generated proto stubs excluded)."""
    return sorted(
        p
        for p in Path(root).rglob("*.py")
        if not p.name.endswith("_pb2.py") and "__pycache__" not in p.parts
    )
