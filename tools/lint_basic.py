"""Native basic linter: the highest-value pyflakes/ruff checks, stdlib-only.

The reference's doctrine is ruff+mypy on every run
(/root/reference/tools/check_code.py:44+); neither tool is installable in
this image, so the static pipeline carries custom checkers instead
(layering/purity/immutability/construction/type-safety/type-coverage).
This module adds the mechanical-lint tier those tools would provide:

* unused imports (module scope; ``__init__.py`` re-exports and
  ``# noqa`` lines exempt, matching ruff's F401 conventions)
* duplicate top-level / class-scope def+class names (F811)
* mutable default arguments (B006)
* bare ``except:`` (E722)
* f-strings without placeholders (F541)
* ``is`` / ``is not`` comparisons against literals (F632)

Conservative by design: a check that cannot be decided syntactically is
skipped rather than guessed, so a finding is always actionable.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "spectralmc_tpu"


def _noqa_lines(source: str) -> set[int]:
    return {
        i + 1
        for i, line in enumerate(source.splitlines())
        if "# noqa" in line or "#noqa" in line
    }


def _is_literal(node: ast.expr) -> bool:
    return isinstance(node, ast.Constant) and not isinstance(
        node.value, (bool, type(None), type(...))
    )


class _Visitor(ast.NodeVisitor):
    def __init__(self, source: str, is_init: bool) -> None:
        self.problems: list[tuple[int, str]] = []
        self.noqa = _noqa_lines(source)
        self.is_init = is_init
        # import name -> (lineno, as-written) at module scope
        self.imports: dict[str, int] = {}
        self.used_names: set[str] = set()
        self.module_string_refs: set[str] = set()

    # -- collection --------------------------------------------------------

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            bound = alias.asname or alias.name.split(".")[0]
            self.imports.setdefault(bound, node.lineno)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":  # compiler directive, never "used"
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            bound = alias.asname or alias.name
            self.imports.setdefault(bound, node.lineno)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used_names.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_Constant(self, node: ast.Constant) -> None:
        # "__all__"-style and docstring references keep an import alive
        # (e.g. typing names used only in string annotations)
        if isinstance(node.value, str):
            for tok in node.value.replace("[", " ").replace("]", " ").split():
                self.module_string_refs.add(tok.strip("\"'.,():"))

    # -- checks ------------------------------------------------------------

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None and node.lineno not in self.noqa:
            self.problems.append((node.lineno, "bare `except:` (E722)"))
        self.generic_visit(node)

    def visit_JoinedStr(self, node: ast.JoinedStr) -> None:
        if node.lineno not in self.noqa and not any(
            isinstance(v, ast.FormattedValue) for v in node.values
        ):
            self.problems.append(
                (node.lineno, "f-string without placeholders (F541)")
            )
        self.generic_visit(node)

    def visit_FormattedValue(self, node: ast.FormattedValue) -> None:
        # do NOT descend into format_spec: it is itself a JoinedStr whose
        # literal parts (":.6g" etc.) would false-positive F541
        self.visit(node.value)

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)) and (
                _is_literal(comp) or _is_literal(node.left)
            ):
                if node.lineno not in self.noqa:
                    self.problems.append(
                        (node.lineno, "`is` comparison with a literal (F632)")
                    )
        self.generic_visit(node)

    def _check_defaults(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        for default in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(default, (ast.List, ast.Dict, ast.Set)) and (
                node.lineno not in self.noqa
            ):
                self.problems.append(
                    (default.lineno, f"mutable default argument in `{node.name}` (B006)")
                )

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)


def _duplicate_defs(tree: ast.Module, noqa: set[int]) -> list[tuple[int, str]]:
    problems: list[tuple[int, str]] = []

    def scan(body: list[ast.stmt], where: str) -> None:
        seen: dict[str, int] = {}
        overload_names: set[str] = set()
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                decorators = getattr(stmt, "decorator_list", [])
                deco_names = {
                    d.id if isinstance(d, ast.Name) else getattr(d, "attr", "")
                    for d in decorators
                }
                # @overload stubs, @property/setter pairs and
                # @singledispatch registrations legitimately re-bind
                if deco_names & {"overload", "setter", "getter", "deleter", "register"}:
                    overload_names.add(stmt.name)
                    continue
                if stmt.name in seen and stmt.name not in overload_names:
                    if stmt.lineno not in noqa:
                        problems.append(
                            (
                                stmt.lineno,
                                f"`{stmt.name}` redefines line {seen[stmt.name]}"
                                f" in {where} (F811)",
                            )
                        )
                seen[stmt.name] = stmt.lineno
                if isinstance(stmt, ast.ClassDef):
                    scan(stmt.body, f"class {stmt.name}")

    scan(tree.body, "module")
    return problems


def lint_file(path: Path) -> list[str]:
    source = path.read_text()
    tree = ast.parse(source)
    visitor = _Visitor(source, is_init=path.name == "__init__.py")
    visitor.visit(tree)
    problems = visitor.problems + _duplicate_defs(tree, visitor.noqa)

    if not visitor.is_init:  # __init__ re-exports are the public surface
        for name, lineno in sorted(visitor.imports.items(), key=lambda kv: kv[1]):
            if lineno in visitor.noqa:
                continue
            if name in visitor.used_names or name in visitor.module_string_refs:
                continue
            problems.append((lineno, f"unused import `{name}` (F401)"))

    return [
        f"{path.relative_to(PACKAGE.parent)}:{ln}: {msg}"
        for ln, msg in sorted(set(problems))
    ]


def main() -> int:
    failures: list[str] = []
    count = 0
    for path in sorted(PACKAGE.rglob("*.py")):
        if "_pb2" in path.name:  # generated
            continue
        count += 1
        failures.extend(lint_file(path))
    if failures:
        print(f"lint: {len(failures)} problem(s)")
        for f in failures:
            print(f"  {f}")
        return 1
    print(f"lint: clean ({count} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
