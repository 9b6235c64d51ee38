"""Meta-tests for the static-verification suite (tools/).

Parity model: the reference tests its purity linter with synthetic sources
(tests/test_tools/test_purity_checker.py, 837 LoC — SURVEY §4 meta-tests).
Each rule here gets a positive (violating snippet detected) and the library
itself is asserted clean — the latter is the real gate.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.static_checks.classifier import Tier, classify  # noqa: E402
from tools.static_checks.engine import library_files, run_rules  # noqa: E402
from tools.static_checks.rules import RULES, get_rule, rules_in_family  # noqa: E402


def _violations(tmp_path: Path, source: str, rel: str) -> list[str]:
    """Write ``source`` at a path classified like ``rel``; return rule ids."""
    target = tmp_path / rel
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(source)
    return [v.rule_id for v in run_rules([target], RULES)]


# ---------------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------------


def test_classifier_tiers() -> None:
    assert classify("spectralmc_tpu/core/result.py") is Tier.CORE
    assert classify("spectralmc_tpu/ops/gbm.py") is Tier.KERNEL
    assert classify("spectralmc_tpu/models/cvnn.py") is Tier.KERNEL
    assert classify("spectralmc_tpu/models/factory.py") is Tier.PURE
    assert classify("spectralmc_tpu/storage/store.py") is Tier.ADAPTER
    assert classify("spectralmc_tpu/storage/chain.py") is Tier.PURE
    assert classify("spectralmc_tpu/storage/__main__.py") is Tier.CLI
    assert classify("/abs/prefix/spectralmc_tpu/core/result.py") is Tier.CORE


# ---------------------------------------------------------------------------
# rule detection on synthetic sources
# ---------------------------------------------------------------------------


def test_p001_print_detected_in_library_not_cli(tmp_path: Path) -> None:
    src = "def f() -> None:\n    print('hi')\n"
    assert "P001" in _violations(tmp_path, src, "spectralmc_tpu/ops/x.py")
    assert "P001" not in _violations(tmp_path, src, "spectralmc_tpu/storage/__main__.py")


def test_p002_bare_except(tmp_path: Path) -> None:
    src = "def f() -> None:\n    try:\n        pass\n    except:\n        pass\n"
    assert "P002" in _violations(tmp_path, src, "spectralmc_tpu/storage/x.py")


def test_p003_impure_calls_in_pure_tiers_only(tmp_path: Path) -> None:
    src = (
        "import time\nimport numpy as np\n"
        "def f() -> float:\n    open('/tmp/x')\n    return time.time()\n"
        "def g() -> object:\n    return np.random.rand(3)\n"
        "def h(seed: int) -> object:\n    return np.random.default_rng(seed)\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/core/x.py")
    assert ids.count("P003") == 3  # open, time.time, np.random.rand; seeded rng OK
    assert "P003" not in _violations(tmp_path, src, "spectralmc_tpu/storage/x.py")


def test_p004_p005_global_and_env(tmp_path: Path) -> None:
    src = (
        "import os\n_X = 0\n"
        "def f() -> None:\n    global _X\n    _X = 1\n"
        "def g() -> None:\n    os.environ['A'] = 'b'\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/ops/x.py")
    assert "P004" in ids and "P005" in ids
    ids_adapter = _violations(tmp_path, src, "spectralmc_tpu/runtime/x.py")
    assert "P004" not in ids_adapter and "P005" not in ids_adapter


def test_i001_frozen_dataclass(tmp_path: Path) -> None:
    src = (
        "from dataclasses import dataclass\n"
        "@dataclass\nclass A:\n    x: int\n"
        "@dataclass(frozen=True)\nclass B:\n    x: int\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/models/x.py")
    assert ids.count("I001") == 1
    assert "I001" not in _violations(tmp_path, src, "spectralmc_tpu/utils/x.py")


def test_i002_i003_mutable_sharing(tmp_path: Path) -> None:
    src = (
        "class A:\n    cache = []\n"
        "def f(xs: list = []) -> list:\n    return xs\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/storage/x.py")
    assert "I002" in ids and "I003" in ids


def test_c001_builder_construction(tmp_path: Path) -> None:
    src = (
        "from spectralmc_tpu.ops.gbm import SimulationParams\n"
        "def build_simulation_params() -> object:\n    return SimulationParams()\n"
        "def rogue() -> object:\n    return SimulationParams()\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/training/x.py")
    assert ids.count("C001") == 1  # only the rogue construction
    # serialization layer is exempt
    assert "C001" not in _violations(tmp_path, src, "spectralmc_tpu/serialization/x.py")


def test_t001_t002_type_safety(tmp_path: Path) -> None:
    src = (
        "def f(x):\n    return x\n"
        "def g(x: int) -> int:\n    return x  # type: ignore\n"
        "def h(x: int) -> int:\n    return x  # type: ignore[misc]\n"
        "def _private(x):\n    return x\n"
    )
    ids = _violations(tmp_path, src, "spectralmc_tpu/core/x.py")
    assert ids.count("T001") == 2  # f: missing return + missing param annotation
    assert ids.count("T002") == 1  # only the blanket ignore


def test_l001_layering(tmp_path: Path) -> None:
    src = "from spectralmc_tpu.storage.store import AsyncBlockchainModelStore\n"
    assert "L001" in _violations(tmp_path, src, "spectralmc_tpu/core/x.py")
    assert "L001" not in _violations(tmp_path, src, "spectralmc_tpu/utils/x.py")


def test_l002_l003_gpu_stack_and_core_deps(tmp_path: Path) -> None:
    assert "L002" in _violations(tmp_path, "import torch\n", "spectralmc_tpu/ops/x.py")
    assert "L003" in _violations(tmp_path, "import jax\n", "spectralmc_tpu/core/x.py")
    # the sanctioned dtype-table exception
    assert "L003" not in _violations(
        tmp_path, "import jax\n", "spectralmc_tpu/core/precision.py"
    )


def test_suppression_comment(tmp_path: Path) -> None:
    src = "import torch  # check: ignore[L002]\n"
    assert "L002" not in _violations(tmp_path, src, "spectralmc_tpu/utils/x.py")


def test_syntax_error_reported(tmp_path: Path) -> None:
    assert "E000" in _violations(tmp_path, "def broken(:\n", "spectralmc_tpu/ops/x.py")


# ---------------------------------------------------------------------------
# the real gate: the library itself is clean
# ---------------------------------------------------------------------------


def test_library_is_clean() -> None:
    files = library_files(REPO / "spectralmc_tpu")
    assert len(files) > 40
    violations = run_rules(files, RULES)
    assert violations == [], "\n".join(v.render() for v in violations)


def test_every_rule_has_explanation() -> None:
    for rule in RULES:
        assert rule.summary and len(rule.explain) > 40, rule.rule_id
        assert get_rule(rule.rule_id) is rule
    families = {r.family for r in RULES}
    assert families == {"purity", "immutability", "construction", "type-safety", "layering"}
    for fam in families:
        assert rules_in_family(fam)


def test_cli_explain_and_exit_codes(tmp_path: Path) -> None:
    env_repo = str(REPO)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_purity.py"), "--explain", "P003"],
        capture_output=True,
        text=True,
        cwd=env_repo,
    )
    assert out.returncode == 0 and "pure tier" in out.stdout.lower()
    bad = tmp_path / "bad.py"
    bad.write_text("def f() -> None:\n    print('x')\n")
    # explicit path outside spectralmc_tpu classifies as ADAPTER -> P001 applies
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_purity.py"), str(bad)],
        capture_output=True,
        text=True,
        cwd=env_repo,
    )
    assert out.returncode == 1 and "P001" in out.stdout


# ---------------------------------------------------------------------------
# model checker
# ---------------------------------------------------------------------------


def test_compositions_enumeration() -> None:
    from tools.model_check import compositions

    comps = list(compositions(4))
    assert len(comps) == 8
    assert all(sum(c) == 4 for c in comps)
    assert len(set(comps)) == 8
    assert (4,) in comps and (1, 1, 1, 1) in comps


@pytest.mark.slow
def test_model_check_small() -> None:
    from tools.model_check import run_model_check

    assert run_model_check(3) == 0


def test_fix_frozen_dataclass(tmp_path: Path) -> None:
    src = (
        "from dataclasses import dataclass\n"
        "@dataclass\nclass A:\n    x: int\n"
        "@dataclass(slots=True)\nclass B:\n    x: int\n"
        "@dataclass(frozen=True)\nclass C:\n    x: int\n"
    )
    target = tmp_path / "spectralmc_tpu" / "models" / "x.py"
    target.parent.mkdir(parents=True)
    target.write_text(src)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_immutability.py"), str(target), "--fix"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    fixed = target.read_text()
    assert "@dataclass(frozen=True)\nclass A" in fixed
    assert "@dataclass(frozen=True, slots=True)\nclass B" in fixed
    assert fixed.count("frozen=True") == 3
