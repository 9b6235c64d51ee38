"""tools/lint_basic.py meta-tests: each rule fires on a minimal offender and
stays silent on the documented exemptions (noqa, __future__, f-string format
specs, @overload/@property rebinds, __init__ re-exports)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.lint_basic import lint_file


def _lint(tmp_path: Path, source: str, name: str = "mod.py") -> list[str]:
    f = tmp_path / name
    f.write_text(source)
    # lint_file renders paths relative to the package parent; temp files live
    # elsewhere, so call the underlying pieces through a wrapper path trick
    import tools.lint_basic as lb

    old = lb.PACKAGE
    lb.PACKAGE = tmp_path
    try:
        return lint_file(f)
    finally:
        lb.PACKAGE = old


def test_unused_import_fires_and_noqa_exempts(tmp_path: Path) -> None:
    assert any("unused import `os`" in p for p in _lint(tmp_path, "import os\n"))
    assert _lint(tmp_path, "import os  # noqa: F401\n") == []
    assert _lint(tmp_path, "import os\nprint(os.sep)\n") == []


def test_future_import_exempt(tmp_path: Path) -> None:
    assert _lint(tmp_path, "from __future__ import annotations\n") == []


def test_init_reexports_exempt(tmp_path: Path) -> None:
    assert _lint(tmp_path, "from x import y\n", name="__init__.py") == []


def test_string_annotation_keeps_import_alive(tmp_path: Path) -> None:
    src = 'from typing import Mapping\nx: "Mapping[str, int]" = {}\n'
    assert _lint(tmp_path, src) == []


def test_f541_fires_but_format_specs_do_not(tmp_path: Path) -> None:
    assert any("F541" in p for p in _lint(tmp_path, 'y = 1\nx = f"no holes"\n'))
    assert _lint(tmp_path, 'v = 2\nx = f"{v:010d}"\nprint(x)\n') == []


def test_bare_except_fires(tmp_path: Path) -> None:
    src = "try:\n    pass\nexcept:\n    pass\n"
    assert any("E722" in p for p in _lint(tmp_path, src))


def test_is_literal_fires(tmp_path: Path) -> None:
    assert any("F632" in p for p in _lint(tmp_path, "y = 1\nz = y is 'a'\nprint(z)\n"))
    assert _lint(tmp_path, "y = 1\nz = y is None\nprint(z)\n") == []


def test_mutable_default_fires(tmp_path: Path) -> None:
    src = "def f(a=[]):\n    return a\n"
    assert any("B006" in p for p in _lint(tmp_path, src))


def test_redefinition_fires_but_overload_and_property_exempt(tmp_path: Path) -> None:
    dup = "def f() -> int:\n    return 1\ndef f() -> int:\n    return 2\n"
    assert any("F811" in p for p in _lint(tmp_path, dup))
    prop = (
        "class C:\n"
        "    @property\n"
        "    def x(self) -> int:\n        return 1\n"
        "    @x.setter\n"
        "    def x(self, v: int) -> None:\n        pass\n"
    )
    assert _lint(tmp_path, prop) == []
    ovl = (
        "from typing import overload\n"
        "@overload\n"
        "def g(a: int) -> int: ...\n"
        "@overload\n"
        "def g(a: str) -> str: ...\n"
        "def g(a):\n    return a\n"
    )
    assert _lint(tmp_path, ovl) == []
