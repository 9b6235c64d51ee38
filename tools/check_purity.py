#!/usr/bin/env python
"""Purity checker (reference tools/check_purity.py counterpart, SURVEY §2.10).

Thin wrapper over tools.static_checks; see `--list-rules` / `--explain RULE`.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.static_checks.cli import main

if __name__ == "__main__":
    raise SystemExit(main("purity"))
