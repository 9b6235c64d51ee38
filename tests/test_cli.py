"""Storage CLI tests, subprocess-level (parity: reference tests/test_storage/
test_cli.py exercises the argparse tool as a real process).

A filesystem-backed chain is prepared in tmp_path, then
``python -m spectralmc_tpu.storage`` subcommands are run against it and
their exit codes / stdout asserted: 0 ok, 1 problem found, 2 usage/backend
error (reference storage/__main__.py:463-560 convention).
"""

from __future__ import annotations

import asyncio
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

from spectralmc_tpu.serialization import compute_sha256  # noqa: E402
from spectralmc_tpu.storage.object_store import FileSystemObjectStore  # noqa: E402
from spectralmc_tpu.storage.store import AsyncBlockchainModelStore  # noqa: E402

BUCKET = "clitest"


def _make_chain(root: Path, n: int = 4) -> None:
    async def fill() -> None:
        store = AsyncBlockchainModelStore(FileSystemObjectStore(str(root), BUCKET))
        for i in range(n):
            payload = f"checkpoint-{i}".encode()
            (await store.commit(payload, compute_sha256(payload), f"v{i}")).expect("commit")

    asyncio.run(fill())


def _cli(root: Path, *argv: str) -> subprocess.CompletedProcess[str]:
    return subprocess.run(
        [sys.executable, "-m", "spectralmc_tpu.storage", "--root", str(root),
         "--bucket", BUCKET, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


@pytest.fixture(scope="module")
def chain_root(tmp_path_factory: pytest.TempPathFactory) -> Path:
    root = tmp_path_factory.mktemp("store")
    _make_chain(root)
    return root


def test_verify_ok(chain_root: Path) -> None:
    out = _cli(chain_root, "verify")
    assert out.returncode == 0, out.stderr
    assert "chain valid" in out.stdout


def test_list_versions(chain_root: Path) -> None:
    out = _cli(chain_root, "list-versions")
    assert out.returncode == 0
    lines = [l for l in out.stdout.splitlines() if l.startswith("v")]
    assert len(lines) == 4
    assert "v0000000000" in out.stdout
    assert "HEAD: v0000000003" in out.stdout


def test_inspect(chain_root: Path) -> None:
    out = _cli(chain_root, "inspect", "2")
    assert out.returncode == 0
    payload = json.loads(out.stdout)
    assert payload["counter"] == 2
    assert payload["parent_hash"]


def test_inspect_missing_version(chain_root: Path) -> None:
    out = _cli(chain_root, "inspect", "99")
    assert out.returncode != 0


def test_gc_preview_and_run(tmp_path: Path) -> None:
    _make_chain(tmp_path, n=6)
    out = _cli(tmp_path, "gc-preview", "--keep", "2")
    assert out.returncode == 0
    assert "would delete" in out.stdout.lower() or "delete" in out.stdout.lower()
    # refuses without --yes
    out = _cli(tmp_path, "gc-run", "--keep", "2")
    assert out.returncode == 2
    out = _cli(tmp_path, "gc-run", "--keep", "2", "--yes")
    assert out.returncode == 0, out.stderr
    out = _cli(tmp_path, "list-versions")
    lines = [l for l in out.stdout.splitlines() if l.startswith("v")]
    # effective keep = max(--keep 2, keep-min 3) newest, plus genesis
    assert len(lines) == 4
    assert lines[0].startswith("v0000000000")
    # GC leaves gc_log/ tombstones, so full-chain verify still proves the
    # Merkle links across the collected gap (the reference's verify cannot
    # distinguish GC from tampering)
    out = _cli(tmp_path, "verify")
    assert out.returncode == 0, out.stdout + out.stderr
    out = _cli(tmp_path, "find-corruption")
    assert out.returncode == 0, out.stdout + out.stderr


def test_find_corruption_detects_tamper(tmp_path: Path) -> None:
    _make_chain(tmp_path, n=3)
    # tamper with version 1's payload on disk
    victims = list(tmp_path.glob(f"{BUCKET}/versions/*/checkpoint.pb"))
    assert victims
    victim = sorted(victims)[1]
    victim.write_bytes(b"tampered")
    out = _cli(tmp_path, "find-corruption")
    assert out.returncode == 1
    assert "corrupt" in out.stdout.lower()


def test_usage_error_exit_code(chain_root: Path) -> None:
    out = _cli(chain_root, "no-such-command")
    assert out.returncode == 2


def test_tensorboard_log_writes_event_files(chain_root: Path, tmp_path: Path) -> None:
    """`tensorboard-log` walks the chain and leaves TB event files in logdir
    (exit 0 even though the payloads are not checkpoint protos — garbage
    tolerance is part of the writer's contract, tests/test_tensorboard.py)."""
    logdir = tmp_path / "tb"
    out = _cli(chain_root, "tensorboard-log", "--logdir", str(logdir))
    assert out.returncode == 0, out.stdout + out.stderr
    events = list(logdir.rglob("events.out.tfevents.*"))
    assert events, f"no event files under {logdir}"
    assert "logged" in out.stdout


def test_gc_run_without_yes_refuses(tmp_path: Path) -> None:
    """gc-run without --yes must not delete anything (preview-only safety)."""
    _make_chain(tmp_path, n=5)
    before = len(list(tmp_path.glob(f"{BUCKET}/versions/*")))
    out = _cli(tmp_path, "gc-run", "--keep", "1")
    assert out.returncode == 2, out.stdout + out.stderr
    assert len(list(tmp_path.glob(f"{BUCKET}/versions/*"))) == before


def test_verify_detects_broken_merkle_link(tmp_path: Path) -> None:
    """Rewriting a middle version's parent_hash must fail verify with exit 1
    and name the Merkle corruption."""
    _make_chain(tmp_path, n=3)
    metas = sorted(tmp_path.glob(f"{BUCKET}/versions/*/metadata.json"))
    doc = json.loads(metas[1].read_text())
    doc["parent_hash"] = "0" * 64
    metas[1].write_text(json.dumps(doc))
    out = _cli(tmp_path, "verify")
    assert out.returncode == 1, out.stdout + out.stderr
    assert "CORRUPTED" in out.stdout
