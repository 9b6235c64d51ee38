"""Chain-corruption taxonomy: one test per corruption type.

``verify_chain_links`` is a pure function over ModelVersion tuples (the
verification core the store-level checks reduce to), so every defect class —
the three genesis invariants, counter gaps, the Merkle property, semver
progression — is pinned here directly; the head-level classes (missing,
stale) are exercised against a real in-memory store. Parity model: the
reference's per-invariant integrity tests
(/root/reference/tests/test_integrity/test_blockchain_integrity.py:47-60).
"""

from __future__ import annotations

import asyncio

from spectralmc_tpu.serialization import compute_sha256
from spectralmc_tpu.storage.chain import ModelVersion
from spectralmc_tpu.storage.object_store import InMemoryObjectStore
from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
from spectralmc_tpu.storage.verification import (
    ChainCorrupted,
    ChainValid,
    verify_chain_detailed,
    verify_chain_links,
)
from tests.helpers.result_utils import expect_success


def _version(counter: int, parent: str, *, semver: str | None = None, content: str | None = None) -> ModelVersion:
    return ModelVersion(
        counter=counter,
        semantic_version=semver if semver is not None else (f"1.0.{counter}" if counter else "1.0.0"),
        parent_hash=parent,
        content_hash=content or compute_sha256(f"payload-{counter}".encode()),
        timestamp="2026-01-01T00:00:00+00:00",
        message=f"v{counter}",
    )


def _chain(n: int) -> list[ModelVersion]:
    out: list[ModelVersion] = []
    parent = ""
    for i in range(n):
        v = _version(i, parent)
        out.append(v)
        parent = v.content_hash
    return out


def test_valid_chain_and_empty_chain() -> None:
    assert verify_chain_links(()) == ChainValid(versions=0)
    verdict = verify_chain_links(tuple(_chain(5)))
    assert verdict == ChainValid(versions=5)


def test_genesis_counter_violation() -> None:
    chain = _chain(3)[1:]  # starts at counter 1
    verdict = verify_chain_links(tuple(chain))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "genesis_counter"


def test_genesis_parent_violation() -> None:
    chain = _chain(2)
    chain[0] = _version(0, "f" * 64)
    verdict = verify_chain_links(tuple(chain))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "genesis_parent"
    assert verdict.version_counter == 0


def test_genesis_semver_violation() -> None:
    chain = _chain(1)
    chain[0] = _version(0, "", semver="2.0.0")
    verdict = verify_chain_links(tuple(chain))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "genesis_semver"


def test_counter_gap_detected_at_the_gap() -> None:
    chain = _chain(5)
    # drop v2 and relink v3 to v1 so the Merkle property still holds —
    # the counter gap must be caught on its own
    relinked = _version(3, chain[1].content_hash, content=chain[3].content_hash)
    verdict = verify_chain_links((chain[0], chain[1], relinked, chain[4]))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "counter_gap"
    assert verdict.version_counter == 3


def test_merkle_break_detected_at_the_break() -> None:
    chain = _chain(4)
    chain[2] = _version(2, "0" * 64)
    verdict = verify_chain_links(tuple(chain))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "merkle_break"
    assert verdict.version_counter == 2


def test_semver_progression_violation() -> None:
    chain = _chain(3)
    chain[2] = _version(2, chain[1].content_hash, semver="1.1.0")
    verdict = verify_chain_links(tuple(chain))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "semver_progression"


def test_first_defect_wins_in_scan_order() -> None:
    """A chain with BOTH a counter gap (at v2) and a later merkle break
    (at v4) reports the earliest defect — deterministic triage."""
    chain = _chain(6)
    relinked2 = _version(3, chain[1].content_hash, content=chain[3].content_hash)
    broken4 = _version(5, "0" * 64)
    verdict = verify_chain_links((chain[0], chain[1], relinked2, broken4))
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "counter_gap"


def _store() -> AsyncBlockchainModelStore:
    return AsyncBlockchainModelStore(InMemoryObjectStore("taxonomy"))


def test_missing_head_detected() -> None:
    async def run() -> ChainCorrupted:
        store = _store()
        for i in range(2):
            payload = f"p{i}".encode()
            (await store.commit(payload, compute_sha256(payload), f"v{i}")).expect("commit")
        (await store.object_store.delete("chain.json")).expect("delete head")
        return expect_success(await verify_chain_detailed(store))

    verdict = asyncio.run(run())
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "missing_head"


def test_stale_head_detected() -> None:
    async def run() -> ChainCorrupted:
        store = _store()
        heads = []
        for i in range(3):
            payload = f"p{i}".encode()
            v = (await store.commit(payload, compute_sha256(payload), f"v{i}")).expect("c")
            heads.append(v)
        # rewind chain.json to the genesis record
        import json

        doc = json.dumps(heads[0].model_dump())
        (await store.object_store.put("chain.json", doc.encode())).expect("put")
        return expect_success(await verify_chain_detailed(store))

    verdict = asyncio.run(run())
    assert isinstance(verdict, ChainCorrupted)
    assert verdict.corruption_type == "stale_head"
    assert verdict.version_counter == 0
