"""Blockchain-store tests (parity: reference tests/test_storage/, 13 files).

Hermetic: the FileSystemObjectStore provides real CAS semantics, and fault
injection wraps the ObjectStore protocol (the reference injects faults by
monkey-patching its S3 client, test_retry_logic.py:29-35 — same seam).
"""

from __future__ import annotations

import asyncio
import json

import numpy as np
import pytest

from spectralmc_tpu.core.errors.storage import (
    ChecksumError,
    NotFastForward,
    ObjectNotFound,
    PreconditionFailed,
    Throttled,
)
from spectralmc_tpu.core.result import Failure, Success
from spectralmc_tpu.serialization import compute_sha256
from spectralmc_tpu.storage import (
    AsyncBlockchainModelStore,
    ChainCorrupted,
    ChainValid,
    ExecuteGC,
    FileSystemObjectStore,
    InferenceClient,
    PinnedMode,
    PreviewGC,
    RetentionPolicy,
    TrackingMode,
    find_corruption,
    verify_chain_detailed,
    verify_version_completeness,
)
from spectralmc_tpu.storage.chain import bump_semantic_version, create_genesis_version
from spectralmc_tpu.storage.gc import run_gc
from spectralmc_tpu.storage.retry import (
    RetryExhausted,
    RetryGiveUp,
    RetryScheduled,
    decide_retry,
    retry_on_throttle,
    retry_schedule,
)
from tests.helpers import expect_failure, expect_success


@pytest.fixture
def store(tmp_path) -> AsyncBlockchainModelStore:
    return AsyncBlockchainModelStore(FileSystemObjectStore(tmp_path, "test-bucket"))


def commit(store: AsyncBlockchainModelStore, payload: bytes, message: str = "m"):
    return asyncio.run(store.commit(payload, compute_sha256(payload), message))


# -- chain primitives ---------------------------------------------------------


def test_chain_primitives() -> None:
    genesis = create_genesis_version("abc123", "first")
    assert genesis.version_id == "v0000000000"
    assert genesis.directory_name.startswith("v0000000000_1.0.0_abc123")
    assert bump_semantic_version("1.0.7") == "1.0.8"
    h1 = genesis.compute_hash()
    tampered = genesis.model_copy(update={"message": "evil"})
    assert tampered.compute_hash() != h1


# -- commit protocol -----------------------------------------------------------


def test_genesis_and_chain_commits(store: AsyncBlockchainModelStore) -> None:
    v0 = expect_success(commit(store, b"checkpoint-0", "genesis"))
    assert v0.counter == 0 and v0.parent_hash == "" and v0.semantic_version == "1.0.0"
    v1 = expect_success(commit(store, b"checkpoint-1", "step 10"))
    assert v1.counter == 1
    assert v1.parent_hash == v0.content_hash  # Merkle link
    assert v1.semantic_version == "1.0.1"
    head = expect_success(asyncio.run(store.get_head()))
    assert head is not None and head.counter == 1


def test_commit_rejects_wrong_hash(store: AsyncBlockchainModelStore) -> None:
    err = expect_failure(asyncio.run(store.commit(b"data", "deadbeef", "m")))
    assert isinstance(err, ChecksumError)


def test_load_checkpoint_roundtrip_and_tamper(store: AsyncBlockchainModelStore) -> None:
    v0 = expect_success(commit(store, b"payload-bytes"))
    data = expect_success(asyncio.run(store.load_checkpoint(v0)))
    assert data == b"payload-bytes"
    # tamper with the stored artifact -> checksum error on load
    key = f"versions/{v0.directory_name}/checkpoint.pb"
    asyncio.run(store.object_store.put(key, b"tampered"))
    err = expect_failure(asyncio.run(store.load_checkpoint(v0)))
    assert isinstance(err, ChecksumError)


def test_concurrent_commits_one_wins(tmp_path) -> None:
    """Two writers race from the same HEAD; exactly one wins CAS."""

    backend = FileSystemObjectStore(tmp_path, "race")

    class StalledStore:
        """Delays the CAS put of one writer until the other has published."""

        def __init__(self, inner, stall: asyncio.Event | None, release: asyncio.Event | None):
            self._inner = inner
            self.bucket = inner.bucket
            self._stall = stall
            self._release = release

        def __getattr__(self, name):
            return getattr(self._inner, name)

        async def put(self, key, data, *, if_match=None, if_none_match=False):
            if key == "chain.json" and self._stall is not None:
                self._stall.set()  # signal: I'm at the CAS point
                await self._release.wait()
            result = await self._inner.put(
                key, data, if_match=if_match, if_none_match=if_none_match
            )
            return result

    async def race():
        stall = asyncio.Event()
        release = asyncio.Event()
        slow = AsyncBlockchainModelStore(StalledStore(backend, stall, release))
        fast = AsyncBlockchainModelStore(StalledStore(backend, None, None))
        payload_a, payload_b = b"writer-a", b"writer-b"

        async def slow_commit():
            return await slow.commit(payload_a, compute_sha256(payload_a), "slow")

        task = asyncio.create_task(slow_commit())
        await stall.wait()  # slow writer is parked at CAS with genesis etag
        fast_result = await fast.commit(payload_b, compute_sha256(payload_b), "fast")
        release.set()
        slow_result = await task
        return fast_result, slow_result

    fast_result, slow_result = asyncio.run(race())
    assert isinstance(fast_result, Success)
    assert isinstance(slow_result, Failure)
    assert isinstance(slow_result.error, NotFastForward)
    # loser's artifacts were rolled back; chain has exactly the winner
    store = AsyncBlockchainModelStore(backend)
    versions = expect_success(asyncio.run(store.list_versions()))
    assert len(versions) == 1 and versions[0].message == "fast"


def test_rollback_on_cas_failure_removes_artifacts(tmp_path) -> None:
    backend = FileSystemObjectStore(tmp_path, "rb")
    store = AsyncBlockchainModelStore(backend)
    expect_success(commit(store, b"v0"))

    class FailCAS:
        def __init__(self, inner):
            self._inner = inner
            self.bucket = inner.bucket

        def __getattr__(self, name):
            return getattr(self._inner, name)

        async def put(self, key, data, *, if_match=None, if_none_match=False):
            if key == "chain.json":
                return Failure(
                    PreconditionFailed(bucket=self.bucket, key=key, expected_etag="x")
                )
            return await self._inner.put(
                key, data, if_match=if_match, if_none_match=if_none_match
            )

    failing = AsyncBlockchainModelStore(FailCAS(backend))
    err = expect_failure(commit(failing, b"v1"))
    assert isinstance(err, NotFastForward)
    versions = expect_success(asyncio.run(store.list_versions()))
    assert [v.counter for v in versions] == [0]  # no orphaned v1 artifacts


def test_audit_log_written(store: AsyncBlockchainModelStore) -> None:
    v0 = expect_success(commit(store, b"x"))
    keys = expect_success(asyncio.run(store.object_store.list("audit_log/")))
    assert len(keys) == 1 and v0.version_id in keys[0]
    line, _ = expect_success(asyncio.run(store.object_store.get(keys[0])))
    record = json.loads(line)
    assert record["record_hash"] == v0.compute_hash()


# -- retry engine ---------------------------------------------------------------


def test_retry_schedule_and_policy() -> None:
    sched = retry_schedule(0.1, 5.0, 8)
    assert sched[0] == 0.1 and sched[-1] == 5.0 and list(sched) == sorted(sched)
    throttle = Throttled(bucket="b", key="k", code="SlowDown")
    assert isinstance(decide_retry(throttle, 0, sched), RetryScheduled)
    assert isinstance(decide_retry(throttle, 8, sched), RetryExhausted)
    cas = PreconditionFailed(bucket="b", key="k", expected_etag="e")
    assert isinstance(decide_retry(cas, 0, sched), RetryGiveUp)
    nf = ObjectNotFound(bucket="b", key="k")
    assert isinstance(decide_retry(nf, 0, sched), RetryGiveUp)


def test_retry_on_throttle_succeeds_after_faults() -> None:
    calls = {"n": 0}

    async def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            return Failure(Throttled(bucket="b", key="k", code="SlowDown"))
        return Success("done")

    result = asyncio.run(retry_on_throttle(flaky, base_delay=0.001, max_delay=0.01))
    assert expect_success(result) == "done"
    assert calls["n"] == 4


def test_retry_exhaustion_returns_last_error() -> None:
    async def always_throttled():
        return Failure(Throttled(bucket="b", key="k", code="SlowDown"))

    result = asyncio.run(
        retry_on_throttle(always_throttled, base_delay=0.001, max_delay=0.002, max_attempts=2)
    )
    assert isinstance(expect_failure(result), Throttled)


# -- verification -----------------------------------------------------------------


def test_verify_chain_valid_and_corrupted(store: AsyncBlockchainModelStore) -> None:
    for i in range(3):
        expect_success(commit(store, f"cp-{i}".encode()))
    verdict = expect_success(asyncio.run(verify_chain_detailed(store)))
    assert verdict == ChainValid(versions=3)
    assert expect_success(asyncio.run(find_corruption(store))) is None

    # break the Merkle link by rewriting v2's metadata with a bogus parent
    versions = expect_success(asyncio.run(store.list_versions()))
    v2 = versions[2]
    key = f"versions/{v2.directory_name}/metadata.json"
    meta, _ = expect_success(asyncio.run(store.object_store.get(key)))
    record = json.loads(meta)
    record["parent_hash"] = "0" * 64
    asyncio.run(store.object_store.put(key, json.dumps(record).encode()))
    verdict2 = expect_success(asyncio.run(verify_chain_detailed(store)))
    assert isinstance(verdict2, ChainCorrupted)
    assert verdict2.corruption_type == "merkle_break"


def test_find_corruption_detects_tampered_payload(store: AsyncBlockchainModelStore) -> None:
    expect_success(commit(store, b"a"))
    v1 = expect_success(commit(store, b"b"))
    asyncio.run(
        store.object_store.put(f"versions/{v1.directory_name}/checkpoint.pb", b"evil")
    )
    corruption = expect_success(asyncio.run(find_corruption(store)))
    assert corruption is not None and corruption.corruption_type == "payload"
    assert corruption.version_counter == 1


def test_version_completeness(store: AsyncBlockchainModelStore) -> None:
    v0 = expect_success(commit(store, b"z"))
    assert expect_success(asyncio.run(verify_version_completeness(store, v0))) == ()
    asyncio.run(store.object_store.delete(f"versions/{v0.directory_name}/content_hash.txt"))
    missing = expect_success(asyncio.run(verify_version_completeness(store, v0)))
    assert missing == ("content_hash.txt",)


# -- GC ---------------------------------------------------------------------------


def test_gc_preview_and_run(store: AsyncBlockchainModelStore) -> None:
    for i in range(6):
        expect_success(commit(store, f"cp-{i}".encode()))
    policy = RetentionPolicy(keep_versions=2, keep_min_versions=2)
    preview = expect_success(asyncio.run(run_gc(store, policy, PreviewGC())))
    assert preview.dry_run
    # keep last 2 (4, 5) + genesis 0 -> delete 1, 2, 3
    assert preview.deleted == (1, 2, 3)
    assert set(preview.protected) == {0, 4, 5}
    assert preview.bytes_freed > 0
    # preview deleted nothing
    assert len(expect_success(asyncio.run(store.list_versions()))) == 6

    report = expect_success(asyncio.run(run_gc(store, policy, ExecuteGC())))
    assert not report.dry_run
    remaining = expect_success(asyncio.run(store.list_versions()))
    assert [v.counter for v in remaining] == [0, 4, 5]


def test_gc_tombstones_keep_chain_verifiable(store: AsyncBlockchainModelStore) -> None:
    """GC-aware verification: tombstones bridge the gap; a gap without a
    tombstone is corruption (no reference counterpart — its verify breaks
    after any GC)."""
    from spectralmc_tpu.storage.verification import ChainValid, verify_chain_detailed

    for i in range(6):
        expect_success(commit(store, f"cp-{i}".encode()))
    policy = RetentionPolicy(keep_versions=2, keep_min_versions=2)
    expect_success(asyncio.run(run_gc(store, policy, ExecuteGC())))

    tombs = expect_success(asyncio.run(store.list_tombstones()))
    assert [t.counter for t in tombs] == [1, 2, 3]
    verdict = expect_success(asyncio.run(verify_chain_detailed(store)))
    assert isinstance(verdict, ChainValid)
    assert verdict.versions == 6  # full history verified, payloads or not

    # erase a tombstone -> the gap is no longer explained
    erased = asyncio.run(store.object_store.delete(
        f"gc_log/{tombs[1].directory_name}.json"
    ))
    expect_success(erased)
    verdict = expect_success(asyncio.run(verify_chain_detailed(store)))
    assert not isinstance(verdict, ChainValid)
    assert verdict.corruption_type in ("counter_gap", "merkle_break")


def test_gc_protects_tagged_counters(store: AsyncBlockchainModelStore) -> None:
    for i in range(5):
        expect_success(commit(store, f"c{i}".encode()))
    policy = RetentionPolicy(keep_versions=1, keep_min_versions=1, protect_counters=(2,))
    report = expect_success(asyncio.run(run_gc(store, policy, ExecuteGC())))
    assert 2 in report.protected and 0 in report.protected
    remaining = expect_success(asyncio.run(store.list_versions()))
    assert [v.counter for v in remaining] == [0, 2, 4]


# -- inference client ---------------------------------------------------------------


def _commit_real_checkpoint(store: AsyncBlockchainModelStore, num_batches: int = 1):
    from spectralmc_tpu.storage.checkpoint import commit_snapshot
    from spectralmc_tpu.training.trainer import GbmCVNNPricer
    from tests.test_trainer import make_pricer_config, make_training

    pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    expect_success(pricer.train(make_training(num_batches=num_batches)))
    return expect_success(
        asyncio.run(commit_snapshot(store, pricer.snapshot(), f"after {num_batches}"))
    )


def test_inference_pinned_mode(store: AsyncBlockchainModelStore) -> None:
    _commit_real_checkpoint(store, num_batches=1)
    _commit_real_checkpoint(store, num_batches=2)

    async def run():
        async with InferenceClient(store, PinnedMode(counter=0)) as client:
            return client.get_model()

    loaded = asyncio.run(run())
    assert loaded is not None and loaded.version.counter == 0
    assert loaded.config.global_step == 1


def test_inference_pinned_missing_version(store: AsyncBlockchainModelStore) -> None:
    client = InferenceClient(store, PinnedMode(counter=7))
    result = asyncio.run(client.start())
    assert isinstance(result, Failure)


def test_inference_tracking_hot_swap(store: AsyncBlockchainModelStore) -> None:
    _commit_real_checkpoint(store, num_batches=1)

    async def run():
        client = InferenceClient(store, TrackingMode(), poll_interval=0.05)
        started = await client.start()
        assert isinstance(started, Success)
        first = client.get_model()
        # commit a new version while tracking
        from spectralmc_tpu.storage.checkpoint import commit_snapshot
        from spectralmc_tpu.training.trainer import GbmCVNNPricer
        from tests.test_trainer import make_pricer_config, make_training

        pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
        expect_success(pricer.train(make_training(num_batches=2)))
        await commit_snapshot(store, pricer.snapshot(), "v1")
        for _ in range(100):
            await asyncio.sleep(0.05)
            current = client.get_model()
            if current is not None and current.version.counter == 1:
                break
        await client.stop()
        return first, client.get_model()

    first, swapped = asyncio.run(run())
    assert first.version.counter == 0
    assert swapped.version.counter == 1  # hot-swapped
    assert swapped.config.global_step == 2


def test_inference_circuit_breaker(tmp_path) -> None:
    backend = FileSystemObjectStore(tmp_path, "cb")
    store = AsyncBlockchainModelStore(backend)
    _commit_real_checkpoint(store, num_batches=1)

    class FailingGet:
        def __init__(self, inner):
            self._inner = inner
            self.bucket = inner.bucket
            self.fail = False

        def __getattr__(self, name):
            return getattr(self._inner, name)

        async def get(self, key):
            if self.fail and key == "chain.json":
                return Failure(ObjectNotFound(bucket=self.bucket, key=key))
            return await self._inner.get(key)

    failing = FailingGet(backend)
    failing_store = AsyncBlockchainModelStore(failing)

    async def run():
        client = InferenceClient(
            failing_store, TrackingMode(), poll_interval=0.02, max_consecutive_failures=3
        )
        started = await client.start()
        assert isinstance(started, Success)
        failing.fail = True
        for _ in range(200):
            await asyncio.sleep(0.02)
            if client.circuit_open:
                break
        await client.stop()
        return client.circuit_open, client.get_model()

    circuit_open, model = asyncio.run(run())
    assert circuit_open
    assert model is not None  # keeps serving the last good model


# -- end-to-end: train -> commit -> reload -> deterministic continuation -------------


def test_training_with_storage_roundtrip(store: AsyncBlockchainModelStore) -> None:
    from spectralmc_tpu.storage.checkpoint import load_snapshot_from_checkpoint, make_commit_fn
    from spectralmc_tpu.training.trainer import FinalAndIntervalCommit, GbmCVNNPricer
    from tests.test_trainer import make_pricer_config, make_training

    pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    result = expect_success(
        pricer.train(
            make_training(num_batches=4),
            commit_plan=FinalAndIntervalCommit(interval=2),
            commit_fn=make_commit_fn(store),
        )
    )
    versions = expect_success(asyncio.run(store.list_versions()))
    assert [v.counter for v in versions] == [0, 1]  # interval commit @2, final @4

    head = expect_success(asyncio.run(store.get_head()))
    restored_cfg = expect_success(asyncio.run(load_snapshot_from_checkpoint(store, head)))
    assert restored_cfg.global_step == 4
    restored = expect_success(GbmCVNNPricer.create(restored_cfg))
    r1 = expect_success(pricer.train(make_training(num_batches=2)))
    r2 = expect_success(restored.train(make_training(num_batches=2)))
    np.testing.assert_array_equal(r1.losses, r2.losses)


def test_audit_log_appends_per_commit_and_is_nonfatal(tmp_path) -> None:
    """Every commit appends an audit_log/ JSONL record carrying the version's
    record_hash (reference store.py:774-786); an audit write failure is
    logged but never fails the commit."""
    import json

    from spectralmc_tpu.serialization import compute_sha256
    from spectralmc_tpu.storage.object_store import InMemoryObjectStore
    from spectralmc_tpu.storage.store import AUDIT_PREFIX, AsyncBlockchainModelStore

    backend = InMemoryObjectStore("audit")
    store = AsyncBlockchainModelStore(backend)

    async def flow() -> None:
        v0 = expect_success(await store.commit(b"a", compute_sha256(b"a"), "one"))
        v1 = expect_success(await store.commit(b"b", compute_sha256(b"b"), "two"))
        keys = expect_success(await backend.list(AUDIT_PREFIX))
        assert len(keys) == 2
        records = []
        for key in keys:
            data, _ = expect_success(await backend.get(key))
            records.append(json.loads(data))
        assert {r["counter"] for r in records} == {0, 1}
        for r, v in zip(sorted(records, key=lambda r: r["counter"]), (v0, v1)):
            assert r["content_hash"] == v.content_hash
            assert r["record_hash"] == v.compute_hash()

        # audit failure must not fail the commit
        original_put = backend.put

        async def failing_put(key, data, **kwargs):
            if key.startswith(AUDIT_PREFIX):
                from spectralmc_tpu.core.errors.storage import UnknownStoreError
                from spectralmc_tpu.core.result import Failure

                return Failure(
                    UnknownStoreError(bucket="audit", key=key, reason="disk full")
                )
            return await original_put(key, data, **kwargs)

        backend.put = failing_put  # type: ignore[method-assign]
        v2 = expect_success(await store.commit(b"c", compute_sha256(b"c"), "three"))
        assert v2.counter == 2  # commit succeeded despite the audit failure
        assert len(expect_success(await backend.list(AUDIT_PREFIX))) == 2

    asyncio.run(flow())
