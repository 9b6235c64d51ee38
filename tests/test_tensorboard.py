"""TensorBoard adapter tests (per-step logger + chain history writer).

torch/tensorboard are optional extras; these tests use a recording fake
writer so they stay hermetic (the adapters only need add_scalar/add_text/
flush/close).
"""

from __future__ import annotations

import asyncio

import numpy as np
import pytest

from spectralmc_tpu.serialization import compute_sha256


class FakeWriter:
    def __init__(self) -> None:
        self.scalars: list[tuple[str, float, int]] = []
        self.texts: list[tuple[str, int]] = []
        self.flushes = 0
        self.closed = False

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.scalars.append((tag, float(value), int(step)))

    def add_text(self, tag: str, text: str, step: int) -> None:
        self.texts.append((tag, step))

    def flush(self) -> None:
        self.flushes += 1

    def close(self) -> None:
        self.closed = True


def test_step_logger_scalars_and_flush(monkeypatch: pytest.MonkeyPatch) -> None:
    import spectralmc_tpu.utils.tensorboard_writer as tbw
    from spectralmc_tpu.training.trainer import StepMetrics

    fake = FakeWriter()
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake)
    logger = tbw.TensorBoardLogger("unused", flush_every=2)
    for step in range(1, 5):
        logger(StepMetrics(step=step, loss=1.0 / step, grad_norm=0.5, learning_rate=1e-3))
    logger.close()

    tags = {t for t, _, _ in fake.scalars}
    assert {"train/loss", "train/grad_norm", "train/learning_rate"} <= tags
    assert fake.flushes >= 2  # flush_every=2 over 4 steps, plus close
    assert fake.closed


def test_chain_history_writer(monkeypatch: pytest.MonkeyPatch, tmp_path) -> None:
    import spectralmc_tpu.utils.tensorboard_writer as tbw
    from spectralmc_tpu.storage.object_store import FileSystemObjectStore
    from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
    from tests.helpers import expect_success

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "tb"))

    async def fill() -> None:
        # two real proto checkpoints so global_step/param_count scalars emit
        from spectralmc_tpu.storage.checkpoint import commit_snapshot
        from spectralmc_tpu.training.trainer import GbmCVNNPricer
        from tests.test_trainer import make_pricer_config, make_training

        pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
        expect_success(pricer.train(make_training(num_batches=1)))
        expect_success(await commit_snapshot(store, pricer.snapshot(), "one"))
        expect_success(pricer.train(make_training(num_batches=1)))
        expect_success(await commit_snapshot(store, pricer.snapshot(), "two"))

    asyncio.run(fill())
    fake = FakeWriter()
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake)
    count = expect_success(asyncio.run(tbw.log_chain_to_tensorboard(store, "unused")))
    assert count == 2
    tags = {t for t, _, _ in fake.scalars}
    assert {"chain/global_step", "chain/param_count", "chain/versions_per_day"} <= tags
    assert len(fake.texts) == 2
    assert fake.closed


def test_chain_writer_tolerates_non_checkpoint_payloads(
    monkeypatch: pytest.MonkeyPatch, tmp_path
) -> None:
    import spectralmc_tpu.utils.tensorboard_writer as tbw
    from spectralmc_tpu.storage.object_store import FileSystemObjectStore
    from spectralmc_tpu.storage.store import AsyncBlockchainModelStore
    from tests.helpers import expect_success

    store = AsyncBlockchainModelStore(FileSystemObjectStore(str(tmp_path), "tb2"))

    async def fill() -> None:
        payload = b"not a protobuf checkpoint"
        expect_success(await store.commit(payload, compute_sha256(payload), "raw"))

    asyncio.run(fill())
    fake = FakeWriter()
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake)
    count = expect_success(asyncio.run(tbw.log_chain_to_tensorboard(store, "unused")))
    assert count == 0  # text-only entry, no scalars, no crash
    assert len(fake.texts) == 1


def test_segment_logger_matches_per_step_scalars(monkeypatch: pytest.MonkeyPatch) -> None:
    """log_segment writes the same scalar stream as the per-step __call__,
    with one Python call per device segment."""
    import numpy as np

    import spectralmc_tpu.utils.tensorboard_writer as tbw
    from spectralmc_tpu.training.trainer import SegmentMetrics, StepMetrics

    fake_seg, fake_step = FakeWriter(), FakeWriter()
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake_seg)
    seg_logger = tbw.TensorBoardLogger("unused", flush_every=2)
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake_step)
    step_logger = tbw.TensorBoardLogger("unused", flush_every=2)

    losses = np.array([3.0, 2.0, 1.5], dtype=np.float32)
    gnorms = np.array([0.3, 0.2, 0.1], dtype=np.float32)
    seg_logger.log_segment(
        SegmentMetrics(start_step=5, losses=losses, grad_norms=gnorms, learning_rate=1e-3)
    )
    for i in range(3):
        step_logger(
            StepMetrics(step=5 + i, loss=float(losses[i]), grad_norm=float(gnorms[i]),
                        learning_rate=1e-3)
        )
    assert fake_seg.scalars == fake_step.scalars
    assert fake_seg.flushes >= 1


def test_segment_logger_histogram_cadence(monkeypatch: pytest.MonkeyPatch) -> None:
    import numpy as np

    import spectralmc_tpu.utils.tensorboard_writer as tbw
    from spectralmc_tpu.training.trainer import SegmentMetrics

    class HistWriter(FakeWriter):
        def __init__(self) -> None:
            super().__init__()
            self.hists: list[tuple[str, int]] = []

        def add_histogram(self, tag: str, values, step: int) -> None:
            self.hists.append((tag, step))

    fake = HistWriter()
    monkeypatch.setattr(tbw, "_make_writer", lambda logdir: fake)
    logger = tbw.TensorBoardLogger(
        "unused", hist_every=10, param_source=lambda: {"w": np.zeros(2)}
    )
    # segment [1..5]: does not cross a 10-step boundary -> no histogram
    logger.log_segment(SegmentMetrics(1, np.ones(5), np.ones(5), 1e-3))
    assert fake.hists == []
    # segment [6..12]: crosses step 10 -> one histogram ON the grid step 10
    logger.log_segment(SegmentMetrics(6, np.ones(7), np.ones(7), 1e-3))
    assert fake.hists == [("w", 10)]
    # segment [13..31]: crosses 20 and 30 -> histograms on both grid steps
    logger.log_segment(SegmentMetrics(13, np.ones(19), np.ones(19), 1e-3))
    assert fake.hists == [("w", 10), ("w", 20), ("w", 30)]
