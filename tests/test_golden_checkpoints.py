"""Golden checkpoint-bytes corpus (round 4, VERDICT r3 #6).

``tests/fixtures/checkpoints/*.pb`` are REAL serialized checkpoints from
round-4 training runs (provenance: ``generate.py`` alongside them), one per
representative (dynamics x payoff x knobs) cell. Unlike the in-code
legacy-migration tests (tests/test_adam_state.py), these pin actual BYTES
across rounds: any proto or converter change must keep every fixture

  1. decodable (``deserialize_checkpoint`` succeeds, hash verified),
  2. byte-stable (re-encoding the decoded config reproduces the fixture
     EXACTLY — field renumbering, dropped fields or changed defaults fail
     here), and
  3. resumable (``GbmCVNNPricer.create`` + 2 training batches run green,
     with the checkpointed knobs — engine, sampling, term, cliquet grid —
     surviving into the resumed sim).

Reference stance being matched: the checkpoint IS the contract
(/root/reference/src/spectralmc/gbm_trainer.py:301-313).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from spectralmc_tpu.serialization.converters import (
    deserialize_checkpoint,
    serialize_checkpoint,
)
from spectralmc_tpu.training.trainer import GbmCVNNPricer, build_training_config

FIXTURES = Path(__file__).resolve().parent / "fixtures" / "checkpoints"
MANIFEST = json.loads((FIXTURES / "manifest.json").read_text())


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_golden_checkpoint_decodes_reencodes_and_resumes(name: str) -> None:
    data = (FIXTURES / f"{name}.pb").read_bytes()
    cfg = deserialize_checkpoint(data, expected_hash=MANIFEST[name]).expect(name)

    # byte-stability: the decoded config re-serializes to the SAME bytes
    data2, sha2 = serialize_checkpoint(cfg)
    assert sha2 == MANIFEST[name], f"{name}: content hash drifted"
    assert data2 == data, f"{name}: re-encoded bytes differ from the fixture"

    # knob survival spot checks
    if name == "gbm_qmc_terminal":
        assert cfg.sim.sampling.value == "sobol_bb"
    if "_term_" in name:  # the curved-term cells (not "..._terminal"!)
        assert cfg.sim.term is not None and not cfg.sim.term.is_flat()
    if name == "merton_cliquet":
        assert cfg.sim.cliquet_reset_every == 4
    if name == "gbm_american_put":
        assert cfg.sim.lsmc_basis_degree == 3
        assert cfg.sim.lsmc_exercise_every == 2
    assert cfg.global_step == 2  # two training batches were snapshotted

    # resumability: the fixture trains onward through the public API
    pricer = GbmCVNNPricer.create(cfg).expect(name)
    tcfg = build_training_config(num_batches=2, batch_size=4, learning_rate=1e-3).expect(
        "cfg"
    )
    result = pricer.train(tcfg).expect(name)
    assert np.all(np.isfinite(np.asarray(result.losses)))


def test_corpus_covers_every_dynamics() -> None:
    models = set()
    for name in MANIFEST:
        data = (FIXTURES / f"{name}.pb").read_bytes()
        cfg = deserialize_checkpoint(data).expect(name)
        models.add(cfg.sim.model.value)
    assert models == {"gbm", "heston", "merton_jump", "basket_gbm"}
