"""Serialization round-trip tests (parity: reference serialization suite).

Flagship gate: a trained pricer's checkpoint serializes to proto bytes,
deserializes, and the restored pricer continues training bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from spectralmc_tpu.core.errors.serialization import ChecksumMismatch, DecodeError
from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.models.factory import (
    Activation,
    CovBNCfg,
    LinearCfg,
    NaiveBNCfg,
    ResidualCfg,
    SequentialCfg,
    build_cvnn_config,
)
from spectralmc_tpu.serialization import (
    compute_sha256,
    cvnn_config_from_proto,
    cvnn_config_to_proto,
    deserialize_checkpoint,
    serialize_checkpoint,
    sim_params_from_proto,
    sim_params_to_proto,
    tensor_from_proto,
    tensor_to_proto,
    verify_checksum,
)
from spectralmc_tpu.training.trainer import GbmCVNNPricer, build_training_config
from tests.helpers import expect_failure, expect_success
from tests.helpers.factories import make_simulation_params
from tests.test_trainer import make_pricer_config, make_training


def test_sha256_and_checksum() -> None:
    data = b"spectral"
    digest = compute_sha256(data)
    assert len(digest) == 64
    expect_success(verify_checksum(data, digest))
    err = expect_failure(verify_checksum(b"tampered", digest))
    assert isinstance(err, ChecksumMismatch)


@pytest.mark.parametrize(
    "dtype", ["float32", "float64", "complex64", "complex128", "uint32", "int32", "bfloat16"]
)
def test_tensor_roundtrip(dtype: str) -> None:
    import ml_dtypes

    np_dtype = np.dtype(getattr(ml_dtypes, dtype)) if dtype == "bfloat16" else np.dtype(dtype)
    arr = np.arange(24).reshape(2, 3, 4).astype(np_dtype)
    back = expect_success(tensor_from_proto(tensor_to_proto(arr)))
    assert back.dtype == np_dtype
    np.testing.assert_array_equal(back, arr)


def test_tensor_scalar_and_corrupt() -> None:
    arr = np.array(3.5, dtype=np.float32)
    back = expect_success(tensor_from_proto(tensor_to_proto(arr)))
    assert back.shape == ()
    proto = tensor_to_proto(np.ones((4,), np.float32))
    proto.data = proto.data[:-2]  # truncate
    assert isinstance(expect_failure(tensor_from_proto(proto)), DecodeError)


def test_sim_params_roundtrip() -> None:
    sim = make_simulation_params(skip=17, precision=Precision.float64)
    back = expect_success(sim_params_from_proto(sim_params_to_proto(sim)))
    assert back == sim


def test_cvnn_config_recursive_roundtrip() -> None:
    """The full recursive layer ADT round-trips (the reference left this
    unfinished, serialization/models.py:150)."""
    cfg = expect_success(
        build_cvnn_config(
            layers=[
                LinearCfg(width=32, activation=Activation.MODRELU),
                NaiveBNCfg(),
                ResidualCfg(
                    body=SequentialCfg(
                        layers=(
                            LinearCfg(width=64, bias=False, activation=Activation.ZRELU),
                            CovBNCfg(),
                            LinearCfg(width=None),
                        )
                    ),
                    activation=Activation.MODRELU,
                ),
                LinearCfg(width=16),
            ],
            seed=9,
            final_activation=Activation.ZRELU,
        )
    )
    back = expect_success(cvnn_config_from_proto(cvnn_config_to_proto(cfg)))
    assert back == cfg


def test_checkpoint_roundtrip_resumes_bit_exact() -> None:
    """Serialize a trained snapshot -> bytes -> restore -> continue == continuous."""
    continuous = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    r_full = expect_success(continuous.train(make_training(num_batches=6)))

    half = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    expect_success(half.train(make_training(num_batches=3)))
    data, digest = serialize_checkpoint(half.snapshot())
    assert compute_sha256(data) == digest

    restored_cfg = expect_success(deserialize_checkpoint(data, expected_hash=digest))
    assert restored_cfg.global_step == 3
    restored = expect_success(GbmCVNNPricer.create(restored_cfg))
    r_resumed = expect_success(restored.train(make_training(num_batches=3)))
    np.testing.assert_array_equal(r_full.losses[3:], r_resumed.losses)

    s1, s2 = continuous.snapshot(), restored.snapshot()
    for key in s1.model_state:
        np.testing.assert_array_equal(s1.model_state[key], s2.model_state[key])
    assert s1.optimizer_state.count == s2.optimizer_state.count
    for key in s1.optimizer_state.mu:
        np.testing.assert_array_equal(s1.optimizer_state.mu[key], s2.optimizer_state.mu[key])
        np.testing.assert_array_equal(s1.optimizer_state.nu[key], s2.optimizer_state.nu[key])


def test_checkpoint_deterministic_bytes() -> None:
    """Same snapshot -> identical bytes (deterministic proto serialization)."""
    pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    expect_success(pricer.train(make_training(num_batches=2)))
    d1, h1 = serialize_checkpoint(pricer.snapshot())
    d2, h2 = serialize_checkpoint(pricer.snapshot())
    assert d1 == d2 and h1 == h2


def test_checkpoint_rejects_garbage_and_tamper() -> None:
    assert isinstance(expect_failure(deserialize_checkpoint(b"\xff\xfe not a proto")), DecodeError)
    pricer = expect_success(GbmCVNNPricer.create(make_pricer_config()))
    data, digest = serialize_checkpoint(pricer.snapshot())
    tampered = data[:-1] + bytes([data[-1] ^ 0xFF])
    assert isinstance(
        expect_failure(deserialize_checkpoint(tampered, expected_hash=digest)),
        ChecksumMismatch,
    )
