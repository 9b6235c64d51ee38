"""CVNN factory tests (parity: reference tests/test_cvnn_factory.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectralmc_tpu.core.errors.cvnn import InvalidLayerConfig, InvalidModelConfig, StateDictMismatch
from spectralmc_tpu.core.precision import Precision
from spectralmc_tpu.models.factory import (
    Activation,
    CovBNCfg,
    LinearCfg,
    NaiveBNCfg,
    ResidualCfg,
    SequentialCfg,
    build_cvnn_config,
    build_model,
    get_state_dict,
    load_state_dict,
)
from tests.helpers import expect_failure, expect_success


def _small_config(seed: int = 3, precision: Precision = Precision.float32):
    return expect_success(
        build_cvnn_config(
            layers=(
                LinearCfg(width=16, activation=Activation.ZRELU),
                NaiveBNCfg(),
                ResidualCfg(body=LinearCfg(width=8), activation=Activation.MODRELU),
                SequentialCfg(layers=(LinearCfg(), CovBNCfg())),
            ),
            seed=seed,
            precision=precision,
        )
    )


def test_build_model_threads_widths() -> None:
    model = expect_success(build_model(_small_config(), input_dim=6, output_dim=4))
    params, state = model.init()
    re = jnp.zeros((2, 6), jnp.float32)
    out_re, out_im, _ = model.apply(params, state, re, re, train=True)
    assert out_re.shape == (2, 4) and out_im.shape == (2, 4)


def test_residual_projection_auto_inserted() -> None:
    cfg = expect_success(
        build_cvnn_config(layers=(ResidualCfg(body=LinearCfg(width=12)),), seed=1)
    )
    model = expect_success(build_model(cfg, input_dim=6, output_dim=3))
    params, _ = model.init()
    # residual params must include an auto projection 6 -> 12
    res_params = params["layer_0"]
    assert "projection" in res_params
    assert res_params["projection"]["w_re"].shape == (6, 12)


def test_deterministic_construction() -> None:
    m1 = expect_success(build_model(_small_config(seed=5), input_dim=6, output_dim=4))
    m2 = expect_success(build_model(_small_config(seed=5), input_dim=6, output_dim=4))
    m3 = expect_success(build_model(_small_config(seed=6), input_dim=6, output_dim=4))
    p1, _ = m1.init()
    p2, _ = m2.init()
    p3, _ = m3.init()
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), p1, p2))
    flat1 = jax.tree_util.tree_leaves(p1)
    flat3 = jax.tree_util.tree_leaves(p3)
    assert any(not np.array_equal(a, b) for a, b in zip(flat1, flat3))


def test_state_dict_roundtrip() -> None:
    model = expect_success(build_model(_small_config(), input_dim=6, output_dim=4))
    params, state = model.init()
    flat = get_state_dict(params, state)
    assert all(isinstance(v, np.ndarray) for v in flat.values())
    params2, state2 = expect_success(load_state_dict(model, flat))
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), params, params2)
    )
    re = jnp.ones((3, 6), jnp.float32)
    o1 = model.apply(params, state, re, re, train=False)[0]
    o2 = model.apply(params2, state2, re, re, train=False)[0]
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_load_rejects_mismatches() -> None:
    model = expect_success(build_model(_small_config(), input_dim=6, output_dim=4))
    params, state = model.init()
    flat = get_state_dict(params, state)
    missing = dict(flat)
    missing.pop(next(iter(missing)))
    assert isinstance(expect_failure(load_state_dict(model, missing)), StateDictMismatch)
    bad_shape = dict(flat)
    k = next(iter(bad_shape))
    bad_shape[k] = np.zeros((1, 1), dtype=bad_shape[k].dtype)
    assert isinstance(expect_failure(load_state_dict(model, bad_shape)), StateDictMismatch)


def test_config_validation() -> None:
    assert isinstance(
        expect_failure(build_cvnn_config(layers=(LinearCfg(),), seed=-1)), InvalidModelConfig
    )
    bad = expect_success(build_cvnn_config(layers=(LinearCfg(width=0),), seed=1))
    assert isinstance(
        expect_failure(build_model(bad, input_dim=4, output_dim=2)), InvalidLayerConfig
    )
    model_res = build_model(_small_config(), input_dim=0, output_dim=2)
    assert isinstance(expect_failure(model_res), InvalidModelConfig)


def test_float64_model() -> None:
    cfg = _small_config(precision=Precision.float64)
    model = expect_success(build_model(cfg, input_dim=6, output_dim=4))
    params, state = model.init()
    leaves = jax.tree_util.tree_leaves(params)
    assert all(leaf.dtype == jnp.float64 for leaf in leaves)
