"""CVNN layer tests (parity: reference tests/test_cvnn.py, both precisions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.models.cvnn import (
    ComplexLinear,
    ComplexResidual,
    ComplexSequential,
    CovarianceComplexBatchNorm,
    ModReLU,
    NaiveComplexBatchNorm,
    ZReLU,
    _inv_sqrt_2x2,
)

DTYPES = [jnp.float32, jnp.float64]


def _rand_pair(key, batch, features, dtype):
    k1, k2 = jax.random.split(key)
    return (
        jax.random.normal(k1, (batch, features), dtype),
        jax.random.normal(k2, (batch, features), dtype),
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_complex_linear_matches_complex_matmul(dtype) -> None:
    layer = ComplexLinear(in_dim=8, out_dim=5, dtype=dtype)
    params, state, out_dim = layer.init(jax.random.PRNGKey(0), 8)
    assert out_dim == 5
    re, im = _rand_pair(jax.random.PRNGKey(1), 16, 8, dtype)
    out_re, out_im, _ = layer.apply(params, state, re, im, train=True)
    z = (re + 1j * im).astype(jnp.complex64 if dtype == jnp.float32 else jnp.complex128)
    w = params["w_re"] + 1j * params["w_im"]
    b = params["b_re"] + 1j * params["b_im"]
    expected = z @ w + b
    tol = 1e-5 if dtype == jnp.float32 else 1e-12
    np.testing.assert_allclose(np.asarray(out_re), np.asarray(expected.real), rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(out_im), np.asarray(expected.imag), rtol=tol, atol=tol)


def test_complex_linear_init_is_xavier_zero_bias() -> None:
    layer = ComplexLinear(in_dim=64, out_dim=64, dtype=jnp.float32)
    params, _, _ = layer.init(jax.random.PRNGKey(0), 64)
    bound = np.sqrt(6.0 / 128.0)
    for k in ("w_re", "w_im"):
        w = np.asarray(params[k])
        assert np.abs(w).max() <= bound
        assert w.std() > 0.3 * bound
    assert np.all(np.asarray(params["b_re"]) == 0)


def test_zrelu_first_quadrant_gate() -> None:
    layer = ZReLU()
    re = jnp.array([[1.0, -1.0, 1.0, -1.0]])
    im = jnp.array([[1.0, 1.0, -1.0, -1.0]])
    out_re, out_im, _ = layer.apply({}, {}, re, im, train=True)
    np.testing.assert_array_equal(np.asarray(out_re), [[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(out_im), [[1.0, 0.0, 0.0, 0.0]])


def test_modrelu_phase_preserving_and_bias_gate() -> None:
    layer = ModReLU(features=2)
    params, state, _ = layer.init(jax.random.PRNGKey(0), 2)
    # with b = -2, a magnitude-1 input is killed; magnitude-5 shrinks to 3
    params = {"b": jnp.array([-2.0, -2.0], jnp.float32)}
    re = jnp.array([[1.0, 3.0]], jnp.float32)
    im = jnp.array([[0.0, 4.0]], jnp.float32)
    out_re, out_im, _ = layer.apply(params, state, re, im, train=True)
    np.testing.assert_allclose(np.asarray(out_re), [[0.0, 3 * 3 / 5]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_im), [[0.0, 4 * 3 / 5]], rtol=1e-5)
    # phase preserved
    assert np.angle(out_re[0, 1] + 1j * out_im[0, 1]) == pytest.approx(np.angle(3 + 4j), rel=1e-5)


@pytest.mark.parametrize("dtype", DTYPES)
def test_naive_bn_normalizes_in_train(dtype) -> None:
    layer = NaiveComplexBatchNorm(features=4, dtype=dtype)
    params, state, _ = layer.init(jax.random.PRNGKey(0), 4)
    re, im = _rand_pair(jax.random.PRNGKey(2), 512, 4, dtype)
    re = re * 3.0 + 5.0
    out_re, out_im, new_state = layer.apply(params, state, re, im, train=True)
    assert np.abs(np.asarray(out_re).mean(axis=0)).max() < 1e-4
    np.testing.assert_allclose(np.asarray(out_re).std(axis=0), 1.0, atol=1e-2)
    # running stats moved toward batch stats
    assert np.abs(np.asarray(new_state["mean_re"]) - 0.1 * np.asarray(re.mean(axis=0))).max() < 1e-4


def test_inv_sqrt_2x2_matches_eigh() -> None:
    rng = np.random.default_rng(3)
    for _ in range(20):
        a = rng.uniform(0.1, 3.0)
        c = rng.uniform(0.1, 3.0)
        b = rng.uniform(-1, 1) * np.sqrt(a * c) * 0.9
        m = np.array([[a, b], [b, c]])
        w, v = np.linalg.eigh(m)
        ref = v @ np.diag(w**-0.5) @ v.T
        w_rr, w_ri, w_ii = _inv_sqrt_2x2(
            jnp.float64(a), jnp.float64(b), jnp.float64(c), eps=0.0
        )
        got = np.array([[float(w_rr), float(w_ri)], [float(w_ri), float(w_ii)]])
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_cov_bn_whitens(dtype=jnp.float64) -> None:
    layer = CovarianceComplexBatchNorm(features=3, dtype=dtype, eps=1e-12)
    params, state, _ = layer.init(jax.random.PRNGKey(0), 3)
    key = jax.random.PRNGKey(9)
    re, im = _rand_pair(key, 4096, 3, dtype)
    # correlate re/im and scale
    im = 0.8 * re + 0.6 * im + 2.0
    re = re * 2.0 - 1.0
    out_re, out_im, _ = layer.apply(params, state, re, im, train=True)
    # With identity gamma the whitened covariance would be I; with the
    # 1/sqrt(2) Trabelsi init each component has variance 1/2 and zero corr.
    ore, oim = np.asarray(out_re), np.asarray(out_im)
    np.testing.assert_allclose(ore.var(axis=0), 0.5, atol=2e-2)
    np.testing.assert_allclose(oim.var(axis=0), 0.5, atol=2e-2)
    np.testing.assert_allclose((ore * oim).mean(axis=0) - ore.mean(0) * oim.mean(0), 0.0, atol=2e-2)
    assert np.abs(ore.mean(axis=0)).max() < 1e-6


def test_cov_bn_eval_uses_running_stats() -> None:
    layer = CovarianceComplexBatchNorm(features=2)
    params, state, _ = layer.init(jax.random.PRNGKey(0), 2)
    re, im = _rand_pair(jax.random.PRNGKey(4), 64, 2, jnp.float32)
    _, _, trained_state = layer.apply(params, state, re, im, train=True)
    out_re1, _, s1 = layer.apply(params, trained_state, re, im, train=False)
    out_re2, _, s2 = layer.apply(params, trained_state, re, im, train=False)
    np.testing.assert_array_equal(np.asarray(out_re1), np.asarray(out_re2))
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), s1, s2)
    )


def test_residual_identity_and_projection() -> None:
    body = ComplexLinear(in_dim=4, out_dim=4, dtype=jnp.float32)
    res = ComplexResidual(body=body)
    params, state, out_dim = res.init(jax.random.PRNGKey(0), 4)
    assert out_dim == 4
    re, im = _rand_pair(jax.random.PRNGKey(5), 8, 4, jnp.float32)
    out_re, _, _ = res.apply(params, state, re, im, train=True)
    body_re, _, _ = body.apply(params["body"], {}, re, im, train=True)
    np.testing.assert_allclose(np.asarray(out_re), np.asarray(body_re + re), rtol=1e-6)

    proj = ComplexLinear(in_dim=4, out_dim=6, bias=False, dtype=jnp.float32)
    wide = ComplexResidual(body=ComplexLinear(in_dim=4, out_dim=6, dtype=jnp.float32), projection=proj)
    p2, s2, d2 = wide.init(jax.random.PRNGKey(1), 4)
    assert d2 == 6
    out_re, out_im, _ = wide.apply(p2, s2, re, im, train=True)
    assert out_re.shape == (8, 6)


def test_sequential_composes_and_grads_flow() -> None:
    seq = ComplexSequential(
        (
            ComplexLinear(in_dim=4, out_dim=8, dtype=jnp.float32),
            ZReLU(),
            ComplexLinear(in_dim=8, out_dim=2, dtype=jnp.float32),
        )
    )
    params, state, out_dim = seq.init(jax.random.PRNGKey(0), 4)
    assert out_dim == 2
    re, im = _rand_pair(jax.random.PRNGKey(6), 16, 4, jnp.float32)

    def loss(p):
        o_re, o_im, _ = seq.apply(p, state, re, im, True)
        return jnp.sum(o_re**2) + jnp.sum(o_im**2)

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


# ---------------------------------------------------------------------------
# gradient correctness: autodiff vs central finite differences
# (evidence that the split re/im formulation carries Wirtinger-correct
# gradients through every layer kind — the property the reference gets
# implicitly from torch and never checks)
# ---------------------------------------------------------------------------


def _fd_grad_check(layer_cfgs, seed: int = 11, eps: float = 1e-4) -> None:
    import jax
    import jax.numpy as jnp

    from spectralmc_tpu.models.factory import build_cvnn_config, build_model
    from tests.helpers import expect_success

    cfg = expect_success(build_cvnn_config(layers=layer_cfgs, seed=seed))
    model = expect_success(build_model(cfg, input_dim=4, output_dim=6))
    params, state = model.init()
    key = jax.random.PRNGKey(99)
    x_re = jax.random.normal(key, (5, 4), jnp.float32)
    x_im = jax.random.normal(jax.random.fold_in(key, 1), (5, 4), jnp.float32)
    t_re = jax.random.normal(jax.random.fold_in(key, 2), (5, 6), jnp.float32)
    t_im = jax.random.normal(jax.random.fold_in(key, 3), (5, 6), jnp.float32)

    def loss(p):
        out_re, out_im, _ = model.apply(p, state, x_re, x_im, train=True)
        return jnp.mean(jnp.square(out_re - t_re)) + jnp.mean(jnp.square(out_im - t_im))

    grads = jax.grad(loss)(params)
    flat, treedef = jax.tree_util.tree_flatten(params)
    gflat = jax.tree_util.tree_leaves(grads)
    checked = 0
    for li, (leaf, gleaf) in enumerate(zip(flat, gflat)):
        # probe up to 3 coordinates per leaf
        idxs = [tuple(0 for _ in leaf.shape)]
        if leaf.size > 1:
            idxs.append(tuple(d - 1 for d in leaf.shape))
        for idx in idxs:
            def perturbed(delta):
                new_leaf = leaf.at[idx].add(delta) if leaf.shape else leaf + delta
                leaves2 = list(flat)
                leaves2[li] = new_leaf
                return float(loss(jax.tree_util.tree_unflatten(treedef, leaves2)))

            fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
            ad = float(gleaf[idx] if leaf.shape else gleaf)
            assert abs(fd - ad) < 5e-2 * max(1.0, abs(fd)), (
                f"leaf {li} idx {idx}: fd={fd:.6f} ad={ad:.6f}"
            )
            checked += 1
    assert checked >= 4


def test_grad_complex_linear_and_activations() -> None:
    from spectralmc_tpu.models.factory import Activation, LinearCfg

    _fd_grad_check([
        LinearCfg(width=8, activation=Activation.MODRELU),
        LinearCfg(width=8, activation=Activation.ZRELU),
    ])


def test_grad_covariance_bn_and_residual() -> None:
    from spectralmc_tpu.models.factory import Activation, CovBNCfg, LinearCfg, ResidualCfg, SequentialCfg

    _fd_grad_check([
        LinearCfg(width=8, activation=Activation.NONE),
        CovBNCfg(),
        ResidualCfg(body=SequentialCfg(layers=(LinearCfg(width=8, activation=Activation.MODRELU),))),
    ])


def test_grad_naive_bn() -> None:
    from spectralmc_tpu.models.factory import Activation, LinearCfg, NaiveBNCfg

    _fd_grad_check([
        LinearCfg(width=8, activation=Activation.NONE),
        NaiveBNCfg(),
        LinearCfg(width=8, activation=Activation.MODRELU),
    ])
