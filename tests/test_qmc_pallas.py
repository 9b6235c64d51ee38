"""Fused QMC generation kernel gates (ops/qmc_pallas.py).

The kernel's contract is BIT-IDENTITY with the XLA pipeline it replaces
(ops/qmc.py::qmc_effective_normals_multi): same scrambled-Sobol bits, same
inverse CDF, same HIGHEST-precision bridge contraction, so the SOBOL_BB
stream a checkpoint recorded is unchanged and no stream version hangs off
the fusion. Hermetically (CPU, interpret mode) the backend's matmul
accumulation order differs between the one-big-dot XLA shape and the
kernel's per-chunk dots, so the hermetic gates split the contract:

* the bits -> erf_inv pipeline is asserted EXACTLY by passing an identity
  bridge matrix (I @ z has one nonzero product per output — exact in any
  accumulation order), covering the split-table algebra, the traced-offset
  rotation, the seam rows and the factor-major permutation;
* the full bridge is asserted to f32-close;
* full bit-identity runs when a real TPU is present (the only backend the
  production gate ``qmc_fused_supported`` enables — MXU K<=64 is one
  systolic pass, so chunking the point axis cannot change any column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.ops.qmc import (
    _inv_cdf,
    _qmc_tables,
    brownian_bridge_matrix,
    qmc_effective_normals_multi,
    qmc_sobol_dims,
)
from spectralmc_tpu.ops.qmc_pallas import (
    _fused_effective_normals,
    qmc_fused_supported,
)
from spectralmc_tpu.ops.sobol import sobol_uint32_t

SHAPES = [
    # (timesteps, factors, rows, cols, row_offset)
    (16, 1, 64, 128, 0),
    (64, 1, 16, 256, 0),
    (16, 2, 32, 128, 0),
    (8, 4, 64, 64, 0),
    (16, 1, 64, 128, 192),  # start = 192*128 = 24576 (aligned)
    (16, 2, 32, 128, 1001),  # start = 1001*128 (misaligned: off = 128)
    (4, 1, 16, 128, 77),  # start = 77*128 = 9856 (off = 640, misaligned)
]


def _fused(T: int, F: int, rows: int, cols: int, off: int, bb: jax.Array) -> jax.Array:
    """Run the kernel (interpret mode off-TPU) with the generator's keying."""
    key = jax.random.PRNGKey(7)
    sdims = qmc_sobol_dims(T, F)
    assert sdims == T * F, "test shapes must be unpadded"
    dnp, snp = _qmc_tables(sdims, 31)
    shift_key, _ = jax.random.split(key)
    draw_shift = jax.random.bits(shift_key, (sdims,), dtype=jnp.uint32)
    start = jnp.uint32(off) * jnp.uint32(cols)  # traced, like the generator's
    return _fused_effective_normals(
        jnp.asarray(dnp),
        jnp.asarray(snp) ^ draw_shift,
        bb,
        start,
        timesteps=T,
        factors=F,
        count=rows * cols,
        interpret=jax.default_backend() != "tpu",
    )


def _xla_normals(T: int, F: int, rows: int, cols: int, off: int) -> jax.Array:
    """The XLA pipeline's pre-bridge normals, flat (level*F + factor) major."""
    key = jax.random.PRNGKey(7)
    sdims = qmc_sobol_dims(T, F)
    dnp, snp = _qmc_tables(sdims, 31)
    shift_key, _ = jax.random.split(key)
    draw_shift = jax.random.bits(shift_key, (sdims,), dtype=jnp.uint32)
    start = jnp.uint32(off) * jnp.uint32(cols)
    bits = sobol_uint32_t(jnp.asarray(dnp), jnp.asarray(snp) ^ draw_shift, start, rows * cols)
    return _inv_cdf(bits)  # [T*F, count]


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_bits_pipeline_exact(shape: tuple[int, int, int, int, int]) -> None:
    """Identity bridge => fused output IS the normal matrix, bit for bit.

    Exact on every backend: the algebra under test (split tables, c_hi seam
    rows, the traced-offset low-table rotation, the factor-major permutation,
    the erf_inv inverse) has no accumulation-order freedom.
    """
    T, F, rows, cols, off = shape
    eye = jnp.eye(T, dtype=jnp.float32)
    out = np.asarray(_fused(T, F, rows, cols, off, eye))  # [T, F, count]
    z = np.asarray(_xla_normals(T, F, rows, cols, off))  # [T*F, count]
    # fused rows are factor-major (row f*T + t = flat dim t*F + f)
    want = z.reshape(T, F, rows * cols)
    np.testing.assert_array_equal(
        out.view(np.uint32), want.view(np.uint32), err_msg=f"shape={shape}"
    )


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_bridge_close(shape: tuple[int, int, int, int, int]) -> None:
    """Real bridge matrix: f32-close everywhere (bit-identical on TPU)."""
    T, F, rows, cols, off = shape
    bb = jnp.asarray(brownian_bridge_matrix(T), jnp.float32)
    out = np.asarray(_fused(T, F, rows, cols, off, bb))
    z = np.asarray(_xla_normals(T, F, rows, cols, off)).reshape(T, F, rows * cols)
    want = np.einsum("tl,lfc->tfc", np.asarray(bb), z)
    np.testing.assert_allclose(out, want, rtol=2e-6, atol=2e-6)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="bit-identity of the MXU bridge is a TPU contract"
)
@pytest.mark.parametrize("shape", SHAPES)
def test_fused_bit_identical_on_tpu(shape: tuple[int, int, int, int, int]) -> None:
    """On the production backend the WHOLE pipeline is bit-identical to the
    public generator (which takes the fused path itself when supported, so
    compare against the explicitly-reconstructed XLA pipeline)."""
    T, F, rows, cols, off = shape
    bb = jnp.asarray(brownian_bridge_matrix(T), jnp.float32)
    out = np.asarray(_fused(T, F, rows, cols, off, bb))
    z = _xla_normals(T, F, rows, cols, off).reshape(T, F, rows * cols)
    want = np.asarray(
        jax.jit(
            lambda m, x: jax.lax.dot_general(
                m, x, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
            )
        )(bb, z)
    )
    np.testing.assert_array_equal(out.view(np.uint32), want.view(np.uint32))


def test_public_generator_unchanged_off_tpu() -> None:
    """Off-TPU the public generator must not take the kernel path (the gate
    requires the production backend), so hermetic golden streams are stable."""
    if jax.default_backend() == "tpu":
        pytest.skip("gate is expected ON for this backend")
    assert not qmc_fused_supported(
        timesteps=16, factors=1, count=8192, dtype=jnp.float32
    )
    # and the generator still works end to end (XLA path)
    out = qmc_effective_normals_multi(
        jax.random.PRNGKey(3),
        timesteps=16,
        factors=1,
        rows=8,
        cols=128,
        dtype=jnp.float32,
        mc_seed=5,
    )
    assert out.shape == (16, 1, 8, 128)


def test_supported_predicate_edges() -> None:
    """Padded dims, f64, and non-block-multiple counts must route to XLA."""
    on_tpu = jax.default_backend() == "tpu"
    # padded: timesteps*factors beyond the Joe-Kuo table
    assert not qmc_fused_supported(timesteps=128, factors=1, count=8192, dtype=jnp.float32)
    assert not qmc_fused_supported(timesteps=64, factors=2, count=8192, dtype=jnp.float32)
    # f64 compute
    assert not qmc_fused_supported(timesteps=16, factors=1, count=8192, dtype=jnp.float64)
    # partial split-table block
    assert not qmc_fused_supported(timesteps=16, factors=1, count=1536, dtype=jnp.float32)
    # the happy path is backend-gated
    assert (
        qmc_fused_supported(timesteps=16, factors=1, count=8192, dtype=jnp.float32)
        == on_tpu
    )


# --------------------------------------------------------------------------
# Round 5: fused QMC-fed walk (generation + log-Euler walk, one kernel)
# --------------------------------------------------------------------------

WALK_SHAPES = [
    # (timesteps, rows, cols, row_offset)
    (16, 64, 128, 0),
    (64, 16, 256, 0),
    (16, 64, 128, 192),  # aligned shard offset
    (16, 32, 128, 1001),  # misaligned shard offset (off = 128)
]

_WALK = dict(log_spot=np.log(100.0), drift=-2.6e-4, vol_sdt=0.025)


def _walk_fused(T: int, rows: int, cols: int, off: int, bb: jax.Array) -> np.ndarray:
    from spectralmc_tpu.ops.qmc_pallas import _fused_qmc_walk_acc

    key = jax.random.PRNGKey(7)
    dnp, snp = _qmc_tables(T, 31)
    shift_key, _ = jax.random.split(key)
    draw_shift = jax.random.bits(shift_key, (T,), dtype=jnp.uint32)
    start = jnp.uint32(off) * jnp.uint32(cols)
    return np.asarray(
        _fused_qmc_walk_acc(
            jnp.asarray(dnp),
            jnp.asarray(snp) ^ draw_shift,
            bb,
            start,
            jnp.float32(_WALK["log_spot"]),
            jnp.float32(_WALK["drift"]),
            jnp.float32(_WALK["vol_sdt"]),
            timesteps=T,
            count=rows * cols,
            interpret=jax.default_backend() != "tpu",
        )
    )


def _walk_reference(z: jax.Array, T: int) -> np.ndarray:
    """The XLA scan's accumulator over given effective normals [T, count]."""

    @jax.jit
    def run(zz: jax.Array) -> jax.Array:
        log_spot = jnp.float32(_WALK["log_spot"])
        drift = jnp.float32(_WALK["drift"])
        vol_sdt = jnp.float32(_WALK["vol_sdt"])

        def body(carry, t):
            logx, acc = carry
            logx = (logx + drift) + vol_sdt * zz[t]
            acc = acc + logx
            return (logx, acc), None

        n = zz.shape[1]
        log0 = jnp.full((1, n), 0.0, jnp.float32) + log_spot
        (_, acc), _ = jax.lax.scan(
            body, (log0, jnp.zeros((1, n), jnp.float32)), jnp.arange(T)
        )
        return acc[0]

    return np.asarray(run(z))


@pytest.mark.parametrize("shape", WALK_SHAPES)
def test_walk_identity_bridge_exact(shape: tuple[int, int, int, int]) -> None:
    """Identity bridge ⇒ the walk consumes the raw normal matrix, and every
    in-kernel op is an IEEE-exact f32 add/mul with the scan's expression
    trees — bit-identical on every backend."""
    T, rows, cols, off = shape
    eye = jnp.eye(T, dtype=jnp.float32)
    acc = _walk_fused(T, rows, cols, off, eye)
    z = _xla_normals(T, 1, rows, cols, off)  # [T, count]
    want = _walk_reference(z, T)
    np.testing.assert_array_equal(acc.view(np.uint32), want.view(np.uint32))


@pytest.mark.parametrize("shape", WALK_SHAPES)
def test_walk_real_bridge_close(shape: tuple[int, int, int, int]) -> None:
    """Real bridge: f32-close everywhere (the hermetic backend's matmul
    accumulation order differs; bit-identity is the TPU gate below)."""
    T, rows, cols, off = shape
    bb = jnp.asarray(brownian_bridge_matrix(T), jnp.float32)
    acc = _walk_fused(T, rows, cols, off, bb)
    z = _xla_normals(T, 1, rows, cols, off)
    eff = jnp.einsum("tl,lc->tc", bb, z)
    want = _walk_reference(eff, T)
    np.testing.assert_allclose(acc, want, rtol=3e-5, atol=3e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="walk bit-identity with the public scan path is a TPU contract",
)
@pytest.mark.parametrize("shape", WALK_SHAPES)
def test_walk_bit_identical_to_public_scan_on_tpu(
    shape: tuple[int, int, int, int]
) -> None:
    """On the production backend the PUBLIC Asian-geometric SOBOL_BB sim
    (which routes to the fused walk when supported) is bit-identical to the
    explicit scan over the public effective-normals generator — the stream a
    checkpoint recorded is unchanged by the fusion."""
    from spectralmc_tpu.ops.gbm import (
        PathScheme,
        PayoffKind,
        SamplingKind,
        simulate_underlier_rows,
    )
    from spectralmc_tpu.ops.qmc import qmc_effective_normals

    T, rows, cols, off = shape
    contract = jnp.asarray([100.0, 100.0, 1.0, 0.03, 0.01, 0.2], jnp.float32)
    key = jax.random.PRNGKey(11)
    got = np.asarray(
        simulate_underlier_rows(
            key, contract, timesteps=T, rows=rows, cols=cols,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.ASIAN_GEOMETRIC,
            sampling=SamplingKind.SOBOL_BB, mc_seed=31, row_offset=off,
        )
    )

    @jax.jit
    def scan_path(k: jax.Array) -> jax.Array:
        spot, _, maturity, rate, div_yield, vol = (contract[i] for i in range(6))
        dt = maturity / T
        ld = (rate - div_yield - 0.5 * vol * vol) * dt
        vstep = vol * jnp.sqrt(dt)
        zq = qmc_effective_normals(
            k, timesteps=T, rows=rows, cols=cols, dtype=jnp.float32,
            mc_seed=31, row_offset=off,
        )

        def body(carry, t):
            logx, acc = carry
            logx = logx + ld + vstep * zq[t]
            acc = acc + logx
            return (logx, acc), None

        log0 = jnp.full((rows, cols), 0.0, jnp.float32) + jnp.log(spot)
        (_, acc), _ = jax.lax.scan(
            body, (log0, jnp.zeros((rows, cols), jnp.float32)), jnp.arange(T)
        )
        return jnp.exp(acc / jnp.float32(T))

    want = np.asarray(scan_path(key))
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def test_walk_public_path_unchanged_off_tpu() -> None:
    """Off-TPU the public sim must not take the walk kernel (hermetic golden
    streams stay stable) and still prices the Asian-geometric QMC sim."""
    from spectralmc_tpu.ops.gbm import (
        PathScheme,
        PayoffKind,
        SamplingKind,
        simulate_underlier_rows,
    )
    from spectralmc_tpu.ops.qmc_pallas import qmc_walk_supported

    on_tpu = jax.default_backend() == "tpu"
    assert qmc_walk_supported(timesteps=16, count=8192, dtype=jnp.float32) == on_tpu
    contract = jnp.asarray([100.0, 100.0, 1.0, 0.03, 0.01, 0.2], jnp.float32)
    out = simulate_underlier_rows(
        jax.random.PRNGKey(3), contract, timesteps=16, rows=8, cols=128,
        dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
        payoff=PayoffKind.ASIAN_GEOMETRIC, sampling=SamplingKind.SOBOL_BB,
        mc_seed=5,
    )
    assert out.shape == (8, 128) and bool(jnp.isfinite(out).all())
