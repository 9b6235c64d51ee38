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
