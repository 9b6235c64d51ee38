"""Sobol sampler tests (parity: reference tests/test_sobol_sampler.py).

Correctness anchor: the unscrambled sequence must match SciPy's Joe-Kuo
Sobol bit-for-bit at 30-bit resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict
from scipy.stats import qmc

from spectralmc_tpu.core.errors.sobol import BoundsFieldMismatch, InvalidBounds
from spectralmc_tpu.ops.sobol import (
    BoundSpec,
    SobolConfig,
    SobolSampler,
    build_bound_spec,
    build_domain_bounds,
    direction_numbers,
    sobol_unit,
)
from tests.helpers.result_utils import expect_failure, expect_success


class Point(BaseModel):
    model_config = ConfigDict(frozen=True)
    a: float
    b: float
    c: float


BOUNDS = {
    "a": BoundSpec(lower=0.0, upper=1.0),
    "b": BoundSpec(lower=-5.0, upper=5.0),
    "c": BoundSpec(lower=100.0, upper=200.0),
}


def test_matches_scipy_unscrambled() -> None:
    d, n = 16, 256
    v = jnp.asarray(direction_numbers(d))
    mine = np.asarray(sobol_unit(v, jnp.zeros(d, jnp.uint32), 0, n, jnp.float64))
    ref = qmc.Sobol(d, scramble=False).random(n)
    assert np.abs(mine - ref).max() < 2.0**-30


def test_fast_forward_equals_slicing() -> None:
    sampler = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=9)))
    full = np.asarray(sampler.sample_array(32))
    tail = np.asarray(sampler.with_skip(20).sample_array(12))
    np.testing.assert_array_equal(tail, full[20:])


def test_seed_determinism_and_divergence() -> None:
    s1 = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=1)))
    s1b = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=1)))
    s2 = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=2)))
    a, b, c = (np.asarray(s.sample_array(16)) for s in (s1, s1b, s2))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_scaling_respects_bounds() -> None:
    sampler = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=5)))
    pts = np.asarray(sampler.sample_array(512))
    for j, name in enumerate(("a", "b", "c")):
        assert pts[:, j].min() >= BOUNDS[name].lower
        assert pts[:, j].max() < BOUNDS[name].upper
        mid = (BOUNDS[name].lower + BOUNDS[name].upper) / 2
        assert abs(pts[:, j].mean() - mid) < 0.05 * (BOUNDS[name].upper - BOUNDS[name].lower)


def test_typed_sample_returns_models_and_advances() -> None:
    sampler = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=5)))
    rows, advanced = sampler.sample(8)
    assert len(rows) == 8 and all(isinstance(r, Point) for r in rows)
    assert advanced.skip == 8
    rows2, _ = advanced.sample(4)
    full = np.asarray(sampler.sample_array(12, dtype=jnp.float64))
    np.testing.assert_allclose([r.a for r in rows2], full[8:, 0], rtol=1e-12)


def test_bounds_validation() -> None:
    assert isinstance(expect_failure(build_bound_spec(2.0, 1.0)), InvalidBounds)
    err = expect_failure(build_domain_bounds(Point, {"a": BoundSpec(lower=0, upper=1)}))
    assert isinstance(err, BoundsFieldMismatch)
    bad = dict(BOUNDS)
    bad["b"] = BoundSpec.model_construct(lower=5.0, upper=-5.0)
    assert isinstance(expect_failure(build_domain_bounds(Point, bad)), InvalidBounds)


def test_sampling_inside_jit_with_traced_start() -> None:
    sampler = expect_success(SobolSampler.create(Point, BOUNDS, SobolConfig(seed=3)))
    table = sampler.device_table()

    @jax.jit
    def sample_at(start):
        from spectralmc_tpu.ops.sobol import scale_to_bounds, sobol_unit as su

        unit = su(table["directions"], table["shift"], start, 8, jnp.float32)
        return scale_to_bounds(unit, table["lower"], table["upper"])

    np.testing.assert_allclose(
        np.asarray(sample_at(jnp.uint32(40))),
        np.asarray(sampler.sample_array(8, start=40)),
        rtol=1e-6,
    )


def test_one_dimensional_stratification_under_scrambling() -> None:
    """The first 2^k Sobol points are a (t,m,d)-net: each dimension's
    projection hits every dyadic interval [j/2^k, (j+1)/2^k) exactly once —
    and left-matrix scrambling + digital shift preserve the property."""
    import jax.numpy as jnp
    import numpy as np

    from spectralmc_tpu.ops.gbm import BlackScholesContract
    from spectralmc_tpu.ops.sobol import SobolConfig, SobolSampler, sobol_unit
    from tests.helpers import expect_success
    from tests.helpers.factories import CONTRACT_BOUNDS

    sampler = expect_success(
        SobolSampler.create(BlackScholesContract, CONTRACT_BOUNDS, SobolConfig(seed=123))
    )
    dt = sampler.device_table()
    k = 8
    n = 1 << k
    unit = np.asarray(
        sobol_unit(dt["directions"], dt["shift"], 0, n, jnp.float32)
    )
    assert unit.shape[0] == n
    for dim in range(unit.shape[1]):
        cells = np.floor(unit[:, dim] * n).astype(int)
        assert sorted(cells) == list(range(n)), f"dim {dim} not stratified at 2^-{k}"


def test_sobol_uint32_split_table_matches_direct_reduce() -> None:
    """The round-4 split-table generator (broadcast XOR of a low-bits table
    and per-block high combinations, sobol.py::_SPLIT_LOG2) must be
    BIT-identical to the direct per-point gray-selector reduce for every
    (start, count) — static aligned, static misaligned, traced misaligned,
    and windows spanning block boundaries (the seam bit L-1 leak)."""
    from spectralmc_tpu.ops.sobol import BITS, direction_numbers, sobol_uint32

    d = 7
    directions = jnp.asarray(direction_numbers(d))
    shift = jnp.asarray(
        np.random.default_rng(5).integers(0, 1 << 32, size=(d,), dtype=np.uint32)
    )

    def direct(start: int, count: int) -> np.ndarray:
        idx = jnp.asarray(start, jnp.uint32) + jnp.arange(count, dtype=jnp.uint32)
        gray = idx ^ (idx >> 1)
        ks = jnp.arange(BITS, dtype=jnp.uint32)
        b = (gray[:, None] >> ks[None, :]) & jnp.uint32(1)
        masks = jnp.uint32(0) - b
        terms = masks[:, None, :] & directions[None, :, :]
        acc = jax.lax.reduce(terms, jnp.uint32(0), jax.lax.bitwise_xor, (2,))
        return np.asarray(acc ^ shift[None, :])

    cases = [
        (0, 32),          # static aligned, sub-block
        (0, 3000),        # static aligned, spans blocks
        (1024, 1024),     # static aligned at a block boundary
        (1, 31),          # static misaligned, inside one block
        (1000, 2100),     # static misaligned, spans the seam twice
        (1023, 2),        # straddles a single boundary
        (123456, 517),    # deep, odd window
    ]
    for start, count in cases:
        want = direct(start, count)
        got_static = np.asarray(sobol_uint32(directions, shift, start, count))
        np.testing.assert_array_equal(got_static, want, err_msg=f"static {start}")
        got_traced = np.asarray(
            jax.jit(lambda s: sobol_uint32(directions, shift, s, count))(
                jnp.uint32(start)
            )
        )
        np.testing.assert_array_equal(got_traced, want, err_msg=f"traced {start}")
