"""Fused Pallas LSMC backward gates (ops/lsmc_pallas.py).

The fused backward is the SAME estimator definition as the shared XLA
backward (centered-moneyness moments, 1/N normalization, relative-Tikhonov
scalar Cholesky — the solve is literally the same code object) at a
DIFFERENT float reduction order, so the contract split three ways:

* the deterministic collapse — identical paths make the regression exact up
  to the ridge, so the Bermudan value reduces to the host Bellman DP — is
  asserted sharply (the same oracle as the monitor-row forward kernels,
  tests/test_gbm_pallas.py);
* against the XLA estimator on RANDOM rows, prices must agree to MC-noise
  tolerance and only a vanishing fraction of near-boundary paths may flip
  their exercise date (β differs in final ulps);
* the stream-version story: which backward ran is checkpointed state
  (``SimulationParams.lsmc_fused_backward`` + ``LSMC_BACKWARD_VERSIONS``),
  and the support predicate must reject everything the kernel cannot honor
  so a checkpoint never records a backward that did not run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spectralmc_tpu.ops.american import encode_monitor_prices
from spectralmc_tpu.ops.lsmc_pallas import (
    LSMC_BACKWARD_VERSIONS,
    lsmc_fused_backward,
    lsmc_fused_backward_supported,
)

INTERPRET = jax.default_backend() != "tpu"


def _synthetic_rows(
    n_monitor: int, rows: int, cols: int, seed: int = 0
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(price_rows, strike, disc, df) — a GBM-ish monitor-date path matrix."""
    key = jax.random.PRNGKey(seed)
    rate, vol, maturity = 0.03, 0.2, 1.0
    dt = maturity / n_monitor
    z = jax.random.normal(key, (n_monitor, rows, cols), jnp.float32)
    logs = jnp.cumsum(
        jnp.float32(vol * np.sqrt(dt)) * z
        + jnp.float32((rate - 0.5 * vol * vol) * dt),
        axis=0,
    )
    price_rows = jnp.float32(100.0) * jnp.exp(logs)
    return (
        price_rows,
        jnp.float32(100.0),
        jnp.exp(jnp.float32(-rate * dt)),
        jnp.exp(jnp.float32(-rate * maturity)),
    )


def _fused(price_rows, strike, disc, df, *, put=True, degree=5):
    with pltpu.force_tpu_interpret_mode() if INTERPRET else _null():
        return lsmc_fused_backward(
            price_rows,
            strike=strike,
            disc_monitor=disc,
            df_total=df,
            put=put,
            basis_degree=degree,
            interpret=INTERPRET,
        )


class _null:
    def __enter__(self):  # pragma: no cover - trivial
        return self

    def __exit__(self, *a):  # pragma: no cover - trivial
        return False


@pytest.mark.parametrize("put", [True, False])
def test_fused_backward_matches_xla_estimator_statistically(put: bool) -> None:
    """Random rows: the fused and shared backwards are the same estimator at
    different reduction orders — mean cashflows agree to far below MC noise
    and only a vanishing set of near-boundary paths may flip."""
    n_monitor, rows, cols = 8, 128, 256
    price_rows, strike, disc, df = _synthetic_rows(n_monitor, rows, cols)
    maturity, rate = jnp.float32(1.0), jnp.float32(0.03)
    u_fused = np.asarray(_fused(price_rows, strike, disc, df, put=put))
    u_xla = np.asarray(
        encode_monitor_prices(
            price_rows,
            strike=strike,
            maturity=maturity,
            rate=rate,
            disc_monitor=disc,
            dtype=jnp.float32,
            put=put,
            basis_degree=5,
        )
    )
    cf_fused = (float(strike) - u_fused) * float(df)
    cf_xla = (float(strike) - u_xla) * float(df)
    assert abs(cf_fused.mean() - cf_xla.mean()) <= max(
        2e-3 * abs(cf_xla.mean()), 2e-3
    )
    flipped = np.mean(u_fused != u_xla)
    assert flipped <= 0.02, f"{flipped:.4f} of paths flipped exercise dates"


@pytest.mark.parametrize("side", ["put", "call"])
def test_fused_backward_zero_variance_matches_bellman_dp(side: str) -> None:
    """Identical paths collapse the regression to the deterministic Bellman
    DP — the sharp oracle for the whole induction + encode (the same
    contract as test_gbm_pallas's zero-bit monitor gates).

    Path-count note (a real finding, affecting BOTH backends equally): with
    ALL paths identical, the rank-1 Gram's f32 summation noise at ≥~16k
    paths rivals the 1e-6 relative ridge and the solve degenerates — the
    oracle collapse is a SMALL-sample contract (1,024 paths here, like the
    existing zero-bit gates). Real workloads never have identical paths, so
    only the degenerate oracle sees this; random-row agreement is gated
    separately above at 32k paths."""
    n_monitor, rows, cols = 8, 8, 128
    rate, maturity, strike = 0.03, 1.0, 100.0
    dt = maturity / n_monitor
    disc = float(np.exp(-rate * dt))
    # a deterministic path that crosses the strike so both sides see ITM dates
    s_path = np.float32(
        100.0 * np.exp(np.linspace(0.08, -0.12, n_monitor))
    )
    price_rows = jnp.broadcast_to(
        jnp.asarray(s_path)[:, None, None], (n_monitor, rows, cols)
    ).astype(jnp.float32)
    u = np.asarray(
        _fused(
            price_rows,
            jnp.float32(strike),
            jnp.float32(disc),
            jnp.exp(jnp.float32(-rate * maturity)),
            put=side == "put",
        )
    )
    assert np.allclose(u, u[0, 0], rtol=1e-5)

    def payoff(x: float) -> float:
        return max(strike - x, 0.0) if side == "put" else max(x - strike, 0.0)

    v = payoff(float(s_path[-1]))
    for d in range(n_monitor - 2, -1, -1):
        ex = payoff(float(s_path[d]))
        v = ex if (ex > 0.0 and ex > disc * v) else disc * v
    expected = strike - (disc * v) / np.exp(-rate * maturity)
    assert u[0, 0] == pytest.approx(expected, rel=1e-4)


def test_fused_backward_supported_edges() -> None:
    """Everything the kernel cannot honor must route to the shared backward."""
    on_tpu = jax.default_backend() == "tpu"
    ok = dict(dtype=jnp.float32, rows=4096, cols=256, n_monitor=16)
    assert lsmc_fused_backward_supported(**ok) == on_tpu
    # each rejection reason, one at a time
    assert not lsmc_fused_backward_supported(**{**ok, "dtype": jnp.float64})
    assert not lsmc_fused_backward_supported(**ok, cross_fit=True)
    assert not lsmc_fused_backward_supported(**ok, has_extra=True)
    assert not lsmc_fused_backward_supported(**ok, term=True)
    assert not lsmc_fused_backward_supported(**ok, axis_name="paths")
    assert not lsmc_fused_backward_supported(**{**ok, "n_monitor": 1})
    # VMEM cap: the resident cashflow carrier + double-buffered row stream
    assert not lsmc_fused_backward_supported(**{**ok, "rows": 8192})
    # chunking constraint: rows must admit an (8, ·)-aligned chunk
    assert not lsmc_fused_backward_supported(**{**ok, "rows": 12})
    assert not lsmc_fused_backward_supported(**{**ok, "cols": 192})
    # adaptive chunking accepts small hermetic shapes and odd multiples
    from spectralmc_tpu.ops.lsmc_pallas import _backward_chunk_rows

    assert _backward_chunk_rows(4096) == 128
    assert _backward_chunk_rows(8) == 8
    assert _backward_chunk_rows(72) == 72  # 72 = 9·8, divides itself
    assert _backward_chunk_rows(12) is None


def test_backward_version_key_is_orthogonal_to_forward_streams() -> None:
    """The fused backwards version their own arithmetic, not the forward
    stream: the keys exist, are >= 1, are DISTINCT from each other (the two
    kernels' reduction orders differ, so a checkpoint must record which one
    ran), and are disjoint from the forward PALLAS_STREAM_VERSIONS namespace
    (a forward kernel rebuild must never invalidate a backward and vice
    versa)."""
    from spectralmc_tpu.ops.gbm_pallas import PALLAS_STREAM_VERSIONS

    assert LSMC_BACKWARD_VERSIONS["fused"] >= 1
    assert LSMC_BACKWARD_VERSIONS["fused_streamed"] >= 1
    assert (
        LSMC_BACKWARD_VERSIONS["fused"] != LSMC_BACKWARD_VERSIONS["fused_streamed"]
    )
    assert set(LSMC_BACKWARD_VERSIONS) & set(PALLAS_STREAM_VERSIONS) == set()


def test_wrapper_fused_backward_interpret_zero_bits() -> None:
    """The public wrapper with fused_backward=True runs forward + fused
    backward end to end under the interpreter: zero-bit streams collapse to
    the Bellman DP exactly like the shared-backward gate."""
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    spot, strike, maturity, rate, div_yield, vol = 100.0, 100.0, 1.0, 0.03, 0.01, 0.2
    arr = jnp.asarray([spot, strike, maturity, rate, div_yield, vol], jnp.float32)
    timesteps, rows, cols = 8, 128, 128
    with pltpu.force_tpu_interpret_mode():
        u = simulate_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=timesteps, rows=rows,
            cols=cols, dtype=jnp.float32, option=OptionSide.CALL,
            fused_backward=True, interpret=True,
        )
    u = np.asarray(u)
    assert u.shape == (rows, cols)
    assert np.all(np.isfinite(u)) and np.allclose(u, u[0, 0], rtol=1e-5)

    # host replay (zero-bit stream: z = r per draw; pair-step per segment)
    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = maturity / timesteps
    drift = (rate - div_yield - 0.5 * vol**2) * dt
    seg = drift + vol * np.sqrt(dt) * r  # exercise_every=1: one draw per step
    s = spot * np.exp(seg * np.arange(1, timesteps + 1))
    disc = np.exp(-rate * dt)

    v = max(s[-1] - strike, 0.0)
    for d in range(timesteps - 2, -1, -1):
        ex = max(s[d] - strike, 0.0)
        v = ex if (ex > 0.0 and ex > disc * v) else disc * v
    expected = strike - (disc * v) / np.exp(-rate * maturity)
    assert u[0, 0] == pytest.approx(expected, rel=1e-4)


# --------------------------------------------------------------------------
# streamed backward (ops/lsmc_pallas.py round-5 tail: carriers past VMEM)
# --------------------------------------------------------------------------
#
# NOTE on interpret harnessing: the streamed kernel's manual DMA/semaphore
# schedule runs fine under plain ``interpret=True`` but is pathologically
# slow under ``force_tpu_interpret_mode`` (measured: 5 s vs >300 s at tiny
# shapes — the force context's threaded DMA emulation serializes against the
# per-block semaphore waits). The direct-kernel gates below therefore use
# plain interpret; wrapper-level ROUTING is gated separately with a
# monkeypatched delegate because the forward kernel's ``prng_seed`` needs
# the force context hermetically.


def _streamed(price_rows, strike, disc, df, *, put=True, degree=5):
    from spectralmc_tpu.ops.lsmc_pallas import lsmc_streamed_backward

    return lsmc_streamed_backward(
        price_rows,
        strike=strike,
        disc_monitor=disc,
        df_total=df,
        put=put,
        basis_degree=degree,
        interpret=INTERPRET,
    )


@pytest.mark.parametrize("put", [True, False])
def test_streamed_backward_matches_xla_estimator_statistically(put: bool) -> None:
    """Random rows: the streamed and shared backwards are the same estimator
    at different reduction orders — mean cashflows agree to far below MC
    noise and only a vanishing set of near-boundary paths may flip."""
    n_monitor, rows, cols = 8, 128, 256
    price_rows, strike, disc, df = _synthetic_rows(n_monitor, rows, cols)
    maturity, rate = jnp.float32(1.0), jnp.float32(0.03)
    u_s = np.asarray(_streamed(price_rows, strike, disc, df, put=put))
    u_xla = np.asarray(
        encode_monitor_prices(
            price_rows,
            strike=strike,
            maturity=maturity,
            rate=rate,
            disc_monitor=disc,
            dtype=jnp.float32,
            put=put,
            basis_degree=5,
        )
    )
    cf_s = (float(strike) - u_s) * float(df)
    cf_xla = (float(strike) - u_xla) * float(df)
    assert abs(cf_s.mean() - cf_xla.mean()) <= max(2e-3 * abs(cf_xla.mean()), 2e-3)
    flipped = np.mean(u_s != u_xla)
    assert flipped <= 0.02, f"{flipped:.4f} of paths flipped exercise dates"


@pytest.mark.parametrize("side", ["put", "call"])
def test_streamed_backward_zero_variance_matches_bellman_dp(side: str) -> None:
    """Identical paths collapse the regression to the deterministic Bellman
    DP — the same sharp oracle as the VMEM kernel's gate, at a shape with
    ≥ 2 row blocks so the lagged cross-block schedule is exercised."""
    n_monitor, rows, cols = 8, 16, 128
    rate, maturity, strike = 0.03, 1.0, 100.0
    dt = maturity / n_monitor
    disc = float(np.exp(-rate * dt))
    s_path = np.float32(100.0 * np.exp(np.linspace(0.08, -0.12, n_monitor)))
    price_rows = jnp.broadcast_to(
        jnp.asarray(s_path)[:, None, None], (n_monitor, rows, cols)
    ).astype(jnp.float32)
    u = np.asarray(
        _streamed(
            price_rows,
            jnp.float32(strike),
            jnp.float32(disc),
            jnp.exp(jnp.float32(-rate * maturity)),
            put=side == "put",
        )
    )
    assert np.allclose(u, u[0, 0], rtol=1e-5)

    def payoff(x: float) -> float:
        return max(strike - x, 0.0) if side == "put" else max(x - strike, 0.0)

    v = payoff(float(s_path[-1]))
    for d in range(n_monitor - 2, -1, -1):
        ex = payoff(float(s_path[d]))
        v = ex if (ex > 0.0 and ex > disc * v) else disc * v
    expected = strike - (disc * v) / np.exp(-rate * maturity)
    assert u[0, 0] == pytest.approx(expected, rel=1e-4)


def test_streamed_backward_supported_edges() -> None:
    """The streamed predicate: accepts past the VMEM cap (its reason to
    exist), rejects everything structural the VMEM kernel also rejects,
    and demands >= 2 row blocks (one block belongs to the VMEM kernel)."""
    from spectralmc_tpu.ops.lsmc_pallas import (
        _streamed_block_rows,
        lsmc_streamed_backward_supported,
    )

    on_tpu = jax.default_backend() == "tpu"
    big = dict(dtype=jnp.float32, rows=32768, cols=128, n_monitor=16)
    assert lsmc_streamed_backward_supported(**big) == on_tpu
    # the shape the VMEM kernel rejects (4.19M paths) is the point
    assert not lsmc_fused_backward_supported(**big)
    # structural rejections, one at a time
    assert not lsmc_streamed_backward_supported(**{**big, "dtype": jnp.float64})
    assert not lsmc_streamed_backward_supported(**big, cross_fit=True)
    assert not lsmc_streamed_backward_supported(**big, has_extra=True)
    assert not lsmc_streamed_backward_supported(**big, term=True)
    assert not lsmc_streamed_backward_supported(**big, axis_name="paths")
    assert not lsmc_streamed_backward_supported(**{**big, "n_monitor": 1})
    assert not lsmc_streamed_backward_supported(**{**big, "cols": 192})
    # block decomposition: >= 2 sublane-aligned blocks must divide rows
    assert not lsmc_streamed_backward_supported(**{**big, "rows": 8})
    assert not lsmc_streamed_backward_supported(**{**big, "rows": 12})
    assert _streamed_block_rows(32768, 128) == 1024  # ~512 KiB slabs
    assert _streamed_block_rows(16, 128) == 8  # 2 blocks — smallest accepted
    assert _streamed_block_rows(8, 128) is None
    # compile-time envelope: past _STREAMED_MAX_BLOCKS (64 blocks — the
    # per-sweep loop is Python-unrolled) the shape routes to the shared
    # backward instead of hiding a minutes-long Mosaic compile
    assert _streamed_block_rows(32768, 256) == 512  # 64 blocks — the cap
    assert _streamed_block_rows(65536, 256) is None  # 16.7M paths: 128 blocks
    assert not lsmc_streamed_backward_supported(
        **{**big, "rows": 65536, "cols": 256}
    )


def test_wrapper_routes_streamed_past_vmem_cap(
    monkeypatch: pytest.MonkeyPatch,
) -> None:
    """The public wrapper resolves backward kind 2 when the VMEM kernel's
    cap rejects and the streamed predicate accepts — gated with a recording
    delegate (the force-interpret context the forward kernel needs is
    pathologically slow on the manual-DMA kernel, module note above)."""
    import spectralmc_tpu.ops.lsmc_pallas as lp
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    monkeypatch.setattr(lp, "_FUSED_BACKWARD_MAX_ELEMS", 0)
    calls: list[str] = []
    real_fused = lp.lsmc_fused_backward

    def recording_streamed(price_rows, **kw):
        calls.append("streamed")
        return real_fused(price_rows, **kw)  # VMEM kernel handles the shape

    monkeypatch.setattr(lp, "lsmc_streamed_backward", recording_streamed)
    arr = jnp.asarray([100.0, 100.0, 1.0, 0.03, 0.01, 0.2], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        u = simulate_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=8, rows=16, cols=128,
            dtype=jnp.float32, option=OptionSide.PUT,
            fused_backward=True, interpret=True,
        )
    assert calls == ["streamed"]
    assert np.all(np.isfinite(np.asarray(u)))


def test_wrapper_fused_backward_falls_back_when_unsupported() -> None:
    """cross_fit (and any unsupported request) silently uses the shared
    backward — bit-for-bit the fused_backward=False output."""
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    arr = jnp.asarray([100.0, 100.0, 1.0, 0.03, 0.01, 0.2], jnp.float32)
    kw = dict(
        timesteps=4, rows=8, cols=128, dtype=jnp.float32,
        option=OptionSide.PUT, cross_fit=True,
    )
    key = jax.random.PRNGKey(5)
    got = simulate_american_underlier_rows_pallas(key, arr, fused_backward=True, **kw)
    want = simulate_american_underlier_rows_pallas(key, arr, fused_backward=False, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# --------------------------------------------------------------------------
# config / checkpoint / trainer wiring (SimulationParams.lsmc_fused_backward)
# --------------------------------------------------------------------------


def test_sim_params_fused_backward_gates_and_roundtrip() -> None:
    """build_simulation_params scope gates (GBM American, flat term, no
    cross-fit) and the proto round trip (absent decodes False; default-False
    encodes byte-identically to pre-round-5 blobs)."""
    from spectralmc_tpu.ops.gbm import build_simulation_params
    from spectralmc_tpu.serialization.converters import (
        sim_params_from_proto,
        sim_params_to_proto,
    )
    from tests.helpers import expect_failure, expect_success

    base = dict(
        timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=7,
        payoff="american_put", normalization="none",
    )
    sim = expect_success(build_simulation_params(**base, lsmc_fused_backward=True))
    back = expect_success(sim_params_from_proto(sim_params_to_proto(sim)))
    assert back == sim and back.lsmc_fused_backward
    plain = expect_success(build_simulation_params(**base))
    assert not expect_success(
        sim_params_from_proto(sim_params_to_proto(plain))
    ).lsmc_fused_backward
    assert (
        sim_params_to_proto(plain).SerializeToString(deterministic=True)
        == sim_params_to_proto(
            expect_success(build_simulation_params(**base, lsmc_fused_backward=False))
        ).SerializeToString(deterministic=True)
    )
    # each scope rejection, one at a time
    err = expect_failure(
        build_simulation_params(
            timesteps=4, network_size=16, batches_per_mc_run=8, mc_seed=7,
            lsmc_fused_backward=True,
        )
    )
    assert "no LSMC backward" in err.reason
    err = expect_failure(
        build_simulation_params(**base, lsmc_fused_backward=True, lsmc_cross_fit=True)
    )
    assert "choose one" in err.reason
    err = expect_failure(
        build_simulation_params(
            **{**base, "model": "heston"}, lsmc_fused_backward=True
        )
    )
    assert "GBM dynamics only" in err.reason
    from spectralmc_tpu.ops.gbm import TermStructure

    err = expect_failure(
        build_simulation_params(
            **base,
            lsmc_fused_backward=True,
            term=TermStructure(vol_shape=(1.0, 1.0, 0.8, 1.2)),
        )
    )
    assert "flat-discount only" in err.reason


def test_resolve_lsmc_backward_mirrors_support(
    monkeypatch: pytest.MonkeyPatch,
) -> None:
    """The trainer-facing resolver: 0 off-request, 0 when the engine or the
    kernel rejects, the version key when everything accepts."""
    from spectralmc_tpu.ops.gbm import build_simulation_params
    from spectralmc_tpu.ops.gbm_pallas import resolve_lsmc_backward
    from tests.helpers import expect_success

    base = dict(
        timesteps=4, network_size=128, batches_per_mc_run=8, mc_seed=7,
        payoff="american_put", normalization="none", implementation="pallas",
    )
    sim = expect_success(build_simulation_params(**base, lsmc_fused_backward=True))
    plain = expect_success(build_simulation_params(**base))
    assert resolve_lsmc_backward(plain, rows=8) == 0  # not requested
    on_tpu = jax.default_backend() == "tpu"
    # requested: on TPU everything accepts; hermetically the backend rejects
    want = LSMC_BACKWARD_VERSIONS["fused"] if on_tpu else 0
    assert resolve_lsmc_backward(sim, rows=8) == want
    # a mesh paths axis always rejects (the moment psum is cross-chip)
    assert resolve_lsmc_backward(sim, rows=8, sharded=True) == 0
    # force the acceptance path so the version key is exercised hermetically
    import spectralmc_tpu.ops.gbm as gbm_mod
    import spectralmc_tpu.ops.lsmc_pallas as lp

    monkeypatch.setattr(
        gbm_mod, "resolve_implementation", lambda s, rows=None: s.implementation
    )
    monkeypatch.setattr(lp, "lsmc_fused_backward_supported", lambda **kw: True)
    assert resolve_lsmc_backward(sim, rows=8) == LSMC_BACKWARD_VERSIONS["fused"]
    # past the VMEM cap the resolver records the STREAMED version — the
    # checkpointed int must name the kernel that actually runs there
    monkeypatch.setattr(lp, "lsmc_fused_backward_supported", lambda **kw: False)
    monkeypatch.setattr(lp, "lsmc_streamed_backward_supported", lambda **kw: True)
    assert (
        resolve_lsmc_backward(sim, rows=8)
        == LSMC_BACKWARD_VERSIONS["fused_streamed"]
    )
    monkeypatch.setattr(lp, "lsmc_streamed_backward_supported", lambda **kw: False)
    assert resolve_lsmc_backward(sim, rows=8) == 0


def test_checkpoint_roundtrips_backward_version() -> None:
    """ModelCheckpointProto carries lsmc_backward_version; absent decodes 0
    and the 0 default does not perturb existing checkpoint bytes."""
    from spectralmc_tpu.serialization.converters import (
        checkpoint_from_proto,
        checkpoint_to_proto,
    )
    from spectralmc_tpu.training.trainer import GbmCVNNPricerConfig
    from tests.helpers import expect_success
    from tests.test_trainer import make_pricer_config

    base = make_pricer_config()
    stamped = GbmCVNNPricerConfig(
        sim=base.sim, bounds=base.bounds, cvnn=base.cvnn,
        lsmc_backward_version=LSMC_BACKWARD_VERSIONS["fused"],
    )
    back = expect_success(checkpoint_from_proto(checkpoint_to_proto(stamped)))
    assert back.lsmc_backward_version == LSMC_BACKWARD_VERSIONS["fused"]
    assert expect_success(
        checkpoint_from_proto(checkpoint_to_proto(base))
    ).lsmc_backward_version == 0


def test_trainer_guards_backward_version() -> None:
    """A mid-stream checkpoint whose recorded backward cannot run here fails
    loudly; allow_engine_fallback accepts and restamps the effective one;
    fresh configs record the effective backward (0 hermetically — the fused
    kernel needs the TPU)."""
    from spectralmc_tpu.core.errors.trainer import EngineMismatch
    from spectralmc_tpu.training.trainer import GbmCVNNPricer, GbmCVNNPricerConfig
    from tests.helpers import expect_failure, expect_success
    from tests.test_trainer import make_pricer_config

    if jax.default_backend() == "tpu":
        pytest.skip("the hermetic half of the guard; TPU resolves to fused")
    base = make_pricer_config(
        payoff="american_put",
        normalization="none",
        implementation="pallas",
        lsmc_fused_backward=True,
    )
    pricer = expect_success(GbmCVNNPricer.create(base))
    assert pricer.snapshot().lsmc_backward_version == 0  # effective, not requested
    mid = GbmCVNNPricerConfig(
        sim=pricer.snapshot().sim, bounds=base.bounds, cvnn=base.cvnn,
        global_step=4, lsmc_backward_version=LSMC_BACKWARD_VERSIONS["fused"],
    )
    err = expect_failure(GbmCVNNPricer.create(mid))
    assert isinstance(err, EngineMismatch) and "backward" in err.requested
    restamped = expect_success(GbmCVNNPricer.create(mid, allow_engine_fallback=True))
    assert restamped.snapshot().lsmc_backward_version == 0
