"""Pallas GBM kernel tests.

The CPU interpreter stubs the hardware PRNG (``prng_random_bits`` returns
zeros), so statistical validation of the kernel runs on real TPU only (the
bench does it; /tmp probes confirmed mean/log-variance match analytic GBM).
Here we verify: structure under ``force_tpu_interpret_mode`` (zero-normals
paths follow pure drift exactly — a sharp analytic check of everything
EXCEPT the RNG), and the dtype/shape fallbacks to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spectralmc_tpu.ops.gbm import PathScheme
from spectralmc_tpu.ops.gbm_pallas import (
    simulate_terminal_pallas,
    simulate_terminal_rows_pallas,
)
from tests.helpers.factories import make_contract

CONTRACT = make_contract(vol=0.25)


def _run_interpret(scheme: PathScheme, timesteps: int = 8, rows: int = 8, cols: int = 128):
    key = jax.random.PRNGKey(1)
    arr = CONTRACT.as_array(jnp.float32)
    # interpret=True (not just force_tpu_interpret_mode) so the engine's
    # supported-gate picks the pallas path off-TPU instead of falling back
    # to XLA.
    with pltpu.force_tpu_interpret_mode():
        return simulate_terminal_rows_pallas(
            key, arr, timesteps=timesteps, rows=rows, cols=cols,
            dtype=jnp.float32, scheme=scheme, interpret=True,
        )


def test_interpret_mode_zero_normals_log_euler_is_pure_drift() -> None:
    """With the interpreter's stubbed (all-zero) RNG, u1 = half-ulp exactly, so
    z = sqrt(-2 ln u1) deterministically; every path follows the same drift.
    We verify shape, finiteness, and that all paths are identical — the
    deterministic skeleton of the kernel is correct."""
    rows = _run_interpret(PathScheme.LOG_EULER)
    assert rows.shape == (8, 128)
    t = np.asarray(rows)
    assert np.all(np.isfinite(t))
    assert np.all(t > 0)
    assert np.allclose(t, t[0, 0])  # zero-bit RNG -> identical paths
    # exact value under the pair-step scheme: zero bits give u1 = 2^-25,
    # u2 = 0, so each of the 4 pairs adds 2*drift + vol*sqrt(dt)*r with
    # r = sqrt(-2 ln 2^-25) (cos(0)=1, sin(0)=0).
    c = CONTRACT
    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = c.maturity / 8
    drift = (c.rate - c.div_yield - 0.5 * c.vol**2) * dt
    expected = c.spot * np.exp(8 * drift + 4 * c.vol * np.sqrt(dt) * r)
    np.testing.assert_allclose(t[0, 0], expected, rtol=1e-4)


def test_interpret_mode_euler_reflection_positive() -> None:
    rows = _run_interpret(PathScheme.EULER)
    assert np.all(np.asarray(rows) > 0)  # reflection keeps paths positive


def test_flat_api_shape() -> None:
    key = jax.random.PRNGKey(1)
    arr = CONTRACT.as_array(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        flat = simulate_terminal_pallas(
            key, arr, timesteps=2, batches=8, network_size=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
        )
    assert flat.shape == (8 * 128,)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(dtype=jnp.float64, rows=8, cols=128),  # fp64 -> XLA fallback
        dict(dtype=jnp.float32, rows=7, cols=100),  # misaligned -> XLA fallback
    ],
)
def test_fallback_to_xla(kwargs) -> None:
    """Unsupported dtype/shape must silently use the canonical XLA path."""
    from spectralmc_tpu.ops.gbm import simulate_terminal_rows

    key = jax.random.PRNGKey(5)
    arr = CONTRACT.as_array(kwargs["dtype"])
    got = simulate_terminal_rows_pallas(
        key, arr, timesteps=2, rows=kwargs["rows"], cols=kwargs["cols"],
        dtype=kwargs["dtype"], scheme=PathScheme.LOG_EULER,
    )
    want = simulate_terminal_rows(
        key, arr, timesteps=2, rows=kwargs["rows"], cols=kwargs["cols"],
        dtype=kwargs["dtype"], scheme=PathScheme.LOG_EULER,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_row_offset_falls_back_and_passes_through() -> None:
    """Off-TPU, row_offset routes to the XLA path and must reproduce the
    exact global rows (the sharding contract, SURVEY §2.9 DP design)."""
    from spectralmc_tpu.ops.gbm import simulate_terminal_rows

    key = jax.random.PRNGKey(3)
    arr = CONTRACT.as_array(jnp.float32)
    kw = dict(timesteps=4, cols=128, dtype=jnp.float32, scheme=PathScheme.LOG_EULER)
    full = np.asarray(
        simulate_terminal_rows(key, arr, rows=16, **kw)
    )
    hi = np.asarray(
        simulate_terminal_rows_pallas(key, arr, rows=8, row_offset=8, **kw)
    )
    assert np.array_equal(hi, full[8:])


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Mosaic bit behavior needs real TPU"
)
def test_bm_radius_rsqrt_bit_identity_exhaustive_on_device() -> None:
    """Exhaustive sqrt(x) vs x*rsqrt(x) over the full Box-Muller radius domain
    INSIDE a Pallas kernel (the arithmetic the GBM/Heston kernels execute).

    The v2 streams use ``x * rsqrt(x)``; this check documents whether the
    current Mosaic backend evaluates it bit-identically to ``jnp.sqrt`` on
    every one of the 2^24 possible u1 inputs. The stream version is bumped
    regardless (the identity is backend-dependent — it fails on CPU), so a
    mismatch here is INFORMATION, not a failure of the determinism contract;
    the assert pins the backend this kernel build was verified on.
    """
    from functools import partial

    from jax.experimental import pallas as pl

    n = 1 << 24
    block = 1 << 17  # 128k lanes per grid step

    def kernel(u_ref, out_ref):
        u1 = u_ref[...]
        x = jnp.float32(-2.0) * jnp.log(u1)
        a = jnp.sqrt(x)
        b = x * jax.lax.rsqrt(jnp.maximum(x, jnp.float32(1e-30)))
        out_ref[...] = (
            pltpu.bitcast(a, jnp.int32) != pltpu.bitcast(b, jnp.int32)
        ).astype(jnp.int32)

    run = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((1, block), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, block), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // block, block), jnp.int32),
    )

    # u1 = k * 2^-24 + 2^-25 for k in [0, 2^24): the exact generator outputs
    k = jnp.arange(n, dtype=jnp.uint32).reshape(n // block, block)
    u1 = k.astype(jnp.float32) * jnp.float32(2.0**-24) + jnp.float32(2.0**-25)
    mismatches = int(jnp.sum(run(u1)))
    assert mismatches == 0, (
        f"{mismatches} one-ulp sqrt/rsqrt mismatches on this backend — the "
        "v2 Pallas stream differs from the build this kernel was verified "
        "on; bump PALLAS_STREAM_VERSIONS before shipping kernels from here"
    )


def test_terminal_pathwise_vjp_matches_autodiff() -> None:
    """The analytic pathwise rule (the Pallas kernel's backward pass) must
    equal jax.grad of the XLA log-Euler simulator — same math, so the rule
    is verified off-TPU by differentiating the transparent engine."""
    from spectralmc_tpu.ops.gbm import simulate_terminal_rows
    from spectralmc_tpu.ops.gbm_pallas import terminal_pathwise_vjp

    key = jax.random.PRNGKey(9)
    arr = CONTRACT.as_array(jnp.float64)
    kw = dict(timesteps=6, rows=16, cols=64, dtype=jnp.float64,
              scheme=PathScheme.LOG_EULER)
    # an arbitrary smooth reduction with non-uniform cotangents
    w = jnp.linspace(0.5, 2.0, 16 * 64).reshape(16, 64).astype(jnp.float64)

    def loss(c):
        return jnp.sum(w * simulate_terminal_rows(key, c, **kw))

    want = np.asarray(jax.grad(loss)(arr))
    s_t = simulate_terminal_rows(key, arr, **kw)
    got = np.asarray(terminal_pathwise_vjp(w, s_t, arr))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_terminal_pathwise_vjp_matches_autodiff_antithetic_f32() -> None:
    from spectralmc_tpu.ops.gbm import simulate_terminal_rows
    from spectralmc_tpu.ops.gbm_pallas import terminal_pathwise_vjp

    key = jax.random.PRNGKey(4)
    arr = CONTRACT.as_array(jnp.float32)
    kw = dict(timesteps=4, rows=8, cols=128, dtype=jnp.float32,
              scheme=PathScheme.LOG_EULER, antithetic_half=4)
    w = jnp.ones((8, 128), jnp.float32) / (8 * 128)

    def loss(c):
        return jnp.sum(w * simulate_terminal_rows(key, c, **kw))

    want = np.asarray(jax.grad(loss)(arr))
    s_t = simulate_terminal_rows(key, arr, **kw)
    got = np.asarray(terminal_pathwise_vjp(w, s_t, arr))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_pallas_diff_wrapper_falls_back_and_differentiates() -> None:
    """Off-TPU the diff wrapper routes to the XLA engine and grads flow."""
    from spectralmc_tpu.ops.gbm_pallas import simulate_terminal_rows_pallas_diff

    key = jax.random.PRNGKey(2)
    arr = CONTRACT.as_array(jnp.float32)

    def mean_terminal(c):
        return jnp.mean(
            simulate_terminal_rows_pallas_diff(
                key, c, timesteps=4, rows=8, cols=128, dtype=jnp.float32
            )
        )

    g = np.asarray(jax.grad(mean_terminal)(arr))
    assert np.isfinite(g).all()
    assert g[0] > 0.0  # d E[S_T] / d S0 = e^{(r-q)T} > 0
    assert g[1] == 0.0  # strike never enters the simulator


def test_greeks_engine_selection() -> None:
    from spectralmc_tpu.ops.gbm import PayoffKind, SimImplementation
    from spectralmc_tpu.ops.greeks import greeks_engine
    from tests.helpers.factories import make_simulation_params

    xla = make_simulation_params(timesteps=4, network_size=128, batches_per_mc_run=8)
    assert greeks_engine(xla) == SimImplementation.XLA
    pal = make_simulation_params(
        timesteps=4, network_size=128, batches_per_mc_run=8,
        implementation=SimImplementation.PALLAS,
    )
    # off-TPU pallas_supported is False -> XLA; on TPU this resolves PALLAS
    expected = (
        SimImplementation.PALLAS
        if jax.default_backend() == "tpu"
        else SimImplementation.XLA
    )
    assert greeks_engine(pal) == expected
    asian = make_simulation_params(
        timesteps=4, network_size=128, batches_per_mc_run=8,
        implementation=SimImplementation.PALLAS, payoff=PayoffKind.ASIAN_GEOMETRIC,
    )
    assert greeks_engine(asian) == SimImplementation.XLA


# --------------------------------------------------------------------------
# Round 3: basket kernel (structure under the interpreter + fallbacks)
# --------------------------------------------------------------------------

def _basket_spec():
    from spectralmc_tpu.ops.basket import BasketCombine, build_basket_spec

    return build_basket_spec(
        weights=(0.5, 0.3, 0.2),
        correlation=((1.0, 0.4, 0.2), (0.4, 1.0, 0.3), (0.2, 0.3, 1.0)),
        combine=BasketCombine.ARITHMETIC,
    ).expect("spec")


def test_basket_interpret_zero_normals_matches_closed_form() -> None:
    """Stubbed (all-zero) RNG: u1 = half-ulp, u2 = 0, so every draw yields
    (r, 0) with r = sqrt(-2 ln 2^-25); the mixed normal for asset a is
    r * sum of chol[a][b] over EVEN b <= a. The terminal basket value is then
    a deterministic closed form — a sharp check of the whole kernel skeleton
    (drift, mixing, combine) except the RNG distribution itself."""
    from spectralmc_tpu.ops.basket import basket_cholesky
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.gbm_pallas import simulate_basket_underlier_rows_pallas

    spec = _basket_spec()
    key = jax.random.PRNGKey(1)
    c = CONTRACT
    arr = c.as_array(jnp.float32)
    T_STEPS, ROWS, COLS = 6, 8, 128
    with pltpu.force_tpu_interpret_mode():
        rows = simulate_basket_underlier_rows_pallas(
            key, arr, spec=spec, timesteps=T_STEPS, rows=ROWS, cols=COLS,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL, interpret=True,
        )
    t = np.asarray(rows)
    assert t.shape == (ROWS, COLS)
    assert np.all(np.isfinite(t)) and np.all(t > 0)
    assert np.allclose(t, t[0, 0], rtol=1e-5)  # zero-bit RNG -> identical paths

    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    chol = basket_cholesky(spec)
    dt = c.maturity / T_STEPS
    value = 0.0
    for a in range(3):
        sig = c.vol * spec.vol_multipliers[a]
        zm = r * sum(chol[a][b] for b in range(a + 1) if b % 2 == 0)
        logx = (
            np.log(c.spot * spec.spot_multipliers[a])
            + T_STEPS * (c.rate - c.div_yield - 0.5 * sig * sig) * dt
            + T_STEPS * sig * np.sqrt(dt) * zm
        )
        value += spec.weights[a] * np.exp(logx)
    assert t[0, 0] == pytest.approx(value, rel=1e-4)


def test_basket_pallas_fallback_matches_xla() -> None:
    """Off-TPU/odd shapes the basket kernel must route to the XLA path."""
    from spectralmc_tpu.ops.basket import simulate_basket_underlier_rows
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.gbm_pallas import simulate_basket_underlier_rows_pallas

    spec = _basket_spec()
    key = jax.random.PRNGKey(5)
    arr = CONTRACT.as_array(jnp.float32)
    kw = dict(spec=spec, timesteps=2, rows=7, cols=100, dtype=jnp.float32,
              payoff=PayoffKind.ASIAN_ARITHMETIC)
    got = simulate_basket_underlier_rows_pallas(key, arr, **kw)
    want = simulate_basket_underlier_rows(key, arr, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_basket_pallas_resolves_and_dispatches() -> None:
    """resolve_implementation no longer short-circuits baskets to XLA; the
    dispatch seam selects the pallas function for PALLAS sims (which itself
    falls back off-TPU), and the stream-version table covers the family."""
    from spectralmc_tpu.ops.dispatch import make_underlier_simulator
    from spectralmc_tpu.ops.gbm import (
        ModelKind,
        SimImplementation,
        build_simulation_params,
        resolve_implementation,
    )
    from spectralmc_tpu.ops.gbm_pallas import pallas_stream_version

    spec = _basket_spec()
    sim = build_simulation_params(
        timesteps=2, network_size=128, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.BASKET_GBM, basket=spec,
        implementation=SimImplementation.PALLAS,
    ).expect("sim")
    expected = (
        SimImplementation.PALLAS
        if jax.default_backend() == "tpu"
        else SimImplementation.XLA
    )
    assert resolve_implementation(sim) == expected
    simulate = make_underlier_simulator(sim, rows=8)
    out = simulate(jax.random.PRNGKey(0), CONTRACT.as_array(jnp.float32))
    assert out.shape == (8, 128) and bool(jnp.isfinite(out).all())
    assert pallas_stream_version(ModelKind.BASKET_GBM) >= 1


# --------------------------------------------------------------------------
# Round 3: Merton kernel (in-register Poisson + structure + fallbacks)
# --------------------------------------------------------------------------


def _heston_contract():
    from spectralmc_tpu.ops.heston import HestonContract

    return HestonContract(
        spot=100.0, strike=100.0, maturity=1.0, rate=0.03, div_yield=0.01,
        v0=0.06, kappa=1.5, theta=0.05, xi=0.4, rho=-0.6,
    )


def _merton_contract():
    from spectralmc_tpu.ops.merton import MertonContract

    return MertonContract(
        spot=100.0, strike=100.0, maturity=1.0, rate=0.03, div_yield=0.01,
        vol=0.2, lam=0.5, jump_mean=-0.1, jump_std=0.25,
    )


@pytest.mark.parametrize("mu", [0.03, 0.5, 3.0])
def test_poisson_counts_exact_inverse_cdf(mu: float) -> None:
    """_poisson_counts is plain jax (runs anywhere): feed the EXACT uniform
    grid the 24-bit generator can emit and compare against the float64
    inverse CDF. The float32 scalar cdf recursion may disagree only where a
    uniform lands within one ulp of a cdf boundary — vanishingly rare and
    off by at most 1 count."""
    from spectralmc_tpu.ops.gbm_pallas import _poisson_counts

    n = 1 << 16
    k = np.arange(n, dtype=np.float64) / n
    u = jnp.asarray(k, jnp.float32)
    got = np.asarray(_poisson_counts(u, jnp.float32(mu)))
    # float64 reference inverse CDF
    pmf = [np.exp(-mu)]
    while sum(pmf) < 1.0 - 1e-12:
        pmf.append(pmf[-1] * mu / len(pmf))
    cdf = np.cumsum(pmf)
    want = np.searchsorted(cdf, k, side="right").astype(np.float64)
    mismatch = got != want
    assert mismatch.mean() < 1e-3, f"mu={mu}: {mismatch.mean():.2e} mismatch"
    assert np.abs(got[mismatch] - want[mismatch]).max(initial=0.0) <= 1.0
    # structural exactness at the ends
    assert got[k < np.exp(-mu) - 1e-6].max(initial=0.0) == 0.0
    assert float(_poisson_counts(jnp.zeros((4,), jnp.float32), jnp.float32(0.0)).max()) == 0.0


def test_merton_interpret_zero_bits_matches_closed_form() -> None:
    """Stubbed (all-zero) RNG: u1 = half-ulp -> radius r, u2 = 0 ->
    (sin, cos) = (0, 1) so z_d = r and z_j = 0; the count uniform is 0 <
    e^{-lam dt} so every count is 0 and the jump term vanishes. The terminal
    value is then the deterministic drift+diffusion closed form INCLUDING
    the -lam*m compensator — a sharp check of the whole kernel skeleton
    except the RNG distribution."""
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.gbm_pallas import simulate_merton_underlier_rows_pallas

    c = _merton_contract()
    arr = c.as_array(jnp.float32)
    T_STEPS, ROWS, COLS = 6, 8, 128
    with pltpu.force_tpu_interpret_mode():
        rows = simulate_merton_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T_STEPS, rows=ROWS, cols=COLS,
            dtype=jnp.float32, payoff=PayoffKind.TERMINAL, interpret=True,
        )
    t = np.asarray(rows)
    assert t.shape == (ROWS, COLS)
    assert np.all(np.isfinite(t)) and np.allclose(t, t[0, 0], rtol=1e-5)
    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = c.maturity / T_STEPS
    m = np.exp(c.jump_mean + 0.5 * c.jump_std**2) - 1.0
    drift = (c.rate - c.div_yield - c.lam * m - 0.5 * c.vol**2) * dt
    want = c.spot * np.exp(T_STEPS * (drift + c.vol * np.sqrt(dt) * r))
    assert t[0, 0] == pytest.approx(want, rel=1e-4)


def test_merton_pallas_fallback_matches_xla() -> None:
    """Off-TPU/odd shapes the merton kernel must route to the XLA path."""
    from spectralmc_tpu.ops.gbm import PayoffKind
    from spectralmc_tpu.ops.gbm_pallas import simulate_merton_underlier_rows_pallas
    from spectralmc_tpu.ops.merton import simulate_merton_underlier_rows

    arr = _merton_contract().as_array(jnp.float32)
    key = jax.random.PRNGKey(5)
    kw = dict(timesteps=2, rows=7, cols=100, dtype=jnp.float32,
              payoff=PayoffKind.ASIAN_ARITHMETIC)
    got = simulate_merton_underlier_rows_pallas(key, arr, **kw)
    want = simulate_merton_underlier_rows(key, arr, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merton_pallas_resolves_and_dispatches() -> None:
    """resolve_implementation no longer short-circuits merton to XLA; the
    dispatch seam selects the pallas function for PALLAS sims (which itself
    falls back off-TPU), and the stream-version table covers the family."""
    from spectralmc_tpu.ops.dispatch import make_underlier_simulator
    from spectralmc_tpu.ops.gbm import (
        ModelKind,
        SimImplementation,
        build_simulation_params,
        resolve_implementation,
    )
    from spectralmc_tpu.ops.gbm_pallas import pallas_stream_version

    sim = build_simulation_params(
        timesteps=2, network_size=128, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.MERTON_JUMP, implementation=SimImplementation.PALLAS,
    ).expect("sim")
    expected = (
        SimImplementation.PALLAS
        if jax.default_backend() == "tpu"
        else SimImplementation.XLA
    )
    assert resolve_implementation(sim) == expected
    simulate = make_underlier_simulator(sim, rows=8)
    out = simulate(jax.random.PRNGKey(0), _merton_contract().as_array(jnp.float32))
    assert out.shape == (8, 128) and bool(jnp.isfinite(out).all())
    assert pallas_stream_version(ModelKind.MERTON_JUMP) >= 1

# --------------------------------------------------------------------------
# Round 3: American monitor-row kernel (deterministic DP + fallbacks)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "timesteps,every,side",
    [(8, 1, "call"), (8, 2, "call"), (6, 3, "call"), (8, 1, "put")],
)
def test_american_interpret_zero_bits_matches_deterministic_dp(
    timesteps: int, every: int, side: str
) -> None:
    """Stubbed (all-zero) RNG makes every path the SAME deterministic path
    (z = r per draw, r = sqrt(-2 ln 2^-25)), so the LSMC regression's
    continuation fit is exact (up to the relative ridge) and the Bermudan
    value reduces to the deterministic dynamic program
    v_d = max-if-ITM(payoff(S_d), disc * v_{d+1}) — a sharp host-replayable
    check of the monitor emission, segment pair-stepping, backward induction
    and the strike - cf/df encode, everything except the RNG distribution.
    The upward drift makes the put OTM everywhere (cf = 0, u = strike) —
    the ITM-masking edge."""
    from spectralmc_tpu.ops.gbm_pallas import simulate_american_underlier_rows_pallas
    from spectralmc_tpu.ops.greeks import OptionSide

    c = CONTRACT
    arr = c.as_array(jnp.float32)
    option = OptionSide.CALL if side == "call" else OptionSide.PUT
    with pltpu.force_tpu_interpret_mode():
        u = simulate_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=timesteps, rows=8, cols=128,
            dtype=jnp.float32, option=option, exercise_every=every,
            interpret=True,
        )
    u = np.asarray(u)
    assert u.shape == (8, 128)
    assert np.all(np.isfinite(u)) and np.allclose(u, u[0, 0], rtol=1e-5)

    # host replay: per-segment increment = every*drift + n_draws*vol*sqrt(dt)*r
    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = c.maturity / timesteps
    drift = (c.rate - c.div_yield - 0.5 * c.vol**2) * dt
    n_draws = every // 2 + every % 2
    seg = every * drift + n_draws * c.vol * np.sqrt(dt) * r
    n_mon = timesteps // every
    s = c.spot * np.exp(seg * np.arange(1, n_mon + 1))
    disc = np.exp(-c.rate * dt * every)

    def payoff(x: float) -> float:
        return max(x - c.strike, 0.0) if side == "call" else max(c.strike - x, 0.0)

    v = payoff(s[-1])
    for d in range(n_mon - 2, -1, -1):
        ex = payoff(s[d])
        v = ex if (ex > 0.0 and ex > disc * v) else disc * v
    expected = c.strike - (disc * v) / np.exp(-c.rate * c.maturity)
    assert u[0, 0] == pytest.approx(expected, rel=1e-4)


def test_american_pallas_fallback_matches_xla() -> None:
    """Off-TPU (and odd shapes) the wrapper must route to the XLA LSMC path
    bit-for-bit, including the axis-less regression and antithetic halves."""
    from spectralmc_tpu.ops.american import simulate_american_underlier_rows
    from spectralmc_tpu.ops.gbm_pallas import simulate_american_underlier_rows_pallas
    from spectralmc_tpu.ops.greeks import OptionSide

    arr = CONTRACT.as_array(jnp.float32)
    key = jax.random.PRNGKey(5)
    kw = dict(
        timesteps=4, rows=8, cols=128, dtype=jnp.float32,
        option=OptionSide.PUT, exercise_every=2, antithetic_half=4,
    )
    got = simulate_american_underlier_rows_pallas(key, arr, **kw)
    want = simulate_american_underlier_rows(key, arr, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_american_pallas_resolves_and_dispatches() -> None:
    """resolve_implementation no longer short-circuits GBM-American to XLA;
    the dispatch seam selects the pallas wrapper for PALLAS sims (which
    itself falls back off-TPU); non-GBM dynamics still resolve to XLA; and
    the American stream is versioned under its own key."""
    from spectralmc_tpu.ops.dispatch import make_underlier_simulator
    from spectralmc_tpu.ops.gbm import (
        ModelKind,
        PayoffKind,
        SimImplementation,
        build_simulation_params,
        resolve_implementation,
    )
    from spectralmc_tpu.ops.gbm_pallas import pallas_stream_version

    sim = build_simulation_params(
        timesteps=4, network_size=128, batches_per_mc_run=8, mc_seed=1,
        payoff=PayoffKind.AMERICAN_PUT, normalization="none",
        implementation=SimImplementation.PALLAS,
    ).expect("sim")
    expected = (
        SimImplementation.PALLAS
        if jax.default_backend() == "tpu"
        else SimImplementation.XLA
    )
    assert resolve_implementation(sim) == expected
    simulate = make_underlier_simulator(sim, rows=8)
    out = simulate(jax.random.PRNGKey(0), CONTRACT.as_array(jnp.float32))
    assert out.shape == (8, 128) and bool(jnp.isfinite(out).all())
    # separate stream key: an American rebuild never invalidates European
    # checkpoints and vice versa
    assert pallas_stream_version(ModelKind.GBM, PayoffKind.AMERICAN_PUT) >= 1
    assert pallas_stream_version(ModelKind.GBM) >= 1
    # Heston-American rides its own monitor kernel (two emitted state
    # row-sets) — same backend-dependent resolution as GBM
    heston_sim = build_simulation_params(
        timesteps=4, network_size=128, batches_per_mc_run=8, mc_seed=1,
        model=ModelKind.HESTON, payoff=PayoffKind.AMERICAN_PUT,
        normalization="none", implementation=SimImplementation.PALLAS,
    ).expect("heston sim")
    assert resolve_implementation(heston_sim) == expected


def test_american_monitor_block_vmem_budget() -> None:
    """The out-block VMEM fit drives block-row selection; the support
    predicate rejects grids the kernel cannot honor."""
    from spectralmc_tpu.ops.gbm_pallas import (
        _monitor_block_rows,
        pallas_american_supported,
    )

    # budget is 4 MiB: the out block is double-buffered across grid steps,
    # so 2x budget + state/RNG must fit the 16 MiB scoped-VMEM limit
    assert _monitor_block_rows(4096, 256, 16) == 256  # exactly 4 MiB fits
    assert _monitor_block_rows(4096, 256, 64) == 64  # NOT 128 (8 MiB block
    # double-buffered blew the scoped limit on-chip — round 4 regression)
    assert _monitor_block_rows(4096, 256, 128) == 32  # shrinks further
    assert _monitor_block_rows(8, 128, 16) == 8  # small rows cap the block
    kw = dict(dtype=jnp.float32, rows=4096, cols=256)
    assert not pallas_american_supported(timesteps=9, exercise_every=2, **kw)
    assert not pallas_american_supported(timesteps=4, exercise_every=4, **kw)
    assert not pallas_american_supported(timesteps=512, exercise_every=1, **kw)


# --------------------------------------------------------------------------
# Round 3: Heston/Merton/basket American monitor-row kernels
# --------------------------------------------------------------------------


def _deterministic_bermudan(s_path, strike, rate, dt_monitor, maturity, side):
    """Host Bellman DP over a deterministic monitor-date price path —
    exactly what the LSMC reduces to when every path is identical (the
    zero-bit interpreter stream). Returns the strike − cf/df encode."""
    disc = np.exp(-rate * dt_monitor)

    def payoff(x):
        return max(x - strike, 0.0) if side == "call" else max(strike - x, 0.0)

    v = payoff(s_path[-1])
    for d in range(len(s_path) - 2, -1, -1):
        ex = payoff(s_path[d])
        v = ex if (ex > 0.0 and ex > disc * v) else disc * v
    return strike - (disc * v) / np.exp(-rate * maturity)


def test_heston_american_interpret_zero_bits_matches_dp() -> None:
    """Zero-bit RNG: z_v = r (cos(0)=1), orthogonal part 0 — the Heston
    recursion is deterministic and host-replayable including the variance
    path; the variance-augmented regression on identical paths still
    reduces to the Bellman DP."""
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_heston_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    c = _heston_contract()
    arr = c.as_array(jnp.float32)
    T_STEPS = 6
    with pltpu.force_tpu_interpret_mode():
        u = simulate_heston_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T_STEPS, rows=8, cols=128,
            dtype=jnp.float32, option=OptionSide.CALL, interpret=True,
        )
    u = np.asarray(u)
    assert u.shape == (8, 128)
    assert np.all(np.isfinite(u)) and np.allclose(u, u[0, 0], rtol=1e-5)

    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = c.maturity / T_STEPS
    logx, v = np.log(c.spot), c.v0
    s_path = []
    for _ in range(T_STEPS):
        v_plus = max(v, 0.0)
        sv = np.sqrt(v_plus * dt)
        logx += (c.rate - c.div_yield) * dt - 0.5 * v_plus * dt + sv * c.rho * r
        v += c.kappa * c.theta * dt - c.kappa * dt * v_plus + c.xi * sv * r
        s_path.append(np.exp(logx))
    expected = _deterministic_bermudan(s_path, c.strike, c.rate, dt, c.maturity, "call")
    assert u[0, 0] == pytest.approx(expected, rel=1e-3)


def test_merton_american_interpret_zero_bits_matches_dp() -> None:
    """Zero-bit RNG: diffusion normal r, jump normal 0, count uniform 0 <
    e^{-lam dt} so counts are 0 — the jump term vanishes and the path is the
    compensated drift+diffusion closed form."""
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_merton_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    c = _merton_contract()
    arr = c.as_array(jnp.float32)
    T_STEPS = 6
    with pltpu.force_tpu_interpret_mode():
        u = simulate_merton_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T_STEPS, rows=8, cols=128,
            dtype=jnp.float32, option=OptionSide.CALL, exercise_every=2,
            interpret=True,
        )
    u = np.asarray(u)
    assert np.all(np.isfinite(u)) and np.allclose(u, u[0, 0], rtol=1e-5)

    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    dt = c.maturity / T_STEPS
    m = np.exp(c.jump_mean + 0.5 * c.jump_std**2) - 1.0
    inc = (c.rate - c.div_yield - c.lam * m - 0.5 * c.vol**2) * dt + c.vol * np.sqrt(dt) * r
    s_path = [c.spot * np.exp(inc * t) for t in (2, 4, 6)]  # monitor dates
    expected = _deterministic_bermudan(
        s_path, c.strike, c.rate, 2 * dt, c.maturity, "call"
    )
    assert u[0, 0] == pytest.approx(expected, rel=1e-3)


@pytest.mark.parametrize("combine", ["arithmetic", "geometric"])
def test_basket_american_interpret_zero_bits_matches_dp(combine: str) -> None:
    """Zero-bit RNG: asset a's mixed normal is r * (sum of its even-index
    Cholesky row entries) — sin components are 0 — so every asset path and
    the combined basket are deterministic; the dispersion-augmented
    regression reduces to the Bellman DP on the basket value."""
    from spectralmc_tpu.ops.basket import (
        BasketCombine,
        basket_cholesky,
        build_basket_spec,
    )
    from spectralmc_tpu.ops.gbm_pallas import (
        simulate_basket_american_underlier_rows_pallas,
    )
    from spectralmc_tpu.ops.greeks import OptionSide

    spec = build_basket_spec(
        weights=(0.5, 0.3, 0.2),
        correlation=((1.0, 0.4, 0.2), (0.4, 1.0, 0.3), (0.2, 0.3, 1.0)),
        combine=(
            BasketCombine.ARITHMETIC if combine == "arithmetic"
            else BasketCombine.GEOMETRIC
        ),
    ).expect("spec")
    c = CONTRACT
    arr = c.as_array(jnp.float32)
    T_STEPS = 6
    with pltpu.force_tpu_interpret_mode():
        u = simulate_basket_american_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, spec=spec, timesteps=T_STEPS, rows=8,
            cols=128, dtype=jnp.float32, option=OptionSide.CALL, interpret=True,
        )
    u = np.asarray(u)
    assert np.all(np.isfinite(u)) and np.allclose(u, u[0, 0], rtol=1e-5)

    r = np.sqrt(-2.0 * np.log(np.float32(2.0**-25)))
    chol = basket_cholesky(spec)
    dt = c.maturity / T_STEPS
    logx = [np.log(c.spot * spec.spot_multipliers[a]) for a in range(3)]
    s_path = []
    for _ in range(T_STEPS):
        for a in range(3):
            sig = c.vol * spec.vol_multipliers[a]
            zm = r * sum(chol[a][b] for b in range(a + 1) if b % 2 == 0)
            logx[a] += (c.rate - c.div_yield - 0.5 * sig * sig) * dt + sig * np.sqrt(dt) * zm
        if combine == "geometric":
            s_path.append(np.exp(sum(spec.weights[a] * logx[a] for a in range(3))))
        else:
            s_path.append(sum(spec.weights[a] * np.exp(logx[a]) for a in range(3)))
    expected = _deterministic_bermudan(s_path, c.strike, c.rate, dt, c.maturity, "call")
    assert u[0, 0] == pytest.approx(expected, rel=1e-3)


@pytest.mark.parametrize("family", ["heston", "merton", "basket"])
def test_family_american_pallas_fallback_matches_xla(family: str) -> None:
    """Off-TPU every family-American wrapper must route to its XLA LSMC
    path bit-for-bit (antithetic + sparse monitor grid included)."""
    from spectralmc_tpu.ops import american as am
    from spectralmc_tpu.ops import gbm_pallas as gp
    from spectralmc_tpu.ops.greeks import OptionSide

    key = jax.random.PRNGKey(5)
    kw = dict(
        timesteps=4, rows=8, cols=128, dtype=jnp.float32,
        option=OptionSide.PUT, exercise_every=2, antithetic_half=4,
    )
    if family == "heston":
        arr = _heston_contract().as_array(jnp.float32)
        got = gp.simulate_heston_american_underlier_rows_pallas(key, arr, **kw)
        want = am.simulate_heston_american_underlier_rows(key, arr, **kw)
    elif family == "merton":
        arr = _merton_contract().as_array(jnp.float32)
        got = gp.simulate_merton_american_underlier_rows_pallas(key, arr, **kw)
        want = am.simulate_merton_american_underlier_rows(key, arr, **kw)
    else:
        spec = _basket_spec()
        arr = CONTRACT.as_array(jnp.float32)
        got = gp.simulate_basket_american_underlier_rows_pallas(
            key, arr, spec=spec, **kw
        )
        want = am.simulate_basket_american_underlier_rows(key, arr, spec=spec, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_family_american_dispatch_selects_pallas_wrappers() -> None:
    """The dispatch seam routes PALLAS American sims of every dynamics
    through the monitor-row wrappers (which fall back off-TPU), and each
    family's American stream has its own version key."""
    from spectralmc_tpu.ops.dispatch import make_underlier_simulator
    from spectralmc_tpu.ops.gbm import (
        ModelKind,
        PayoffKind,
        SimImplementation,
        build_simulation_params,
    )
    from spectralmc_tpu.ops.gbm_pallas import pallas_stream_version

    for model, extra in (
        (ModelKind.HESTON, {}),
        (ModelKind.MERTON_JUMP, {}),
        (ModelKind.BASKET_GBM, {"basket": _basket_spec()}),
    ):
        sim = build_simulation_params(
            timesteps=4, network_size=128, batches_per_mc_run=8, mc_seed=1,
            model=model, payoff=PayoffKind.AMERICAN_PUT, normalization="none",
            implementation=SimImplementation.PALLAS, **extra,
        ).expect("sim")
        simulate = make_underlier_simulator(sim, rows=8)
        if model == ModelKind.HESTON:
            arr = _heston_contract().as_array(jnp.float32)
        elif model == ModelKind.MERTON_JUMP:
            arr = _merton_contract().as_array(jnp.float32)
        else:
            arr = CONTRACT.as_array(jnp.float32)
        out = simulate(jax.random.PRNGKey(0), arr)
        assert out.shape == (8, 128) and bool(jnp.isfinite(out).all()), model
        assert pallas_stream_version(model, PayoffKind.AMERICAN_PUT) >= 1


# --------------------------------------------------------------------------
# Round 3: term-structure kernel (stream gbm_term v1)
# --------------------------------------------------------------------------


from spectralmc_tpu.ops.gbm import PayoffKind  # noqa: E402


def _term_curved():
    from spectralmc_tpu.ops.gbm import TermStructure

    T = 8
    return TermStructure(
        vol_shape=tuple(1.5 - 1.0 * i / T for i in range(T)),
        rate_shape=tuple(0.5 + 1.0 * i / T for i in range(T)),
    )


def test_term_interpret_zero_bits_matches_phase_identity() -> None:
    """Zero-bit RNG makes the term kernel a deterministic recursion we can
    replay host-side with the MODULE'S OWN scalar helpers: each pair adds
    (d_a + d_b) + r0 * R_p * sin_turns(phi_p) — a sharp gate on the SMEM
    table plumbing and the phase-shift pair identity, independent of the
    RNG distribution."""
    from spectralmc_tpu.ops.gbm_pallas import (
        _bm_radius,
        _sin_turns,
        _term_coeff_tables,
        simulate_underlier_rows_pallas,
    )

    term = _term_curved()
    arr = CONTRACT.as_array(jnp.float32)
    T = 8
    with pltpu.force_tpu_interpret_mode():
        rows = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.TERMINAL, term=term, interpret=True,
        )
    t = np.asarray(rows)
    assert t.shape == (8, 128) and np.all(np.isfinite(t)) and np.all(t > 0)
    assert np.allclose(t, t[0, 0])  # zero-bit RNG -> identical paths
    step, pair = _term_coeff_tables(arr, term.shapes(T), T)
    r0 = float(_bm_radius(jnp.float32(2.0**-25)))
    logx = float(jnp.log(arr[0]))
    for p in range(T // 2):
        logx += float(step[2 * p, 0] + step[2 * p + 1, 0])
        logx += r0 * float(pair[p, 0]) * float(_sin_turns(pair[p, 1]))
    np.testing.assert_allclose(t[0, 0], np.exp(np.float32(logx)), rtol=1e-5)


def test_term_interpret_zero_bits_asian_and_barrier() -> None:
    """Per-step branches: the Asian accumulator and the barrier running
    extreme consume step_ref[t] singles — replay the deterministic skeleton
    host-side."""
    from spectralmc_tpu.ops.gbm_pallas import (
        _bm_radius,
        _sin_turns,
        _term_coeff_tables,
        simulate_underlier_rows_pallas,
    )

    term = _term_curved()
    arr = CONTRACT.as_array(jnp.float32)
    T = 8
    step, _ = _term_coeff_tables(arr, term.shapes(T), T)
    r0 = float(_bm_radius(jnp.float32(2.0**-25)))
    z0 = r0 * float(_sin_turns(jnp.float32(0.25)))
    logs = []
    logx = float(jnp.log(arr[0]))
    for t_i in range(T):
        logx += float(step[t_i, 0]) + float(step[t_i, 1]) * z0
        logs.append(logx)
    with pltpu.force_tpu_interpret_mode():
        asian = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.ASIAN_GEOMETRIC, term=term, interpret=True,
        )
    want_geo = np.exp(np.mean(np.asarray(logs, dtype=np.float64)))
    np.testing.assert_allclose(float(asian[0, 0]), want_geo, rtol=1e-5)
    # barrier far above any zero-bit path: terminal value survives
    with pltpu.force_tpu_interpret_mode():
        barrier = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.BARRIER_UP_OUT, barrier_rel=1e6,
            term=term, interpret=True,
        )
    np.testing.assert_allclose(float(barrier[0, 0]), np.exp(logs[-1]), rtol=1e-5)


def test_term_flat_curves_take_the_flat_kernel_bitstream() -> None:
    """An exactly-flat TermStructure through the pallas wrapper is the SAME
    program as no term — bit-identical output, no gbm_term stream."""
    from spectralmc_tpu.ops.gbm import TermStructure
    from spectralmc_tpu.ops.gbm_pallas import simulate_underlier_rows_pallas

    arr = CONTRACT.as_array(jnp.float32)
    flat_term = TermStructure(vol_shape=(1.0,) * 8, rate_shape=(1.0,) * 8)
    with pltpu.force_tpu_interpret_mode():
        base = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(2), arr, timesteps=8, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.TERMINAL, interpret=True,
        )
        with_term = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(2), arr, timesteps=8, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.TERMINAL, term=flat_term, interpret=True,
        )
    assert np.array_equal(np.asarray(base), np.asarray(with_term))


def test_term_pallas_fallback_matches_xla() -> None:
    """Off-TPU (no interpret) the wrapper falls back BIT-EXACTLY to the XLA
    simulator with the term threaded through."""
    from spectralmc_tpu.ops.gbm import simulate_underlier_rows
    from spectralmc_tpu.ops.gbm_pallas import simulate_underlier_rows_pallas

    term = _term_curved()
    arr = CONTRACT.as_array(jnp.float32)
    kw = dict(
        timesteps=8, rows=8, cols=128, dtype=jnp.float32,
        scheme=PathScheme.LOG_EULER, payoff=PayoffKind.ASIAN_ARITHMETIC,
    )
    got = simulate_underlier_rows_pallas(
        jax.random.PRNGKey(3), arr, term=term, **kw
    )
    want = simulate_underlier_rows(jax.random.PRNGKey(3), arr, term=term, **kw)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_term_antithetic_in_block_mirroring() -> None:
    """With antithetic on, the bottom half of each block mirrors the top
    half's normals negated — under zero-bit RNG the two halves are the two
    deterministic +/- z0 paths."""
    from spectralmc_tpu.ops.gbm_pallas import (
        _bm_radius,
        _sin_turns,
        _term_coeff_tables,
        simulate_underlier_rows_pallas,
    )

    term = _term_curved()
    arr = CONTRACT.as_array(jnp.float32)
    T = 8
    with pltpu.force_tpu_interpret_mode():
        rows = simulate_underlier_rows_pallas(
            jax.random.PRNGKey(1), arr, timesteps=T, rows=8, cols=128,
            dtype=jnp.float32, scheme=PathScheme.LOG_EULER,
            payoff=PayoffKind.ASIAN_GEOMETRIC, term=term,
            antithetic_half=4, interpret=True,
        )
    t = np.asarray(rows)
    step, _ = _term_coeff_tables(arr, term.shapes(T), T)
    r0 = float(_bm_radius(jnp.float32(2.0**-25)))
    z0 = r0 * float(_sin_turns(jnp.float32(0.25)))
    for sign, row in ((1.0, 0), (-1.0, 4)):
        logx = float(jnp.log(arr[0]))
        acc = 0.0
        for t_i in range(T):
            logx += float(step[t_i, 0]) + float(step[t_i, 1]) * sign * z0
            acc += logx
        np.testing.assert_allclose(t[row, 0], np.exp(acc / T), rtol=1e-5)
    assert not np.allclose(t[0, 0], t[4, 0])


def test_term_stream_version_and_resolution() -> None:
    """Curved terms carry their own stream key; flat terms do not. Off-TPU
    resolution is XLA (pallas_supported needs the hardware)."""
    from spectralmc_tpu.ops.gbm import (
        ModelKind,
        SimImplementation,
        build_simulation_params,
        resolve_implementation,
    )
    from spectralmc_tpu.ops.gbm_pallas import pallas_stream_version

    assert pallas_stream_version(ModelKind.GBM, term=True) == 1
    assert pallas_stream_version(ModelKind.GBM, term=False) == 2  # flat gbm v2
    sim = build_simulation_params(
        timesteps=8, network_size=128, batches_per_mc_run=8, mc_seed=1,
        implementation=SimImplementation.PALLAS, term=_term_curved(),
    ).expect("sim")
    assert resolve_implementation(sim) == SimImplementation.XLA  # off-TPU


def test_terminal_pathwise_vjp_term_matches_autodiff() -> None:
    """The effective-factor generalization of the pathwise rule must equal
    jax.grad of the XLA simulator WITH the term threaded — verifying the
    Pallas engine's curved-market backward pass off-TPU."""
    from spectralmc_tpu.ops.gbm import simulate_terminal_rows
    from spectralmc_tpu.ops.gbm_pallas import terminal_pathwise_vjp

    term = _term_curved()
    T = 8
    vs, rs, qs = term.shapes(T)
    factors = (
        sum(v * v for v in vs) / T,
        sum(rs) / T,
        sum(qs) / T,
    )
    key = jax.random.PRNGKey(9)
    arr = CONTRACT.as_array(jnp.float64)
    kw = dict(timesteps=T, rows=16, cols=64, dtype=jnp.float64,
              scheme=PathScheme.LOG_EULER, term=term)
    w = jnp.linspace(0.5, 2.0, 16 * 64).reshape(16, 64).astype(jnp.float64)

    def loss(c):
        return jnp.sum(w * simulate_terminal_rows(key, c, **kw))

    want = np.asarray(jax.grad(loss)(arr))
    s_t = simulate_terminal_rows(key, arr, **kw)
    got = np.asarray(terminal_pathwise_vjp(w, s_t, arr, factors))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_greeks_engine_keeps_pallas_under_term() -> None:
    """greeks_engine no longer downgrades curved-term sims; mc_greeks through
    the (off-TPU fallback) diff wrapper matches the XLA IPA estimator."""
    from spectralmc_tpu.ops.gbm import (
        SimImplementation,
        build_simulation_params,
    )
    from spectralmc_tpu.ops.greeks import OptionSide, greeks_engine, mc_greeks

    sim = build_simulation_params(
        timesteps=8, network_size=128, batches_per_mc_run=16, mc_seed=3,
        implementation=SimImplementation.PALLAS, term=_term_curved(),
    ).expect("sim")
    # off-TPU pallas_supported is False -> the XLA engine actually runs,
    # but the SELECTION no longer special-cases term
    g = mc_greeks(sim, CONTRACT, option=OptionSide.PUT)
    assert g.engine == greeks_engine(sim)
    xla_sim = sim.model_copy(update={"implementation": SimImplementation.XLA})
    g2 = mc_greeks(xla_sim, CONTRACT, option=OptionSide.PUT)
    for field in ("spot", "strike", "maturity", "rate", "div_yield", "vol"):
        np.testing.assert_allclose(
            g.by_field[field], g2.by_field[field], rtol=1e-5, atol=1e-7
        )
