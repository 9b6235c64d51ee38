"""Closed-form Black–Scholes oracle.

Capability parity with the reference's QuantLib shim
(``/root/reference/src/spectralmc/quantlib.py:19-39``, ``bs_price_quantlib``)
without the QuantLib dependency: the Black formula is four lines of math.
Used as ground truth in the statistical MC tests and for put-call parity in
inference. Works on numpy or jnp arrays (pure, broadcastable, jit-safe).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.typing import ArrayLike
from jax.scipy.special import erf


@dataclass(frozen=True, slots=True)
class AnalyticPrices:
    """Discounted put/call prices with intrinsics and convexities (time value)."""

    put: jax.Array
    call: jax.Array
    put_intrinsic: jax.Array
    call_intrinsic: jax.Array
    put_convexity: jax.Array
    call_convexity: jax.Array


def _norm_cdf(x: ArrayLike) -> jax.Array:
    return 0.5 * (1.0 + erf(x / jnp.sqrt(2.0).astype(getattr(x, "dtype", jnp.float64))))


def black_scholes_price(
    spot: ArrayLike, strike: ArrayLike, maturity: ArrayLike, rate: ArrayLike, div_yield: ArrayLike, vol: ArrayLike
) -> AnalyticPrices:
    """European put/call under GBM: Black formula on the forward.

    F = S·e^{(r−q)T}, df = e^{−rT};
    call = df·(F·N(d1) − K·N(d2)), put via parity.
    Intrinsic here means the discounted forward-intrinsic df·max(±(F−K), 0);
    convexity = price − intrinsic ≥ 0 (the optionality/time value).
    """
    forward = spot * jnp.exp((rate - div_yield) * maturity)
    df = jnp.exp(-rate * maturity)
    total_vol = vol * jnp.sqrt(maturity)
    d1 = (jnp.log(forward / strike) + 0.5 * total_vol**2) / total_vol
    d2 = d1 - total_vol
    call = df * (forward * _norm_cdf(d1) - strike * _norm_cdf(d2))
    put = call - df * (forward - strike)  # put-call parity
    call_intr = df * jnp.maximum(forward - strike, 0.0)
    put_intr = df * jnp.maximum(strike - forward, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


def lognormal_black_price(
    mu: ArrayLike, s2: ArrayLike, strike: ArrayLike, rate: ArrayLike, maturity: ArrayLike
) -> AnalyticPrices:
    """Black-type put/call on a lognormal underlier ln U ~ N(mu, s2).

    The shared engine behind the geometric-Asian and geometric-basket
    oracles: call = df·(E[U]·N(d1) − K·N(d2)) with d1 = (mu − lnK + s2)/s.
    """
    df = jnp.exp(-rate * maturity)
    s = jnp.sqrt(s2)
    mean_u = jnp.exp(mu + 0.5 * s2)
    d1 = (mu - jnp.log(strike) + s2) / s
    d2 = d1 - s
    call = df * (mean_u * _norm_cdf(d1) - strike * _norm_cdf(d2))
    put = call - df * (mean_u - strike)  # parity on the lognormal mean
    call_intr = df * jnp.maximum(mean_u - strike, 0.0)
    put_intr = df * jnp.maximum(strike - mean_u, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


def term_effective_black(
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    vol: ArrayLike,
    *,
    vol_shape: tuple[float, ...],
    rate_shape: tuple[float, ...],
    div_shape: tuple[float, ...],
) -> AnalyticPrices:
    """European put/call under piecewise-constant curves (term-structure
    oracle, exact for the log-Euler simulator ``ops/gbm.py`` runs with a
    ``TermStructure``).

    Over N equal steps, ln S_T is exactly Gaussian with total variance
    ``vol²·dt·Σ vs_j²`` and drift integral ``Σ(r·rs_j − q·qs_j)dt``, so the
    flat Black formula applies verbatim at the effective parameters
    ``vol_eff = vol·sqrt(mean(vs²))``, ``r_eff = r·mean(rs)``,
    ``q_eff = q·mean(qs)`` — no approximation anywhere.
    Shapes must share one length N (empty = flat ones, matching
    ``TermStructure.shapes``).
    """
    import math

    n = max(len(vol_shape), len(rate_shape), len(div_shape), 1)
    vs = vol_shape or (1.0,) * n
    rs = rate_shape or (1.0,) * n
    qs = div_shape or (1.0,) * n
    vol_eff = vol * math.sqrt(sum(v * v for v in vs) / len(vs))
    r_eff = rate * (sum(rs) / len(rs))
    q_eff = div_yield * (sum(qs) / len(qs))
    return black_scholes_price(spot, strike, maturity, r_eff, q_eff, vol_eff)


def digital_price(
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    vol: ArrayLike,
    *,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
) -> tuple[jax.Array, jax.Array]:
    """(put, call) cash-or-nothing digital prices, one unit of cash.

    put = df·P(S_T < K) = df·N(−d2), call = df·P(S_T > K) = df·N(d2). Exact
    for the log-Euler simulator: ln S_T is exactly Gaussian under the
    discrete scheme (flat parameters or piecewise-constant curves — the
    effective-parameter reduction of ``term_effective_black`` applies
    verbatim, d2 at vol_eff/r_eff/q_eff). Oracle for ``PayoffKind.DIGITAL``
    (ops/gbm.py), whose ±1 underlier encoding prices both channels in one
    pass. jit-safe and broadcastable like ``black_scholes_price``.
    """
    import math

    if vol_shape or rate_shape or div_shape:
        n = max(len(vol_shape), len(rate_shape), len(div_shape), 1)
        vs = vol_shape or (1.0,) * n
        rs = rate_shape or (1.0,) * n
        qs = div_shape or (1.0,) * n
        vol = vol * math.sqrt(sum(v * v for v in vs) / len(vs))
        rate_drift = rate * (sum(rs) / len(rs))
        div_drift = div_yield * (sum(qs) / len(qs))
    else:
        rate_drift, div_drift = rate, div_yield
    df = jnp.exp(-rate_drift * maturity)
    total_vol = vol * jnp.sqrt(maturity)
    d2 = (
        jnp.log(spot / strike) + (rate_drift - div_drift) * maturity - 0.5 * total_vol**2
    ) / total_vol
    return df * _norm_cdf(-d2), df * _norm_cdf(d2)


def term_geometric_asian_price(
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    vol: ArrayLike,
    *,
    timesteps: int,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
) -> AnalyticPrices:
    """Discrete geometric-Asian put/call under piecewise-constant curves.

    The grid average of ln S is Gaussian with
    ``mu = ln S + Σ_j a_j·(N−j)/N`` and ``s² = Σ_j b_j²·((N−j)/N)²`` where
    ``a_j = (r·rs_j − q·qs_j − ½σ_j²)·dt`` and ``b_j = σ_j·√dt`` — the
    weighted generalization of ``geometric_asian_price``'s closed sums
    (which it reproduces exactly for flat shapes). Discounting uses the
    curve rate integral. Exact under log-Euler, like the flat oracle.
    """
    import numpy as _np

    n = int(timesteps)
    vs = _np.asarray(vol_shape or (1.0,) * n, dtype=_np.float64)
    rs = _np.asarray(rate_shape or (1.0,) * n, dtype=_np.float64)
    qs = _np.asarray(div_shape or (1.0,) * n, dtype=_np.float64)
    dt = maturity / n
    vol_t = vol * vs
    a = (rate * rs - div_yield * qs - 0.5 * vol_t * vol_t) * dt
    w = (n - _np.arange(n, dtype=_np.float64)) / n
    mu = jnp.log(spot) + float((a * w).sum())
    s2 = float((vol_t * vol_t * dt * w * w).sum())
    r_eff = rate * float(rs.mean())
    return lognormal_black_price(mu, s2, strike, r_eff, maturity)


def geometric_basket_price(
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    vol: ArrayLike,
    *,
    spec: object,
) -> AnalyticPrices:
    """European put/call on the geometric basket Π Sᵢ^wᵢ, closed form.

    ln B_T ~ N(ln G₀ + μ̄T, s̄²T) with (μ̄, s̄²) from
    ``ops/basket.py::basket_log_moments`` — exact under the log-Euler
    discretization, so the basket MC estimator converges with zero
    discretization bias (the multi-asset analogue of the geometric-Asian
    oracle).
    """
    import jax

    from spectralmc_tpu.ops.basket import basket_g0, basket_log_moments

    default = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    dtype = getattr(spot, "dtype", default)
    contract = jnp.stack(
        [jnp.asarray(v, dtype) for v in (spot, strike, maturity, rate, div_yield, vol)]
    )
    mu_bar, s2_bar = basket_log_moments(contract, spec, dtype=dtype)
    mu = jnp.log(basket_g0(contract, spec, dtype=dtype)) + mu_bar * maturity
    return lognormal_black_price(mu, s2_bar * maturity, strike, rate, maturity)


def discrete_barrier_price(
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
    barrier_rel: float,
    up: bool,
    grid_points: int = 2049,
    width_std: float = 8.0,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
) -> AnalyticPrices:
    """Knock-out put/call monitored on the DISCRETE grid t_1..t_N, by
    density propagation (host numpy, float64). Optional piecewise-constant
    curves (``TermStructure`` semantics: per-step multipliers on vol/rate/
    div) make each step's Gaussian transition use its own drift/σ — the
    propagation stays exact per step, so the oracle is as sharp for curved
    markets as for flat ones.

    Per log-Euler step the log-price transition is exactly Gaussian, so the
    surviving sub-density is a chain of Gaussian convolutions with a knockout
    mask applied at every monitor date — computed on a uniform log grid
    (trapezoid quadrature, O(Δ²)). Unlike the continuity-corrected
    Reiner–Rubinstein formulas this shares the simulator's exact discrete
    monitoring, so it gates the MC barrier estimator with no
    discretization slop (grid/truncation error ≪ MC standard error at the
    test scales). Knocked paths pay nothing (out-options; ins follow by
    in + out = vanilla).
    """
    import numpy as _np

    n = int(timesteps)
    dt = maturity / n
    vs = _np.asarray(vol_shape or (1.0,) * n, dtype=_np.float64)
    rs = _np.asarray(rate_shape or (1.0,) * n, dtype=_np.float64)
    qs = _np.asarray(div_shape or (1.0,) * n, dtype=_np.float64)
    vol_t = vol * vs
    drift_t = (rate * rs - div_yield * qs - 0.5 * vol_t * vol_t) * dt
    sd_t = vol_t * _np.sqrt(dt)
    # zero-vol steps would make the Gaussian kernel singular; the simulator
    # allows them, the oracle does not (gate tests use positive curves)
    if (sd_t <= 0.0).any():
        raise ValueError("discrete_barrier_price needs positive per-step vol")
    total_sd = float(_np.sqrt((sd_t * sd_t).sum()))
    ln_s0 = _np.log(spot)
    ln_b = _np.log(spot * barrier_rel)
    lo = min(ln_s0 + drift_t.sum() - width_std * total_sd, ln_b - 4 * sd_t.max())
    hi = max(ln_s0 + drift_t.sum() + width_std * total_sd, ln_b + 4 * sd_t.max())
    x = _np.linspace(lo, hi, grid_points)
    dx = x[1] - x[0]
    survive = x < ln_b if up else x > ln_b

    def gauss(centers: _np.ndarray, sd: float) -> _np.ndarray:
        z = (x[:, None] - centers[None, :]) / sd
        return _np.exp(-0.5 * z * z) / (sd * _np.sqrt(2.0 * _np.pi))

    # step 1: exact Gaussian from the point mass at ln S0, then mask
    q = gauss(_np.array([ln_s0 + drift_t[0]]), float(sd_t[0]))[:, 0] * dx
    q = _np.where(survive, q, 0.0)
    flat = bool(
        (vs == vs[0]).all() and (rs == rs[0]).all() and (qs == qs[0]).all()
    )
    transition = gauss(x + drift_t[0], float(sd_t[0])) * dx if flat and n > 1 else None
    for j in range(1, n):
        step_t = (
            transition
            if transition is not None
            else gauss(x + drift_t[j], float(sd_t[j])) * dx  # [to, from]
        )
        q = _np.where(survive, step_t @ q, 0.0)
    s_t = _np.exp(x)
    r_eff = rate * float(rs.mean())
    df = _np.exp(-r_eff * maturity)
    call = df * float((q * _np.maximum(s_t - strike, 0.0)).sum())
    put = df * float((q * _np.maximum(strike - s_t, 0.0)).sum())
    # intrinsic convention as elsewhere: discounted forward intrinsics
    q_eff = div_yield * float(qs.mean())
    forward = spot * _np.exp((r_eff - q_eff) * maturity)
    call_intr = df * max(forward - strike, 0.0)
    put_intr = df * max(strike - forward, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


@dataclass(frozen=True, slots=True)
class LookbackPrices:
    """Discrete-monitoring lookback prices (grid t_0..t_N, t_0 included).

    fixed_call pays (M−K)+, fixed_put (K−m)+, float_put M−S_T, float_call
    S_T−m, with M/m the running max/min over the monitor grid. ``e_max`` /
    ``e_min`` are the undiscounted E[M], E[m].
    """

    fixed_call: float
    fixed_put: float
    float_call: float
    float_put: float
    e_max: float
    e_min: float
    forward: float
    discount_factor: float


def lookback_price(
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
    grid_points: int = 1537,
    levels: int = 1025,
    width_std: float = 8.0,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
) -> LookbackPrices:
    """Lookback prices monitored on the DISCRETE grid t_0..t_N, by
    barrier-survival integration (host numpy, float64).

    The running-max distribution is recovered from knockout survival: for
    b > S0, P(M ≤ b) is exactly the surviving mass of the up-and-out
    propagation at level b (``discrete_barrier_price``'s chain of per-step
    Gaussian transitions with a mask at every monitor date), so

        E[(M−K)+] = ∫_K^∞ P(M > b) db
                  = max(S0−K, 0) + ∫_{max(K,S0)}^∞ (1 − survival(b)) db,

    computed over a LADDER of levels in one batched propagation (the
    transition matrix is shared across levels — [G,G]·[G,L] per step).
    Symmetrically for the running min. Unlike the continuous-monitoring
    closed forms this shares the simulator's exact discrete grid, so it
    gates the MC lookback estimator with no monitoring-correction slop.
    Optional piecewise-constant curves follow ``TermStructure`` semantics
    exactly as in ``discrete_barrier_price``.
    """
    import numpy as _np

    n = int(timesteps)
    dt = maturity / n
    vs = _np.asarray(vol_shape or (1.0,) * n, dtype=_np.float64)
    rs = _np.asarray(rate_shape or (1.0,) * n, dtype=_np.float64)
    qs = _np.asarray(div_shape or (1.0,) * n, dtype=_np.float64)
    vol_t = vol * vs
    drift_t = (rate * rs - div_yield * qs - 0.5 * vol_t * vol_t) * dt
    sd_t = vol_t * _np.sqrt(dt)
    if (sd_t <= 0.0).any():
        raise ValueError("lookback_price needs positive per-step vol")
    total_sd = float(_np.sqrt((sd_t * sd_t).sum()))
    drift_sum = float(drift_t.sum())
    ln_s0 = _np.log(spot)
    lo = ln_s0 + min(drift_sum, 0.0) - width_std * total_sd
    hi = ln_s0 + max(drift_sum, 0.0) + width_std * total_sd
    x = _np.linspace(lo, hi, grid_points)
    dx = x[1] - x[0]
    flat = bool((vs == vs[0]).all() and (rs == rs[0]).all() and (qs == qs[0]).all())

    def gauss(centers: _np.ndarray, sd: float) -> _np.ndarray:
        z = (x[:, None] - centers[None, :]) / sd
        return _np.exp(-0.5 * z * z) / (sd * _np.sqrt(2.0 * _np.pi))

    def exceed_prob(ln_levels: _np.ndarray, up: bool) -> _np.ndarray:
        """P(extreme beyond level) per ladder level, one batched propagation."""
        survive = (x[:, None] < ln_levels[None, :]) if up else (
            x[:, None] > ln_levels[None, :]
        )  # [G, L]
        q = gauss(_np.array([ln_s0 + drift_t[0]]), float(sd_t[0])) * dx  # [G, 1]
        q = _np.where(survive, q, 0.0)
        transition = gauss(x + drift_t[0], float(sd_t[0])) * dx if flat and n > 1 else None
        for j in range(1, n):
            step_t = (
                transition
                if transition is not None
                else gauss(x + drift_t[j], float(sd_t[j])) * dx
            )
            q = _np.where(survive, step_t @ q, 0.0)
        return 1.0 - q.sum(axis=0)

    # running MAX: levels from S0 up; b <= S0 has P(M > b) = 1 (t_0 counts)
    b_max = _np.exp(_np.linspace(ln_s0, hi, levels))
    p_above = exceed_prob(_np.log(b_max), up=True)

    def tail_integral(grid: _np.ndarray, p: _np.ndarray, c: float) -> float:
        """∫_c^∞ p(b) db over the ladder (p → 0 at the far end)."""
        if c >= grid[-1]:
            return 0.0
        c = max(c, grid[0])
        cum = _np.concatenate(
            [_np.cumsum(((p[1:] + p[:-1]) * 0.5 * _np.diff(grid))[::-1])[::-1], [0.0]]
        )
        return float(_np.interp(c, grid, cum))

    e_max = spot + tail_integral(b_max, p_above, spot)
    fixed_call = max(spot - strike, 0.0) + tail_integral(b_max, p_above, max(strike, spot))

    # running MIN: levels from S0 down; b >= S0 has P(m < b) = 1
    b_min = _np.exp(_np.linspace(lo, ln_s0, levels))
    p_below = exceed_prob(_np.log(b_min), up=False)

    def head_integral(grid: _np.ndarray, p: _np.ndarray, c: float) -> float:
        """∫_0^c p(b) db over the ladder (p → 0 at the near end)."""
        if c <= grid[0]:
            return 0.0
        c = min(c, grid[-1])
        cum = _np.concatenate(
            [[0.0], _np.cumsum((p[1:] + p[:-1]) * 0.5 * _np.diff(grid))]
        )
        return float(_np.interp(c, grid, cum))

    e_min = spot - head_integral(b_min, p_below, spot)
    fixed_put = max(strike - spot, 0.0) + head_integral(b_min, p_below, min(strike, spot))

    r_eff = rate * float(rs.mean())
    q_eff = div_yield * float(qs.mean())
    df = float(_np.exp(-r_eff * maturity))
    forward = float(spot * _np.exp((r_eff - q_eff) * maturity))
    return LookbackPrices(
        fixed_call=df * fixed_call,
        fixed_put=df * fixed_put,
        float_call=df * (forward - e_min),
        float_put=df * (e_max - forward),
        e_max=e_max,
        e_min=e_min,
        forward=forward,
        discount_factor=df,
    )


def geometric_asian_price(
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    vol: ArrayLike,
    *,
    timesteps: int,
) -> AnalyticPrices:
    """Discrete geometric-Asian put/call, closed form (extension oracle).

    The geometric mean over the monitoring grid t_i = i·T/N (i = 1..N) of a
    GBM is lognormal with

        ln G ~ N(mu, s²),
        mu = ln S + (r − q − σ²/2)·dt·(N+1)/2,
        s² = σ²·dt·(N+1)(2N+1)/(6N),

    exact under the log-Euler discretization — so the MC estimator in
    ``ops/gbm.py::simulate_underlier_rows(ASIAN_GEOMETRIC)`` converges to
    this price with zero discretization bias, making it as sharp an oracle
    as the Black formula is for TERMINAL payoffs.
    """
    n = jnp.asarray(float(timesteps), getattr(spot, "dtype", jnp.float64))
    dt = maturity / n
    df = jnp.exp(-rate * maturity)
    mu = jnp.log(spot) + (rate - div_yield - 0.5 * vol * vol) * dt * (n + 1.0) / 2.0
    s2 = vol * vol * dt * (n + 1.0) * (2.0 * n + 1.0) / (6.0 * n)
    s = jnp.sqrt(s2)
    mean_g = jnp.exp(mu + 0.5 * s2)  # E[G]
    d1 = (mu - jnp.log(strike) + s2) / s
    d2 = d1 - s
    call = df * (mean_g * _norm_cdf(d1) - strike * _norm_cdf(d2))
    put = call - df * (mean_g - strike)  # parity on the lognormal mean
    call_intr = df * jnp.maximum(mean_g - strike, 0.0)
    put_intr = df * jnp.maximum(strike - mean_g, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


def variance_option_price(
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
) -> AnalyticPrices:
    """Exact discrete-grid variance call/put prices under flat log-Euler GBM
    (host-side float64 oracle; extension — no reference counterpart).

    The annualized realized variance over the N-step grid,
    RV = (1/T)·Σ(Δln S)², with Δln S ~ iid N(a, b²), a = (r−q−σ²/2)·dt,
    b² = σ²·dt, is a scaled noncentral chi-square:

        RV ~ (b²/T)·χ'²(ν=N, λ=N·a²/b²).

    Tail-mean identity x·f_{ν,λ}(x) = ν·f_{ν+2,λ}(x) + λ·f_{ν+4,λ}(x) gives
    E[X·1{X>y}] = ν·Q_{ν+2,λ}(y) + λ·Q_{ν+4,λ}(y) (Q = survival function),
    so the variance cap df·E[max(RV−K,0)] — the call channel of
    ``PayoffKind.VARIANCE_SWAP`` — is closed-form; the floor (put channel)
    follows by parity with E[RV] = (b²/T)(ν+λ). Zero discretization slop:
    the MC estimator's increments ARE iid N(a, b²), so this is as sharp as
    the Black formula is for TERMINAL. ``strike`` is in vol² units.
    """
    import numpy as np
    from scipy.stats import ncx2

    n = int(timesteps)
    dt = maturity / n
    a = (rate - div_yield - 0.5 * vol * vol) * dt
    b2 = vol * vol * dt
    lam = n * a * a / b2
    scale = b2 / maturity
    y = strike / scale
    df = float(np.exp(-rate * maturity))
    q_y = float(ncx2.sf(y, n, lam))
    e_tail = n * float(ncx2.sf(y, n + 2, lam)) + lam * float(ncx2.sf(y, n + 4, lam))
    call = df * scale * (e_tail - y * q_y)
    e_rv = scale * (n + lam)
    put = call - df * (e_rv - strike)  # parity on the exact mean
    call_intr = df * max(e_rv - strike, 0.0)
    put_intr = df * max(strike - e_rv, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


def forward_start_price(
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
    start_step: int,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
) -> AnalyticPrices:
    """Exact discrete-grid forward-start put/call under log-Euler GBM, flat
    or curved (extension oracle — no reference counterpart).

    The underlier u = spot·S_T/S_m (``PayoffKind.FORWARD_START``) is exactly
    lognormal in the TAIL increments: ln u ~ N(ln spot + Σ_{t≥m} a_t,
    Σ_{t≥m} v_t²·dt) with a_t = (r_t − q_t − v_t²/2)·dt — so the Black-type
    formula on a lognormal (``lognormal_black_price``) applies with zero
    discretization slop. Discounting uses the FULL curve (e^{−∫₀ᵀ r}), the
    classic forward-start structure: strike sets at t_m, premium pays today.
    ``strike`` is absolute; k = strike/spot is the relative strike the desk
    quotes. Matches Rubinstein's formula in the flat continuous limit.
    """
    import math

    n = int(timesteps)
    m = int(start_step)
    dt = maturity / n
    vs = vol_shape or (1.0,) * n
    rs = rate_shape or (1.0,) * n
    qs = div_shape or (1.0,) * n
    mu = math.log(spot) + sum(
        (rate * rs[t] - div_yield * qs[t] - 0.5 * (vol * vs[t]) ** 2) * dt
        for t in range(m, n)
    )
    s2 = sum((vol * vs[t]) ** 2 * dt for t in range(m, n))
    rate_eff = rate * (sum(rs) / n)
    return lognormal_black_price(mu, s2, strike, rate_eff, maturity)


def cliquet_price(
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
    reset_every: int,
    local_floor: float,
    local_cap: float,
    vol_shape: tuple[float, ...] = (),
    rate_shape: tuple[float, ...] = (),
    div_shape: tuple[float, ...] = (),
    grid: int = 1 << 16,
) -> AnalyticPrices:
    """Exact discrete-grid cliquet put/call under log-Euler GBM, flat or
    curved (host-side float64 lattice oracle; extension — no reference
    counterpart).

    The underlier u = Σ_j clip(R_j, floor, cap) (``PayoffKind.CLIQUET``)
    sums INDEPENDENT clipped period returns: period j's log-return is
    Gaussian with μ_j = Σ_{t∈j} a_t, s_j² = Σ_{t∈j} v_t²·dt, so each
    clipped return has a known mixed law (atoms at floor/cap + a lognormal
    body) and the law of u is their convolution. Each period's law is laid
    on a shared lattice anchored at ``local_floor`` (atom mass split
    mean-preservingly across straddling cells); the product of their FFTs
    is the sum's pmf — the lattice is sized so the P-fold support cannot
    wrap. Lattice bias is O(h²) ≈ (cap−floor)²·P²/grid², far below MC
    standard errors at any test path count. ``strike`` is in RETURN units
    (the guarantee level); discounting uses the full effective curve.
    ``spot`` is accepted for signature symmetry but cancels out of every
    period ratio.
    """
    import math

    import numpy as np
    from scipy.stats import norm

    n = int(timesteps)
    k = int(reset_every)
    periods = n // k
    dt = maturity / n
    vs = vol_shape or (1.0,) * n
    rs = rate_shape or (1.0,) * n
    qs = div_shape or (1.0,) * n
    mus = []
    sds = []
    for j in range(periods):
        steps = range(j * k, (j + 1) * k)
        mus.append(
            sum((rate * rs[t] - div_yield * qs[t] - 0.5 * (vol * vs[t]) ** 2) * dt for t in steps)
        )
        sds.append(math.sqrt(sum((vol * vs[t]) ** 2 * dt for t in steps)))

    # shared lattice: anchored at the floor, step h small enough that the
    # P-fold index sum stays inside the FFT grid (no circular wrap)
    h = (local_cap - local_floor) * periods / (grid - 8)
    m_cells = int(math.ceil((local_cap - local_floor) / h)) + 1
    x = local_floor + h * np.arange(m_cells)
    edges = np.concatenate([x - h / 2, [x[-1] + h / 2]])
    ce = np.clip(edges, local_floor, local_cap)

    F = np.ones(grid // 2 + 1, dtype=np.complex128)
    for mu, s in zip(mus, sds):
        pmf = np.zeros(grid)
        pmf[:m_cells] = np.diff(norm.cdf((np.log1p(ce) - mu) / s))
        pmf[0] += norm.cdf((math.log1p(local_floor) - mu) / s)
        p_cap = 1.0 - norm.cdf((math.log1p(local_cap) - mu) / s)
        j_f = (local_cap - local_floor) / h
        j0 = min(int(math.floor(j_f)), m_cells - 1)
        w1 = j_f - j0
        pmf[j0] += p_cap * (1.0 - w1)
        pmf[min(j0 + 1, m_cells - 1)] += p_cap * w1
        pmf /= pmf.sum()
        F *= np.fft.rfft(pmf)
    conv = np.maximum(np.fft.irfft(F, grid), 0.0)
    conv /= conv.sum()
    xs = local_floor * periods + h * np.arange(grid)

    rate_eff = rate * (sum(rs) / n)
    df = float(math.exp(-rate_eff * maturity))
    put = df * float(np.sum(np.maximum(strike - xs, 0.0) * conv))
    call = df * float(np.sum(np.maximum(xs - strike, 0.0) * conv))
    mean_u = float(np.sum(xs * conv))
    call_intr = df * max(mean_u - strike, 0.0)
    put_intr = df * max(strike - mean_u, 0.0)
    return AnalyticPrices(
        put=put,
        call=call,
        put_intrinsic=put_intr,
        call_intrinsic=call_intr,
        put_convexity=put - put_intr,
        call_convexity=call - call_intr,
    )


def variance_fair_strike(
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    *,
    timesteps: int,
) -> float:
    """E[RV] on the discrete grid — the strike that zeroes the variance-swap
    leg (exact under flat log-Euler GBM; matches
    ``ops/gbm.py::expected_underlier_mean(VARIANCE_SWAP)``)."""
    dt = maturity / timesteps
    a = (rate - div_yield - 0.5 * vol * vol) * dt
    return timesteps * (a * a + vol * vol * dt) / maturity


def implied_vol(
    price: ArrayLike,
    spot: ArrayLike,
    strike: ArrayLike,
    maturity: ArrayLike,
    rate: ArrayLike,
    div_yield: ArrayLike,
    *,
    option: str = "call",
    iterations: int = 64,
    lo: float = 1e-4,
    hi: float = 5.0,
) -> jax.Array:
    """Black implied volatility by bisection (jit/vmap-safe, NaN outside
    no-arbitrage bounds).

    The quoting convention of every desk consuming the learned prices: what
    flat Black vol reproduces ``price``? Bisection rather than Newton keeps
    the solver branch-free and unconditionally convergent under ``lax.scan``
    (Newton's vega division blows up deep ITM/OTM where vega → 0). 64
    halvings of [lo, hi] resolve the bracket below f64 epsilon; resolution
    follows the INPUT dtype (~3e-7 at f32 — the tail iterations are then
    no-ops, kept for the dtype-independent default). Vectorizes over any
    broadcastable batch of inputs.

    Returns NaN rather than a pinned boundary value whenever the price is
    not attainable inside the bracket: outside the no-arbitrage envelope
    (call: df·max(F−K, 0) ≤ price < df·F; put: df·max(K−F, 0) ≤ price <
    df·K) OR outside [value(lo), value(hi)] — a price whose true vol
    exceeds ``hi`` must not silently quote the bracket ceiling.
    """
    import jax as _jax

    is_call = option == "call"
    forward = spot * jnp.exp((rate - div_yield) * maturity)
    df = jnp.exp(-rate * maturity)
    intrinsic = df * (
        jnp.maximum(forward - strike, 0.0) if is_call else jnp.maximum(strike - forward, 0.0)
    )
    upper = df * forward if is_call else df * strike

    def value(vol: ArrayLike) -> jax.Array:
        prices = black_scholes_price(spot, strike, maturity, rate, div_yield, vol)
        return prices.call if is_call else prices.put

    def body(
        bounds: tuple[jax.Array, jax.Array], _: None
    ) -> tuple[tuple[jax.Array, jax.Array], None]:
        lo_v, hi_v = bounds
        mid = 0.5 * (lo_v + hi_v)
        too_low = value(mid) < price
        new_lo = jnp.where(too_low, mid, lo_v)
        new_hi = jnp.where(too_low, hi_v, mid)
        return (new_lo, new_hi), None

    shape = jnp.broadcast_shapes(
        jnp.shape(price), jnp.shape(spot), jnp.shape(strike), jnp.shape(maturity),
        jnp.shape(rate), jnp.shape(div_yield),
    )
    dtype = jnp.result_type(price, spot, strike, maturity, rate, div_yield)
    lo_v = jnp.full(shape, lo, dtype)
    hi_v = jnp.full(shape, hi, dtype)
    (lo_v, hi_v), _ = _jax.lax.scan(body, (lo_v, hi_v), None, length=iterations)
    vol = 0.5 * (lo_v + hi_v)
    in_bounds = (
        (price >= intrinsic)
        & (price < upper)
        # attainable inside the bracket: Black is monotone in vol, so a
        # price past value(hi) (or under value(lo)) has no solution here
        & (price >= value(jnp.asarray(lo, dtype)))
        & (price <= value(jnp.asarray(hi, dtype)))
    )
    return jnp.where(in_bounds, vol, jnp.nan)
