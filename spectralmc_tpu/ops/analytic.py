"""Closed-form Black–Scholes oracle.

Capability parity with the reference's QuantLib shim
(``/root/reference/src/spectralmc/quantlib.py:19-39``, ``bs_price_quantlib``)
without the QuantLib dependency: the Black formula is four lines of math.
Used as ground truth in the statistical MC tests and for put-call parity in
inference. Works on numpy or jnp arrays (pure, broadcastable, jit-safe).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from jax.scipy.special import erf


@dataclass(frozen=True, slots=True)
class AnalyticPrices:
    """Discounted put/call prices with intrinsics and convexities (time value)."""

    put: Any
    call: Any
    put_intrinsic: Any
    call_intrinsic: Any
    put_convexity: Any
    call_convexity: Any


def _norm_cdf(x: Any) -> Any:
    return 0.5 * (1.0 + erf(x / jnp.sqrt(2.0).astype(getattr(x, "dtype", jnp.float64))))


def black_scholes_price(
    spot: Any, strike: Any, maturity: Any, rate: Any, div_yield: Any, vol: Any
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
    mu: Any, s2: Any, strike: Any, rate: Any, maturity: Any
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


def geometric_basket_price(
    spot: Any,
    strike: Any,
    maturity: Any,
    rate: Any,
    div_yield: Any,
    vol: Any,
    *,
    spec: Any,
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
) -> AnalyticPrices:
    """Knock-out put/call monitored on the DISCRETE grid t_1..t_N, by
    density propagation (host numpy, float64).

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
    drift = (rate - div_yield - 0.5 * vol * vol) * dt
    sd = vol * _np.sqrt(dt)
    total_sd = vol * _np.sqrt(maturity)
    ln_s0 = _np.log(spot)
    ln_b = _np.log(spot * barrier_rel)
    lo = min(ln_s0 + drift * n - width_std * total_sd, ln_b - 4 * sd)
    hi = max(ln_s0 + drift * n + width_std * total_sd, ln_b + 4 * sd)
    x = _np.linspace(lo, hi, grid_points)
    dx = x[1] - x[0]
    survive = x < ln_b if up else x > ln_b

    def gauss(centers: _np.ndarray) -> _np.ndarray:
        z = (x[:, None] - centers[None, :]) / sd
        return _np.exp(-0.5 * z * z) / (sd * _np.sqrt(2.0 * _np.pi))

    # step 1: exact Gaussian from the point mass at ln S0, then mask
    q = gauss(_np.array([ln_s0 + drift]))[:, 0] * dx
    q = _np.where(survive, q, 0.0)
    if n > 1:
        transition = gauss(x + drift) * dx  # [to, from]
        for _ in range(n - 1):
            q = _np.where(survive, transition @ q, 0.0)
    s_t = _np.exp(x)
    df = _np.exp(-rate * maturity)
    call = df * float((q * _np.maximum(s_t - strike, 0.0)).sum())
    put = df * float((q * _np.maximum(strike - s_t, 0.0)).sum())
    # intrinsic convention as elsewhere: discounted forward intrinsics
    forward = spot * _np.exp((rate - div_yield) * maturity)
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


def geometric_asian_price(
    spot: Any,
    strike: Any,
    maturity: Any,
    rate: Any,
    div_yield: Any,
    vol: Any,
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


def implied_vol(
    price: Any,
    spot: Any,
    strike: Any,
    maturity: Any,
    rate: Any,
    div_yield: Any,
    *,
    option: str = "call",
    iterations: int = 64,
    lo: float = 1e-4,
    hi: float = 5.0,
) -> Any:
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

    def value(vol: Any) -> Any:
        prices = black_scholes_price(spot, strike, maturity, rate, div_yield, vol)
        return prices.call if is_call else prices.put

    def body(bounds: Any, _: Any) -> Any:
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
