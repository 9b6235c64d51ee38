"""Heston stochastic-volatility model family — extension beyond the reference.

The reference supports exactly one dynamics (GBM, gbm.py:224-257). This
module adds the canonical next model: Heston (1993), where variance follows
a CIR process correlated with the spot,

    dS = (r - q) S dt + sqrt(v) S dW_s
    dv = kappa (theta - v) dt + xi sqrt(v) dW_v,   d<W_s, W_v> = rho dt.

Thematically this is the framework's home turf: the trainer learns the
characteristic function of the payoff distribution, and Heston is *defined*
by a semi-analytic characteristic function (``heston_char_fn``), which also
yields the European price by Fourier inversion (``heston_call_price``, the
"little Heston trap" formulation of Albrecher et al. 2007) — a sharp oracle
for the MC simulator and the learned spectrum alike.

Discretization: full-truncation Euler (Lord et al. 2010) — v is floored at
zero inside drift and diffusion only, which keeps the scheme unbiased-in-
the-limit and robust when the Feller condition 2·kappa·theta >= xi² fails.

Determinism: the same key discipline as GBM — normals addressed by
(contract_key, global row, timestep, component), so resume is a counter and
a mesh shard reproduces exactly the rows it owns (row_offset).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from spectralmc_tpu.core.errors.gbm import GBMError, InvalidContract
from spectralmc_tpu.core.result import Failure, Result, Success
from spectralmc_tpu.ops.gbm import ModelKind, PayoffKind  # noqa: F401 — re-exported


class HestonContract(BaseModel):
    """One Heston market scenario: the 5 shared market fields (same order as
    ``BlackScholesContract``) + 5 variance-dynamics fields."""

    model_config = ConfigDict(frozen=True, extra="forbid")

    spot: float
    strike: float
    maturity: float
    rate: float
    div_yield: float
    v0: float  # initial variance
    kappa: float  # mean-reversion speed
    theta: float  # long-run variance
    xi: float  # vol of vol
    rho: float  # spot-variance correlation

    def as_array(self, dtype: jnp.dtype = jnp.float32) -> jax.Array:
        return jnp.array(
            [
                self.spot,
                self.strike,
                self.maturity,
                self.rate,
                self.div_yield,
                self.v0,
                self.kappa,
                self.theta,
                self.xi,
                self.rho,
            ],
            dtype=dtype,
        )


HESTON_CONTRACT_FIELDS: tuple[str, ...] = tuple(HestonContract.model_fields.keys())
HESTON_CONTRACT_DIM = len(HESTON_CONTRACT_FIELDS)


def validate_heston_contract(c: HestonContract) -> Result[HestonContract, GBMError]:
    for field in ("spot", "strike", "maturity", "v0", "kappa", "theta", "xi"):
        if getattr(c, field) <= 0:
            return Failure(
                InvalidContract(field=field, value=getattr(c, field), reason="must be > 0")
            )
    if not -1.0 < c.rho < 1.0:
        return Failure(InvalidContract(field="rho", value=c.rho, reason="must be in (-1, 1)"))
    return Success(c)


def heston_component_normals(
    row_keys: jax.Array,
    sign: jax.Array | None,
    t: jax.Array,
    comp: int,
    cols: int,
    dtype: jnp.dtype,
) -> jax.Array:
    """One component's normals, keyed (row key, timestep, component).

    THE Heston stream definition — every Heston path generator (the European
    simulator below, the American LSMC forward in ops/american.py) must draw
    through this function so their bit streams stay identical by
    construction. Antithetic flips BOTH components (negating a 2D Gaussian
    is a valid pair and preserves the spot-variance correlation).
    """
    z = jax.vmap(
        lambda k: jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(k, t), comp), (cols,), dtype
        )
    )(row_keys)
    return z if sign is None else sign * z


def heston_euler_step(
    logx: jax.Array,
    v: jax.Array,
    z_v: jax.Array,
    z_orth: jax.Array,
    *,
    rate: jax.Array,
    div_yield: jax.Array,
    dt: jax.Array,
    sqrt_dt: jax.Array,
    rho: jax.Array,
    rho_bar: jax.Array,
    kappa: jax.Array,
    theta: jax.Array,
    xi: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """ONE full-truncation Euler step — the single source of the recursion.

    Shared by the European simulator and the American LSMC forward pass so a
    future change to the discretization cannot silently desync their bit
    streams (test_american.py pins the parity bit-exactly).
    """
    v_plus = jnp.maximum(v, 0.0)
    sqrt_v = jnp.sqrt(v_plus)
    z_s = rho * z_v + rho_bar * z_orth
    logx = logx + (rate - div_yield - 0.5 * v_plus) * dt + sqrt_v * sqrt_dt * z_s
    v = v + kappa * (theta - v_plus) * dt + xi * sqrt_v * sqrt_dt * z_v
    return logx, v


@partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "dtype", "payoff", "barrier_rel",
        "antithetic_half", "forward_start_step", "cliquet_reset_every",
        "cliquet_floor", "cliquet_cap", "sampling", "mc_seed", "term",
    ),
)
def simulate_heston_underlier_rows(
    contract_key: jax.Array,
    contract: jax.Array,
    *,
    timesteps: int,
    rows: int,
    cols: int,
    dtype: jnp.dtype,
    payoff: PayoffKind,
    row_offset: jax.Array | int = 0,
    barrier_rel: float | None = None,
    antithetic_half: int | None = None,
    forward_start_step: int | None = None,
    cliquet_reset_every: int | None = None,
    cliquet_floor: float | None = None,
    cliquet_cap: float | None = None,
    sampling: "object | None" = None,
    mc_seed: int = 0,
    term: "object | None" = None,
) -> jax.Array:
    """``[rows, cols]`` payoff underliers under full-truncation Euler Heston.

    ``contract`` is the 10-vector of ``HestonContract.as_array``. Normals are
    keyed by (contract_key, global row, timestep, component) — component 0
    drives the variance, 1 the orthogonal part of the spot. Barrier kinds
    knock on the discrete spot grid and emit strike on knocked paths
    (the shared masked-underlier convention, ops/gbm.py::PayoffKind).
    With ``sampling=SamplingKind.SOBOL_BB`` both components come from the
    2-factor Brownian-bridge Sobol net (ops/qmc.py; variance = factor 0, so
    its coarse levels take the even Sobol dimensions).

    ``term`` (round 4): piecewise-constant rate_shape/div_shape curves —
    during step t the drift uses ``rate·rate_shape[t]`` and
    ``div_yield·div_shape[t]`` (``gbm.TermStructure`` semantics). vol curves
    are refused at config build time (Heston's instantaneous vol IS the
    variance process). European prices under deterministic rates factor the
    discount/forward out of the vol dynamics, so the semi-analytic oracle
    holds EXACTLY at the effective flat rates (``term.effective_factors``).
    A flat term is normalized to None — bit-identical program.
    """
    (spot, _, maturity, rate, div_yield, v0, kappa, theta, xi, rho) = (
        contract[i].astype(dtype) for i in range(10)
    )
    if term is not None and term.is_flat():
        term = None
    n = jnp.asarray(timesteps, dtype)
    dt = maturity / n
    sqrt_dt = jnp.sqrt(dt)
    rho_bar = jnp.sqrt(1.0 - rho * rho)

    from spectralmc_tpu.ops.gbm import SamplingKind, _row_streams

    if sampling == SamplingKind.SOBOL_BB:
        from spectralmc_tpu.ops.qmc import qmc_effective_normals_multi

        assert antithetic_half is None  # enforced by build_simulation_params
        zq = qmc_effective_normals_multi(
            contract_key,
            timesteps=timesteps,
            factors=2,
            rows=rows,
            cols=cols,
            dtype=dtype,
            mc_seed=mc_seed,
            row_offset=row_offset,
        )

        def component_normals(t: jax.Array, comp: int) -> jax.Array:
            return zq[t, comp]

    else:
        row_keys, sign = _row_streams(
            contract_key,
            rows=rows,
            row_offset=row_offset,
            antithetic_half=antithetic_half,
            dtype=dtype,
        )

        def component_normals(t: jax.Array, comp: int) -> jax.Array:
            return heston_component_normals(row_keys, sign, t, comp, cols, dtype)

    from spectralmc_tpu.ops.gbm import (
        BARRIER_PAYOFFS,
        LOOKBACK_MAX_PAYOFFS,
        LOOKBACK_PAYOFFS,
        lookback_underlier,
    )

    barrier = payoff in BARRIER_PAYOFFS
    lookback = payoff in LOOKBACK_PAYOFFS
    track_extreme = barrier or lookback
    up = payoff == PayoffKind.BARRIER_UP_OUT or payoff in LOOKBACK_MAX_PAYOFFS
    geometric = payoff == PayoffKind.ASIAN_GEOMETRIC
    extreme_fn = jnp.maximum if up else jnp.minimum
    step_consts = dict(
        rate=rate, div_yield=div_yield, dt=dt, sqrt_dt=sqrt_dt,
        rho=rho, rho_bar=rho_bar, kappa=kappa, theta=theta, xi=xi,
    )
    if term is None:

        def step_args(t: jax.Array) -> dict[str, jax.Array]:
            return step_consts

    else:
        _, rs, qs = term.shapes(timesteps)
        rate_arr = rate * jnp.asarray(rs, dtype)
        div_arr = div_yield * jnp.asarray(qs, dtype)

        def step_args(t: jax.Array) -> dict[str, jax.Array]:
            return dict(step_consts, rate=rate_arr[t], div_yield=div_arr[t])

    variance = payoff == PayoffKind.VARIANCE_SWAP
    forward_start = payoff == PayoffKind.FORWARD_START
    if forward_start:
        assert forward_start_step is not None  # enforced by build_simulation_params

    if payoff == PayoffKind.CLIQUET:
        assert (  # enforced by build_simulation_params
            cliquet_reset_every is not None
            and cliquet_floor is not None
            and cliquet_cap is not None
        )
        # the variance state couples periods, so the walk is the full path;
        # the carry tracks the period-start ln S and the clipped accumulator
        floor_c = jnp.asarray(cliquet_floor, dtype)
        cap_c = jnp.asarray(cliquet_cap, dtype)

        def body_cq(
            carry: tuple[jax.Array, jax.Array, jax.Array, jax.Array], t: jax.Array
        ) -> tuple[tuple[jax.Array, jax.Array, jax.Array, jax.Array], None]:
            logx, v, start, acc = carry
            z_v = component_normals(t, 0)
            z_orth = component_normals(t, 1)
            logx, v = heston_euler_step(logx, v, z_v, z_orth, **step_args(t))
            boundary = (t + 1) % cliquet_reset_every == 0
            clipped = jnp.clip(jnp.exp(logx - start) - 1.0, floor_c, cap_c)
            acc = jnp.where(boundary, acc + clipped, acc)
            start = jnp.where(boundary, logx, start)
            return (logx, v, start, acc), None

        shape_cq = (rows, cols)
        log0_cq = jnp.full(shape_cq, 0.0, dtype) + jnp.log(spot)
        vinit_cq = jnp.full(shape_cq, 1.0, dtype) * v0
        (_, _, _, acc_cq), _ = jax.lax.scan(
            body_cq,
            (log0_cq, vinit_cq, log0_cq, jnp.zeros(shape_cq, dtype)),
            jnp.arange(timesteps),
        )
        return acc_cq

    def body(
        carry: tuple[jax.Array, jax.Array, jax.Array], t: jax.Array
    ) -> tuple[tuple[jax.Array, jax.Array, jax.Array], None]:
        logx, v, acc = carry
        z_v = component_normals(t, 0)
        z_orth = component_normals(t, 1)
        prev = logx
        logx, v = heston_euler_step(logx, v, z_v, z_orth, **step_args(t))
        if track_extreme:
            acc = extreme_fn(acc, logx)
        elif variance:
            inc = logx - prev
            acc = acc + inc * inc
        elif forward_start:
            # the variance state couples S_m to the tail, so Heston walks
            # the full path and captures ln S_m (state after step m−1)
            acc = jnp.where(t == forward_start_step - 1, logx, acc)
        elif payoff not in (PayoffKind.TERMINAL, PayoffKind.DIGITAL):
            acc = acc + (logx if geometric else jnp.exp(logx))
        return (logx, v, acc), None

    shape = (rows, cols)
    log0 = jnp.full(shape, 0.0, dtype) + jnp.log(spot)
    vinit = jnp.full(shape, 1.0, dtype) * v0
    (logx, _, acc), _ = jax.lax.scan(
        body, (log0, vinit, log0 if track_extreme else jnp.zeros(shape, dtype)),
        jnp.arange(timesteps),
    )
    if barrier:
        assert barrier_rel is not None
        strike = contract[1].astype(dtype)
        level = jnp.log(spot * jnp.asarray(barrier_rel, dtype))
        knocked = acc >= level if up else acc <= level
        return jnp.where(knocked, strike, jnp.exp(logx))
    if lookback:
        strike = contract[1].astype(dtype)
        return lookback_underlier(payoff, strike, jnp.exp(acc), jnp.exp(logx))
    if payoff == PayoffKind.DIGITAL:
        # same bit stream as TERMINAL: u = K + sign(S_T − K) prices both
        # cash-or-nothing channels (ops/gbm.py::PayoffKind.DIGITAL)
        strike = contract[1].astype(dtype)
        return strike + jnp.sign(jnp.exp(logx) - strike)
    if payoff == PayoffKind.TERMINAL:
        return jnp.exp(logx)
    if variance:
        return acc / maturity  # annualized realized variance (PayoffKind)
    if forward_start:
        return spot * jnp.exp(logx - acc)  # spot·S_T/S_m (PayoffKind)
    mean = acc / n
    return jnp.exp(mean) if geometric else mean


def heston_expected_underlier_mean(
    contract: jax.Array,
    *,
    timesteps: int,
    payoff: PayoffKind,
    dtype: jnp.dtype,
    forward_start_step: int | None = None,
    term: "object | None" = None,
) -> jax.Array | None:
    """Analytic E[underlier], or None when no closed form exists.

    E[S_t] = S·e^{(r−q)t} holds under Heston (the discounted spot is a
    martingale), so TERMINAL and ASIAN_ARITHMETIC reuse the GBM formulas;
    the geometric average's mean has no usable closed form — callers must
    not request MEAN normalization for it (enforced at config build time).
    With rate/div ``term`` curves the drift integral is the per-step
    cumulative sum (exact: the full-truncation step keeps
    E[e^{Δln S}|F] = e^{(r_t−q_t)dt}); flat curves take the flat formulas
    bit-for-bit.
    """
    spot, _, maturity, rate, div_yield = (contract[i].astype(dtype) for i in range(5))
    if term is not None and term.is_flat():
        term = None
    n = jnp.asarray(timesteps, dtype)
    dt = maturity / n
    if term is not None:
        _, rs, qs = term.shapes(timesteps)
        rsa, qsa = (jnp.asarray(s, dtype) for s in (rs, qs))
        lin = (rate * rsa - div_yield * qsa) * dt
        cum_lin = jnp.cumsum(lin)
        if payoff == PayoffKind.TERMINAL:
            return spot * jnp.exp(cum_lin[-1])
        if payoff == PayoffKind.ASIAN_ARITHMETIC:
            return spot * jnp.mean(jnp.exp(cum_lin))
        if payoff == PayoffKind.FORWARD_START:
            assert forward_start_step is not None
            tail = jnp.arange(timesteps) >= forward_start_step
            return spot * jnp.exp(jnp.sum(jnp.where(tail, lin, 0.0)))
        return None
    if payoff == PayoffKind.TERMINAL:
        return spot * jnp.exp((rate - div_yield) * maturity)
    if payoff == PayoffKind.ASIAN_ARITHMETIC:
        g = jnp.exp((rate - div_yield) * dt)
        series = jnp.where(jnp.abs(g - 1.0) < 1e-12, n, g * (g**n - 1.0) / (g - 1.0))
        return spot * series / n
    if payoff == PayoffKind.FORWARD_START:
        # the full-truncation step preserves E[e^{Δln S}|F] = e^{(r−q)dt}
        # exactly, so E[S_T/S_m] = e^{(r−q)(T−t_m)} like under GBM
        assert forward_start_step is not None
        n_tail = jnp.asarray(timesteps - forward_start_step, dtype)
        return spot * jnp.exp((rate - div_yield) * dt * n_tail)
    return None


# --------------------------------------------------------------------------
# Semi-analytic oracle (host-side, float64 numpy — test/validation path)
# --------------------------------------------------------------------------


def heston_char_fn(
    u: np.ndarray,
    *,
    spot: float,
    maturity: float,
    rate: float,
    div_yield: float,
    v0: float,
    kappa: float,
    theta: float,
    xi: float,
    rho: float,
) -> np.ndarray:
    """phi(u) = E[exp(i·u·ln S_T)], the 'little Heston trap' branch."""
    u = np.asarray(u, dtype=np.complex128)
    iu = 1j * u
    alpha = kappa - rho * xi * iu
    d = np.sqrt(alpha * alpha + xi * xi * (iu + u * u))
    g = (alpha - d) / (alpha + d)
    exp_dt = np.exp(-d * maturity)
    log_s_fwd = np.log(spot) + (rate - div_yield) * maturity
    c_term = (kappa * theta / (xi * xi)) * (
        (alpha - d) * maturity - 2.0 * np.log((1.0 - g * exp_dt) / (1.0 - g))
    )
    d_term = ((alpha - d) / (xi * xi)) * (1.0 - exp_dt) / (1.0 - g * exp_dt)
    return np.exp(iu * log_s_fwd + c_term + v0 * d_term)


def heston_call_price(
    *,
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    v0: float,
    kappa: float,
    theta: float,
    xi: float,
    rho: float,
    integration_points: int = 2048,
    u_max: float = 200.0,
) -> tuple[float, float]:
    """(call, put) by Fourier inversion of the characteristic function.

    P_j = 1/2 + (1/pi) ∫₀^∞ Re[e^{−iu·lnK} φ_j(u) / (iu)] du with
    φ₂ = φ and φ₁(u) = φ(u − i)/φ(−i); Gauss-Legendre on (0, u_max].
    """
    params = dict(
        spot=spot, maturity=maturity, rate=rate, div_yield=div_yield,
        v0=v0, kappa=kappa, theta=theta, xi=xi, rho=rho,
    )
    nodes, weights = np.polynomial.legendre.leggauss(integration_points)
    u = 0.5 * u_max * (nodes + 1.0)
    w = 0.5 * u_max * weights
    ln_k = np.log(strike)

    phi = heston_char_fn(u, **params)
    phi_shift = heston_char_fn(u - 1j, **params)
    phi_minus_i = heston_char_fn(np.array([-1j]), **params)[0]

    integrand_2 = np.real(np.exp(-1j * u * ln_k) * phi / (1j * u))
    integrand_1 = np.real(np.exp(-1j * u * ln_k) * phi_shift / (1j * u * phi_minus_i))
    p1 = 0.5 + (w @ integrand_1) / np.pi
    p2 = 0.5 + (w @ integrand_2) / np.pi

    df_r = np.exp(-rate * maturity)
    df_q = np.exp(-div_yield * maturity)
    call = float(spot * df_q * p1 - strike * df_r * p2)
    put = float(call - df_q * spot + df_r * strike)  # parity
    return call, put

