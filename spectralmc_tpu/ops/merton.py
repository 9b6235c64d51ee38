"""Merton jump-diffusion model family — extension beyond the reference.

The reference supports exactly one dynamics (GBM, gbm.py:224-257). This
module adds the canonical jump extension: Merton (1976), where the spot
diffuses as GBM between lognormal jumps arriving at Poisson times,

    dS/S = (r - q - lam*m) dt + vol dW + (e^Y - 1) dN,
    N ~ Poisson(lam t),  Y ~ Normal(jump_mean, jump_std^2),
    m  = E[e^Y] - 1 = exp(jump_mean + jump_std^2/2) - 1,

with the -lam*m compensator keeping the discounted spot a martingale under
the pricing measure. Thematically this is, like Heston, home turf for the
spectrum learner: the model is *defined* by its characteristic function, and
the European price has Merton's exact series representation — each Poisson
count n contributes a Black price at jump-adjusted rate/vol — which is the
oracle here (``merton_call_price``).

Discretization: exact in distribution per step. Over one step dt the log
increment is (r - q - lam*m - vol^2/2) dt + vol sqrt(dt) z_d + J where,
conditional on the Poisson count N ~ Poisson(lam dt), the jump sum J is
Normal(N*jump_mean, N*jump_std^2) = N*jump_mean + jump_std*sqrt(N)*z_j.
No Euler bias exists for path-independent payoffs: the scheme samples the
true transition law (the only discretization effect is the monitoring grid
for path-dependent payoffs, exactly as with GBM's log-Euler).

Determinism: the same key discipline as GBM/Heston — draws addressed by
(contract_key, global row, timestep, component): component 0 the diffusion
normal, component 1 the jump-size normal, component 2 the Poisson count.
Resume is a counter; a mesh shard reproduces exactly the rows it owns
(row_offset). Antithetic pairs mirror BOTH normals and share the partner
row's Poisson counts (negating the Gaussian pair conditional on N is a
valid antithetic transform; the counts are common random numbers).

Pathwise-Greeks note: the Poisson rate is wrapped in ``stop_gradient``
inside the sampler, so ``jax.grad`` through the simulator yields the
fixed-count (envelope) derivative — exact for every field except ``lam``,
whose count-channel sensitivity is not pathwise-differentiable (the count
is discrete). ``ops.greeks.bump_greeks`` measures the full lam Greek under
common random numbers; ``mc_greeks`` documents the same caveat.
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


class MertonContract(BaseModel):
    """One Merton market scenario: the 6 Black-Scholes fields (same order as
    ``BlackScholesContract``) + 3 jump fields."""

    model_config = ConfigDict(frozen=True, extra="forbid")

    spot: float
    strike: float
    maturity: float
    rate: float
    div_yield: float
    vol: float  # diffusion volatility (between jumps)
    lam: float  # jump intensity (expected jumps per year)
    jump_mean: float  # mean of the log jump size Y
    jump_std: float  # std of the log jump size Y

    def as_array(self, dtype: jnp.dtype = jnp.float32) -> jax.Array:
        return jnp.array(
            [
                self.spot,
                self.strike,
                self.maturity,
                self.rate,
                self.div_yield,
                self.vol,
                self.lam,
                self.jump_mean,
                self.jump_std,
            ],
            dtype=dtype,
        )


MERTON_CONTRACT_FIELDS: tuple[str, ...] = tuple(MertonContract.model_fields.keys())
MERTON_CONTRACT_DIM = len(MERTON_CONTRACT_FIELDS)


def validate_merton_contract(c: MertonContract) -> Result[MertonContract, GBMError]:
    for field in ("spot", "strike", "maturity", "vol", "jump_std"):
        if getattr(c, field) <= 0:
            return Failure(
                InvalidContract(field=field, value=getattr(c, field), reason="must be > 0")
            )
    if c.lam < 0:
        return Failure(InvalidContract(field="lam", value=c.lam, reason="must be >= 0"))
    return Success(c)


def merton_component_normals(
    row_keys: jax.Array,
    sign: jax.Array | None,
    t: jax.Array,
    comp: int,
    cols: int,
    dtype: jnp.dtype,
) -> jax.Array:
    """One Gaussian component's draws, keyed (row key, timestep, component).

    THE Merton normal-stream definition (component 0 = diffusion, 1 = jump
    size) — mirrors ``heston_component_normals`` so a future LSMC forward
    pass shares the bit stream by construction. Antithetic flips both
    components (a valid pair conditional on the shared Poisson counts).
    """
    z = jax.vmap(
        lambda k: jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(k, t), comp), (cols,), dtype
        )
    )(row_keys)
    return z if sign is None else sign * z


def merton_jump_counts(
    row_keys: jax.Array,
    t: jax.Array,
    rate_dt: jax.Array,
    cols: int,
    dtype: jnp.dtype,
) -> jax.Array:
    """Poisson jump counts for one step, keyed (row key, timestep, comp=2).

    The rate is ``stop_gradient``-ed: counts are common random numbers for
    pathwise differentiation (see module docstring). Antithetic partners
    share counts automatically — partner rows reuse the first half's keys
    (gbm._row_streams), and no sign applies to a count.
    """
    lam_dt = jax.lax.stop_gradient(rate_dt)
    return jax.vmap(
        lambda k: jax.random.poisson(
            jax.random.fold_in(jax.random.fold_in(k, t), 2), lam_dt, (cols,)
        )
    )(row_keys).astype(dtype)


@partial(
    jax.jit,
    static_argnames=(
        "timesteps", "rows", "cols", "dtype", "payoff", "barrier_rel",
        "antithetic_half", "forward_start_step", "cliquet_reset_every",
        "cliquet_floor", "cliquet_cap", "sampling", "mc_seed", "term",
    ),
)
def simulate_merton_underlier_rows(
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
    """``[rows, cols]`` payoff underliers under exact-transition Merton.

    ``contract`` is the 9-vector of ``MertonContract.as_array``. Barrier
    kinds knock on the discrete spot grid (jumps included — a jump through
    the barrier knocks) and emit strike on knocked paths (the shared
    masked-underlier convention, ops/gbm.py::PayoffKind).

    With ``sampling=SamplingKind.SOBOL_BB`` the DIFFUSION normals come from
    the single-factor Brownian-bridge Sobol net (ops/qmc.py) while the jump
    channel stays pseudo — hybrid RQMC: the net stratifies the Brownian
    skeleton (where most of the variance lives at moderate ``lam``), and the
    jump channel's independence keeps the estimator unbiased.
    """
    (spot, _, maturity, rate, div_yield, vol, lam, jump_mean, jump_std) = (
        contract[i].astype(dtype) for i in range(9)
    )
    n = jnp.asarray(timesteps, dtype)
    dt = maturity / n
    sqrt_dt = jnp.sqrt(dt)
    # m = E[e^Y] - 1; the -lam*m compensator keeps E[S_t] = S e^{(r-q)t}
    m = jnp.exp(jump_mean + 0.5 * jump_std * jump_std) - 1.0
    drift = (rate - div_yield - lam * m - 0.5 * vol * vol) * dt
    lam_dt = lam * dt
    # round 4: piecewise-constant rate/div/vol curves (gbm.TermStructure
    # semantics; the vol curve scales the DIFFUSION leg only — jumps keep
    # their contract law, so the exact series oracle holds at the effective
    # flat parameters rate*mean(rs), div*mean(qs), vol*rms(vs)). Flat terms
    # are normalized to None — bit-identical program.
    if term is not None and term.is_flat():
        term = None
    if term is None:

        def drift_at(t: jax.Array) -> jax.Array:
            return drift

        def vol_at(t: jax.Array) -> jax.Array:
            return vol

    else:
        vs_t, rs_t, qs_t = term.shapes(timesteps)
        vol_arr = vol * jnp.asarray(vs_t, dtype)
        drift_arr = (
            rate * jnp.asarray(rs_t, dtype)
            - div_yield * jnp.asarray(qs_t, dtype)
            - lam * m
            - 0.5 * vol_arr * vol_arr
        ) * dt

        def drift_at(t: jax.Array) -> jax.Array:
            return drift_arr[t]

        def vol_at(t: jax.Array) -> jax.Array:
            return vol_arr[t]

    from spectralmc_tpu.ops.gbm import SamplingKind, _row_streams

    row_keys, sign = _row_streams(
        contract_key,
        rows=rows,
        row_offset=row_offset,
        antithetic_half=antithetic_half,
        dtype=dtype,
    )

    if sampling == SamplingKind.SOBOL_BB:
        from spectralmc_tpu.ops.qmc import qmc_effective_normals

        assert antithetic_half is None  # enforced by build_simulation_params
        zq = qmc_effective_normals(
            contract_key,
            timesteps=timesteps,
            rows=rows,
            cols=cols,
            dtype=dtype,
            mc_seed=mc_seed,
            row_offset=row_offset,
        )

        def diffusion_normals(t: jax.Array) -> jax.Array:
            return zq[t]

    else:

        def diffusion_normals(t: jax.Array) -> jax.Array:
            return merton_component_normals(row_keys, sign, t, 0, cols, dtype)

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

    variance = payoff == PayoffKind.VARIANCE_SWAP

    if payoff == PayoffKind.FORWARD_START:
        assert forward_start_step is not None  # enforced by build_simulation_params

        # exact transitions make the tail increments independent of S_m, so
        # the ratio S_T/S_m integrates steps m..N−1 only (ops/gbm.py)
        def body_f(acc: jax.Array, t: jax.Array) -> tuple[jax.Array, None]:
            z_d = diffusion_normals(t)
            z_j = merton_component_normals(row_keys, sign, t, 1, cols, dtype)
            counts = merton_jump_counts(row_keys, t, lam_dt, cols, dtype)
            jump = counts * jump_mean + jump_std * jnp.sqrt(counts) * z_j
            return acc + (drift_at(t) + vol_at(t) * sqrt_dt * z_d + jump), None

        acc_f, _ = jax.lax.scan(
            body_f,
            jnp.zeros((rows, cols), dtype),
            jnp.arange(forward_start_step, timesteps),
        )
        return spot * jnp.exp(acc_f)

    if payoff == PayoffKind.CLIQUET:
        assert (  # enforced by build_simulation_params
            cliquet_reset_every is not None
            and cliquet_floor is not None
            and cliquet_cap is not None
        )
        # exact transitions make the periods independent and state-free in
        # ln S (ops/gbm.py::PayoffKind.CLIQUET): carry only the running
        # period log-return and the clipped accumulator
        floor_c = jnp.asarray(cliquet_floor, dtype)
        cap_c = jnp.asarray(cliquet_cap, dtype)

        def body_cq(
            carry: tuple[jax.Array, jax.Array], t: jax.Array
        ) -> tuple[tuple[jax.Array, jax.Array], None]:
            per, acc = carry
            z_d = diffusion_normals(t)
            z_j = merton_component_normals(row_keys, sign, t, 1, cols, dtype)
            counts = merton_jump_counts(row_keys, t, lam_dt, cols, dtype)
            jump = counts * jump_mean + jump_std * jnp.sqrt(counts) * z_j
            per = per + drift_at(t) + vol_at(t) * sqrt_dt * z_d + jump
            boundary = (t + 1) % cliquet_reset_every == 0
            clipped = jnp.clip(jnp.exp(per) - 1.0, floor_c, cap_c)
            acc = jnp.where(boundary, acc + clipped, acc)
            per = jnp.where(boundary, 0.0, per)
            return (per, acc), None

        zeros_cq = jnp.zeros((rows, cols), dtype)
        (_, acc_cq), _ = jax.lax.scan(
            body_cq, (zeros_cq, zeros_cq), jnp.arange(timesteps)
        )
        return acc_cq

    def body(
        carry: tuple[jax.Array, jax.Array], t: jax.Array
    ) -> tuple[tuple[jax.Array, jax.Array], None]:
        logx, acc = carry
        z_d = diffusion_normals(t)
        z_j = merton_component_normals(row_keys, sign, t, 1, cols, dtype)
        counts = merton_jump_counts(row_keys, t, lam_dt, cols, dtype)
        # conditional on the count, the jump sum is exactly Gaussian
        jump = counts * jump_mean + jump_std * jnp.sqrt(counts) * z_j
        if variance:
            # summed first so the increment is available; the non-variance
            # branch keeps the original association (bit-stream stability)
            inc = drift_at(t) + vol_at(t) * sqrt_dt * z_d + jump
            logx = logx + inc
            acc = acc + inc * inc
            return (logx, acc), None
        logx = logx + drift_at(t) + vol_at(t) * sqrt_dt * z_d + jump
        if track_extreme:
            acc = extreme_fn(acc, logx)
        elif payoff not in (PayoffKind.TERMINAL, PayoffKind.DIGITAL):
            acc = acc + (logx if geometric else jnp.exp(logx))
        return (logx, acc), None

    shape = (rows, cols)
    log0 = jnp.full(shape, 0.0, dtype) + jnp.log(spot)
    (logx, acc), _ = jax.lax.scan(
        body, (log0, log0 if track_extreme else jnp.zeros(shape, dtype)),
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
    mean = acc / n
    return jnp.exp(mean) if geometric else mean


def merton_expected_underlier_mean(
    contract: jax.Array,
    *,
    timesteps: int,
    payoff: PayoffKind,
    dtype: jnp.dtype,
    forward_start_step: int | None = None,
    cliquet_reset_every: int | None = None,
    cliquet_floor: float | None = None,
    cliquet_cap: float | None = None,
    term: "object | None" = None,
) -> jax.Array | None:
    """Analytic E[underlier], or None when no closed form exists.

    The compensator makes the discounted spot a martingale, so
    E[S_t] = S·e^{(r−q)t} exactly as under GBM/Heston — TERMINAL and
    ASIAN_ARITHMETIC reuse those formulas; the geometric average's mean has
    no usable closed form (enforced at config build time).
    """
    spot, _, maturity, rate, div_yield = (contract[i].astype(dtype) for i in range(5))
    if term is not None and term.is_flat():
        term = None
    n = jnp.asarray(timesteps, dtype)
    dt = maturity / n
    if term is not None:
        # curve-aware means (round 4): the compensator still makes the
        # discounted spot a martingale step by step, so the linear-drift
        # integrals are per-step cumulative sums; the vol curve scales the
        # DIFFUSION variance only. Each formula below is the flat one with
        # sums replacing products of identical factors — exact, not
        # approximate.
        vs_t, rs_t, qs_t = term.shapes(timesteps)
        vsa = jnp.asarray(vs_t, dtype)
        lin = (rate * jnp.asarray(rs_t, dtype) - div_yield * jnp.asarray(qs_t, dtype)) * dt
        cum_lin = jnp.cumsum(lin)
        if payoff == PayoffKind.TERMINAL:
            return spot * jnp.exp(cum_lin[-1])
        if payoff == PayoffKind.ASIAN_ARITHMETIC:
            return spot * jnp.mean(jnp.exp(cum_lin))
        if payoff == PayoffKind.FORWARD_START:
            assert forward_start_step is not None
            tail = jnp.arange(timesteps) >= forward_start_step
            return spot * jnp.exp(jnp.sum(jnp.where(tail, lin, 0.0)))
        vol_m, lam_m, mu_jt, sd_jt = (contract[i].astype(dtype) for i in (5, 6, 7, 8))
        m_t = jnp.exp(mu_jt + 0.5 * sd_jt * sd_jt) - 1.0
        vol_sq_dt = (vol_m * vsa) ** 2 * dt  # per-step diffusion variance
        a_dt = lin - lam_m * m_t * dt - 0.5 * vol_sq_dt  # per-step log-drift
        if payoff == PayoffKind.VARIANCE_SWAP:
            mean_inc = a_dt + lam_m * dt * mu_jt
            var_inc = vol_sq_dt + lam_m * dt * (sd_jt * sd_jt + mu_jt * mu_jt)
            return jnp.sum(var_inc + mean_inc * mean_inc) / maturity
        if payoff == PayoffKind.CLIQUET:
            from jax.scipy.special import gammaln

            from spectralmc_tpu.ops.gbm import expected_clipped_lognormal_return

            assert (
                cliquet_reset_every is not None
                and cliquet_floor is not None
                and cliquet_cap is not None
            )
            periods = timesteps // cliquet_reset_every
            mu_p = jnp.sum(a_dt.reshape(periods, cliquet_reset_every), axis=1)
            s2_p = jnp.sum(vol_sq_dt.reshape(periods, cliquet_reset_every), axis=1)
            lam_p = lam_m * dt * jnp.asarray(cliquet_reset_every, dtype)
            p = jnp.arange(64, dtype=dtype)
            log_lam_p = jnp.log(jnp.maximum(lam_p, jnp.finfo(dtype).tiny))
            log_w = -lam_p + p * log_lam_p - gammaln(p + 1.0)
            w = jnp.where(lam_p > 0.0, jnp.exp(log_w), jnp.where(p == 0.0, 1.0, 0.0))
            mu_k = mu_p[:, None] + p[None, :] * mu_jt
            s_k = jnp.sqrt(s2_p[:, None] + p[None, :] * sd_jt * sd_jt)
            e_clip = expected_clipped_lognormal_return(
                mu_k, s_k, jnp.asarray(cliquet_floor, dtype), jnp.asarray(cliquet_cap, dtype)
            )
            return jnp.sum(w[None, :] * e_clip)
        if payoff == PayoffKind.DIGITAL:
            from jax.scipy.special import erf, gammaln

            strike_d = contract[1].astype(dtype)
            lam_t = lam_m * maturity
            k = jnp.arange(64, dtype=dtype)
            log_lam_t = jnp.log(jnp.maximum(lam_t, jnp.finfo(dtype).tiny))
            log_w = -lam_t + k * log_lam_t - gammaln(k + 1.0)
            w = jnp.where(lam_t > 0.0, jnp.exp(log_w), jnp.where(k == 0.0, 1.0, 0.0))
            drift_tot = jnp.sum(a_dt)
            var_k = jnp.sum(vol_sq_dt) + k * sd_jt * sd_jt
            d_k = (jnp.log(spot / strike_d) + drift_tot + k * mu_jt) / jnp.sqrt(var_k)
            prob_up = jnp.sum(
                w * 0.5 * (1.0 + erf(d_k / jnp.sqrt(jnp.asarray(2.0, dtype))))
            )
            return strike_d + 2.0 * prob_up - 1.0
        return None
    if payoff == PayoffKind.TERMINAL:
        return spot * jnp.exp((rate - div_yield) * maturity)
    if payoff == PayoffKind.ASIAN_ARITHMETIC:
        g = jnp.exp((rate - div_yield) * dt)
        series = jnp.where(jnp.abs(g - 1.0) < 1e-12, n, g * (g**n - 1.0) / (g - 1.0))
        return spot * series / n
    if payoff == PayoffKind.VARIANCE_SWAP:
        # Exact: the per-step log-increment X = a·dt' + σ√dt'·Z + Σ^P Y with
        # P ~ Poisson(λdt'), Y ~ N(μ_J, σ_J²) has E[X] = a·dt' + λdt'·μ_J and
        # Var[X] = σ²dt' + λdt'(σ_J² + μ_J²) (law of total variance), so
        # E[RV] = N·(Var[X] + E[X]²)/T under the exact-transition sampler.
        vol_v, lam_v, mu_j, sd_j = (contract[i].astype(dtype) for i in (5, 6, 7, 8))
        m_v = jnp.exp(mu_j + 0.5 * sd_j * sd_j) - 1.0
        a_dt = (rate - div_yield - lam_v * m_v - 0.5 * vol_v * vol_v) * dt
        mean_inc = a_dt + lam_v * dt * mu_j
        var_inc = vol_v * vol_v * dt + lam_v * dt * (sd_j * sd_j + mu_j * mu_j)
        return n * (var_inc + mean_inc * mean_inc) / maturity
    if payoff == PayoffKind.FORWARD_START:
        # the compensator keeps each growth factor's mean at e^{(r−q)dt}, so
        # E[S_T/S_m] = e^{(r−q)(T−t_m)} exactly (as under GBM/Heston)
        assert forward_start_step is not None
        n_tail = jnp.asarray(timesteps - forward_start_step, dtype)
        return spot * jnp.exp((rate - div_yield) * dt * n_tail)
    if payoff == PayoffKind.CLIQUET:
        # Exact: each period's log-return, conditional on its total jump
        # count P ~ Poisson(λ·k·dt), is N(μ_p + P·μ_J, σ²·k·dt + P·σ_J²),
        # so E[clip(R)] is the Poisson-weighted series of the clipped-
        # lognormal closed form (64 static terms — the digital precedent;
        # the tail beyond is < 1e-15 for λ·T ≤ 20) and E[u] = periods·E[clip].
        from jax.scipy.special import gammaln

        from spectralmc_tpu.ops.gbm import expected_clipped_lognormal_return

        assert (
            cliquet_reset_every is not None
            and cliquet_floor is not None
            and cliquet_cap is not None
        )
        vol_c, lam_c, mu_j, sd_j = (contract[i].astype(dtype) for i in (5, 6, 7, 8))
        m_c = jnp.exp(mu_j + 0.5 * sd_j * sd_j) - 1.0
        k_steps = jnp.asarray(cliquet_reset_every, dtype)
        periods = timesteps // cliquet_reset_every
        t_p = dt * k_steps  # period length in years
        lam_p = lam_c * t_p
        mu_p = (rate - div_yield - lam_c * m_c - 0.5 * vol_c * vol_c) * t_p
        p = jnp.arange(64, dtype=dtype)
        log_lam_p = jnp.log(jnp.maximum(lam_p, jnp.finfo(dtype).tiny))
        log_w = -lam_p + p * log_lam_p - gammaln(p + 1.0)
        w = jnp.where(lam_p > 0.0, jnp.exp(log_w), jnp.where(p == 0.0, 1.0, 0.0))
        mu_k = mu_p + p * mu_j
        s_k = jnp.sqrt(vol_c * vol_c * t_p + p * sd_j * sd_j)
        e_clip = expected_clipped_lognormal_return(
            mu_k, s_k, jnp.asarray(cliquet_floor, dtype), jnp.asarray(cliquet_cap, dtype)
        )
        return jnp.asarray(periods, dtype) * jnp.sum(w * e_clip)
    if payoff == PayoffKind.DIGITAL:
        # E[u] = K + 2·P(S_T>K) − 1, exact: the per-step exact transitions
        # compose to the continuous Merton terminal law, so conditional on
        # N = n total jumps (Poisson(λT) — the plain intensity; the λ(1+m)
        # tilt belongs to the S·N(d1) term of the price series, not to the
        # probability) ln S_T is Gaussian and
        #   P(S_T>K) = Σ_n e^{−λT}(λT)^n/n! · N(d_n),
        #   d_n = (ln(S0/K) + (r−q−λm−σ²/2)T + n·μ_J) / sqrt(σ²T + n·σ_J²).
        # 64 static terms: the Poisson tail beyond is < 1e-15 for λT ≤ 20
        # (far past any calibrated desk intensity).
        from jax.scipy.special import erf, gammaln

        strike_d, vol_d, lam_d, mu_j, sd_j = (
            contract[i].astype(dtype) for i in (1, 5, 6, 7, 8)
        )
        m = jnp.exp(mu_j + 0.5 * sd_j * sd_j) - 1.0
        lam_t = lam_d * maturity
        k = jnp.arange(64, dtype=dtype)
        # log Poisson weights; guard λT = 0 (k·log 0 → −inf·0 at k = 0)
        log_lam_t = jnp.log(jnp.maximum(lam_t, jnp.finfo(dtype).tiny))
        log_w = -lam_t + k * log_lam_t - gammaln(k + 1.0)
        w = jnp.where(lam_t > 0.0, jnp.exp(log_w), jnp.where(k == 0.0, 1.0, 0.0))
        drift = (rate - div_yield - lam_d * m - 0.5 * vol_d * vol_d) * maturity
        var_k = vol_d * vol_d * maturity + k * sd_j * sd_j
        d_k = (jnp.log(spot / strike_d) + drift + k * mu_j) / jnp.sqrt(var_k)
        prob_up = jnp.sum(w * 0.5 * (1.0 + erf(d_k / jnp.sqrt(jnp.asarray(2.0, dtype)))))
        return strike_d + 2.0 * prob_up - 1.0
    return None


# --------------------------------------------------------------------------
# Exact series oracle (host-side, float64 numpy — test/validation path)
# --------------------------------------------------------------------------


def merton_call_price(
    *,
    spot: float,
    strike: float,
    maturity: float,
    rate: float,
    div_yield: float,
    vol: float,
    lam: float,
    jump_mean: float,
    jump_std: float,
    max_terms: int | None = None,
) -> tuple[float, float]:
    """(call, put) by Merton's (1976) exact series.

    Conditional on N = n jumps, ln S_T is Gaussian, so the price is a
    Poisson mixture of Black prices:

        price = sum_n e^{-lam' T} (lam' T)^n / n! · Black(S, K, T, r_n, q, s_n)

    with lam' = lam (1 + m), m = exp(jump_mean + jump_std^2/2) - 1,
    s_n^2 = vol^2 + n jump_std^2 / T and
    r_n = r - lam m + n ln(1 + m) / T. The series is truncated where the
    Poisson tail is negligible (lam'T + 12 sqrt(lam'T) + 24 terms); at
    lam = 0 the single surviving term is the plain Black price (the GBM
    identity tests pin this).
    """
    from math import erf

    m = float(np.exp(jump_mean + 0.5 * jump_std * jump_std) - 1.0)
    lam_p = lam * (1.0 + m)
    mean_terms = lam_p * maturity
    if mean_terms <= 0.0:
        n_terms = 1  # lam = 0: the n = 0 term IS the Black price
    elif max_terms is not None:
        n_terms = max_terms
    else:
        n_terms = int(np.ceil(mean_terms + 12.0 * np.sqrt(max(mean_terms, 1.0)))) + 24

    def _ncdf(x: float) -> float:
        return 0.5 * (1.0 + erf(x / np.sqrt(2.0)))

    def _black_call(s: float, k: float, t: float, r: float, q: float, v: float) -> float:
        fwd = s * np.exp((r - q) * t)
        df = np.exp(-r * t)
        tv = v * np.sqrt(t)
        d1 = (np.log(fwd / k) + 0.5 * tv * tv) / tv
        d2 = d1 - tv
        return float(df * (fwd * _ncdf(d1) - k * _ncdf(d2)))

    log_weight = -mean_terms  # ln of e^{-lam'T} (lam'T)^n / n!, built iteratively
    call = 0.0
    ln1m = float(np.log1p(m))
    for n_jumps in range(n_terms):
        if n_jumps > 0:
            log_weight += float(np.log(mean_terms)) - float(np.log(n_jumps))
        weight = float(np.exp(log_weight))
        s_n = float(np.sqrt(vol * vol + n_jumps * jump_std * jump_std / maturity))
        r_n = rate - lam * m + n_jumps * ln1m / maturity
        call += weight * _black_call(spot, strike, maturity, r_n, div_yield, s_n)
    df_r = float(np.exp(-rate * maturity))
    df_q = float(np.exp(-div_yield * maturity))
    put = call - df_q * spot + df_r * strike  # parity (compensated martingale)
    return call, put
