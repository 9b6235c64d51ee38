"""American/Bermudan pricing via Longstaff–Schwartz (extension).

Oracles: a Bermudan-aware CRR tree restricted to the SAME exercise grid
(sharp — no continuous-exercise slop), and the exact no-early-exercise
identities (r=0 puts, q=0 calls equal their European counterparts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralmc_tpu.ops.american import bermudan_tree_price, lsmc_cashflows, lsmc_price
from spectralmc_tpu.ops.analytic import black_scholes_price
from spectralmc_tpu.ops.greeks import OptionSide
from tests.helpers.factories import make_contract

PATHS = 65536


def test_american_put_matches_bermudan_tree() -> None:
    """Deep ITM-prone put (high strike): LSMC vs the same-grid tree."""
    c = make_contract(spot=100.0, strike=110.0, vol=0.25, rate=0.05, div_yield=0.0)
    n = 16
    result = lsmc_price(
        jax.random.PRNGKey(7), c, timesteps=n, paths=PATHS, option=OptionSide.PUT
    )
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=n, option="put",
    )
    # LSMC carries a small regression bias beyond the MC error; gate at
    # max(4 SE, 0.5% of price)
    tol = max(4.0 * result.std_error, 0.005 * tree)
    assert result.price == pytest.approx(tree, abs=tol), (
        f"lsmc={result.price} tree={tree} se={result.std_error}"
    )


def test_early_exercise_premium_positive_and_ordered() -> None:
    """American >= European on the same paths; the premium grows with the
    interest rate (the put's early-exercise driver)."""
    premiums = []
    for rate in (0.02, 0.08):
        c = make_contract(strike=105.0, rate=rate, div_yield=0.0)
        r = lsmc_price(jax.random.PRNGKey(3), c, timesteps=16, paths=PATHS)
        assert r.price >= r.european - 4.0 * r.std_error
        premiums.append(r.price - r.european)
    assert premiums[1] > premiums[0] > 0.0, premiums


def test_r_zero_put_equals_european() -> None:
    """r = 0: early exercise of a put is never optimal, so the Bermudan
    price equals the European (Black) price."""
    c = make_contract(rate=0.0, div_yield=0.0)
    r = lsmc_price(jax.random.PRNGKey(11), c, timesteps=12, paths=PATHS)
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).put
    )
    assert r.price == pytest.approx(bs, abs=max(4.0 * r.std_error, 0.005 * bs))
    # the estimated premium itself is ~zero
    assert abs(r.price - r.european) < max(4.0 * r.std_error, 0.005 * bs)


def test_q_zero_call_equals_european() -> None:
    """q = 0: an American call is never exercised early (Merton)."""
    c = make_contract(rate=0.05, div_yield=0.0)
    r = lsmc_price(
        jax.random.PRNGKey(13), c, timesteps=12, paths=PATHS, option=OptionSide.CALL
    )
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).call
    )
    assert r.price == pytest.approx(bs, abs=max(4.0 * r.std_error, 0.005 * bs))


def test_dividend_call_has_premium() -> None:
    """With a fat dividend yield the American call IS worth more."""
    c = make_contract(strike=95.0, rate=0.02, div_yield=0.08, maturity=2.0)
    r = lsmc_price(
        jax.random.PRNGKey(17), c, timesteps=16, paths=PATHS, option=OptionSide.CALL
    )
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=16, option="call",
    )
    assert r.price - r.european > 2.0 * r.std_error  # real premium
    tol = max(4.0 * r.std_error, 0.005 * tree)
    assert r.price == pytest.approx(tree, abs=tol)


def test_cashflows_deterministic_and_bounded() -> None:
    c = make_contract(strike=105.0)
    arr = c.as_array(jnp.float32)
    kwargs = dict(timesteps=8, paths=4096, dtype=jnp.float32, option=OptionSide.PUT)
    a, term_a = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    b, _ = lsmc_cashflows(jax.random.PRNGKey(1), arr, **kwargs)
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0.0).all()
    assert a.max() <= c.strike  # a put never pays more than K
    assert np.asarray(term_a).shape == (4096,)


def test_tree_oracle_converges_to_black_for_european_grid() -> None:
    """exercise_dates=1 makes the tree European; it must hit Black."""
    c = make_contract()
    tree = bermudan_tree_price(
        spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
        div_yield=c.div_yield, vol=c.vol, exercise_dates=1, tree_steps=4000,
        option="put",
    )
    bs = float(
        black_scholes_price(c.spot, c.strike, c.maturity, c.rate, c.div_yield, c.vol).put
    )
    assert tree == pytest.approx(bs, rel=2e-3)


def test_more_exercise_dates_never_cheapen() -> None:
    """Bermudan value is monotone in exercise opportunities (tree oracle)."""
    c = make_contract(strike=110.0, rate=0.05, div_yield=0.0)
    values = [
        bermudan_tree_price(
            spot=c.spot, strike=c.strike, maturity=c.maturity, rate=c.rate,
            div_yield=c.div_yield, vol=c.vol, exercise_dates=k, option="put",
        )
        for k in (1, 4, 16)
    ]
    assert values[0] <= values[1] <= values[2]
