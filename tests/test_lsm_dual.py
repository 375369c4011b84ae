"""Andersen-Broadie dual bound tests (solvers/lsm_dual.py).

Oracles: the ADI Ikonen-Toivanen LCP price (independent grid route), the
European CF price for the never-exercise degenerate case, and the internal
sandwich consistency lower <= upper.  The reference framework has no
American MC machinery at all (its American routes are grid projections,
src/cpp/solvers/heston_pde.hpp:143-150).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models.heston import HestonParams, price_accurate
from pde_tpu.solvers import heston_adi
from pde_tpu.solvers.lsm_dual import dual_upper_bound

PARAMS = HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
S0, R, T, K = 100.0, 0.05, 1.0, 100.0
KEY = jax.random.PRNGKey(7)


def _run(strike=K, **kw):
    defaults = dict(rate=R, is_call=False, n_steps=10, n_reg_paths=1 << 14,
                    n_outer=512, n_inner=32)
    defaults.update(kw)
    lo, sel, up, seu = dual_upper_bound(PARAMS, strike, T, S0, KEY, **defaults)
    return float(lo), float(sel), float(up), float(seu)


class TestDualBound:
    def test_sandwich_orders(self):
        lo, sel, up, seu = _run()
        assert up + 4 * seu >= lo - 4 * sel
        # quadratic basis on a vanilla put: the duality gap is small
        assert up - lo < 0.04 * lo + 4 * (sel + seu), (lo, up)

    def test_brackets_adi_lcp(self):
        """The Bermudan-10 sandwich must bracket the continuous-exercise ADI
        price from below (Bermudan <= American) while the upper bound plus
        the Bermudan gap allowance covers it."""
        hp = heston_adi.HestonPDEParams(
            kappa=PARAMS.kappa, theta=PARAMS.theta, sigma=PARAMS.sigma,
            rho=PARAMS.rho, v0=PARAMS.v0, r=R, q=0.0, T=T, K=K,
            is_call=False, american=True, american_method="it_lcp",
        )
        adi = float(heston_adi.solve(hp, S0).price)
        lo, sel, up, seu = _run()
        assert lo - 4 * sel <= adi * 1.005
        # upper bounds the Bermudan-10 value; allow the Bermudan-vs-
        # continuous gap (~1%) plus MC noise on the upside check
        assert up + 4 * seu >= adi * 0.985, (lo, up, adi)

    def test_call_no_dividend_collapses_to_european(self):
        """No dividends: never-exercise is optimal, the policy learns it,
        and BOTH bounds land on the European price."""
        eu = float(np.asarray(price_accurate(PARAMS, K, T, S0, rate=R)))
        lo, sel, up, seu = _run(is_call=True, dividend=0.0)
        assert abs(lo - eu) < 4 * sel + 0.02 * eu
        assert abs(up - eu) < 4 * seu + 0.02 * eu

    def test_more_inner_paths_tighten_upper(self):
        """Inner-sample noise inflates the upper bound; quadrupling
        n_inner must not raise it (up to MC noise)."""
        _, _, up_small, seu_s = _run(n_outer=256, n_inner=8)
        _, _, up_big, seu_b = _run(n_outer=256, n_inner=32)
        assert up_big <= up_small + 4 * (seu_s + seu_b)

    def test_deep_itm_floor(self):
        lo, _, up, seu = _run(strike=140.0)
        assert lo >= 40.0 - 1e-9   # intrinsic floor at t_0
        assert up + 4 * seu >= 40.0


def test_smoke_finite():
    out = dual_upper_bound(PARAMS, K, T, S0, KEY, rate=R, n_steps=4,
                           n_reg_paths=2048, n_outer=64, n_inner=4)
    assert all(np.isfinite(float(x)) for x in out)
