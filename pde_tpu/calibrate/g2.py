"""G2++ (a, b, sigma, eta, rho) calibration to a European swaption panel.

Same architecture as the other calibrators (rates.py, heston.py: two-stage
bounded fits over relative price residuals): the curve is embedded exactly
by construction (models/g2.G2Params), so only the five dynamical
parameters are free.  Every residual evaluation prices the whole panel
through the jitted Gauss-Hermite swaption formula — one LM iteration is a
single fused XLA program including the jacfwd tangents through the
fixed-trip Newton for the critical boundary.

Reference analog: /root/reference/src/python/quant_trading/calibration/
heston_calibrator.py:247-513 (bounded least squares over a quote panel);
the reference has no rates models at all.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import g2 as g2_mod
from ..models.g2 import G2Params
from ..models.rates import DiscountCurve
from .lm import levenberg_marquardt

__all__ = ["G2CalibrationResult", "G2Calibrator"]

# (a, b, sigma, eta, rho)
_LOWER = (1e-3, 1e-3, 1e-4, 1e-4, -0.99)
_UPPER = (3.0, 3.0, 0.10, 0.10, 0.99)


@dataclass
class G2CalibrationResult:
    params: G2Params
    rmse: float
    max_rel_error: float
    converged: bool
    n_iter: int


@functools.partial(jax.jit,
                   static_argnames=("payer", "n_gh", "max_iter"))
def _fit_g2_swaptions_jit(x0, lower, upper, curve, expiries, pay_times,
                          strikes, quotes, *, payer, n_gh, max_iter):
    def resid(v):
        p = G2Params(v[0], v[1], v[2], v[3], v[4], curve)
        model = jnp.stack([
            g2_mod.g2_swaption(p, k, e, pt, payer=payer, n_gh=n_gh)
            for e, pt, k in zip(expiries, pay_times, strikes)
        ])
        return (model - quotes) / jnp.maximum(quotes, 1e-12)

    res = levenberg_marquardt(resid, x0, lower, upper, max_iter=max_iter)
    return res, resid(res.x)


class G2Calibrator:
    """Fit the five G2++ parameters to swaption PRICES.

    ``expiries[i]``, ``pay_times[i]`` (each a strictly increasing array
    after the expiry), ``strikes[i]``, ``quotes[i]`` define one European
    swaption; all are priced per LM step via the same jitted expression.
    """

    def __init__(
        self,
        max_iter: int = 80,
        x0=(0.5, 0.05, 0.01, 0.008, -0.5),
        n_gh: int = 64,
    ):
        self.max_iter = int(max_iter)
        self.x0 = x0
        self.n_gh = int(n_gh)

    def calibrate_swaptions(
        self,
        curve: DiscountCurve,
        expiries: Sequence[float],
        pay_times: Sequence[Sequence[float]],
        strikes: Sequence[float],
        quotes,
        payer: bool = True,
        x0=None,
    ) -> G2CalibrationResult:
        expiries = tuple(jnp.asarray(e) for e in expiries)
        pay_times = tuple(jnp.asarray(pt) for pt in pay_times)
        strikes = tuple(jnp.asarray(k) for k in strikes)
        quotes = jnp.asarray(quotes)
        dtype = quotes.dtype
        # x0 warm-starts from a previous fit (orchestrator convention);
        # the module-level jitted fit reuses the compiled LM across calls
        # with the same panel shape (the daily-orchestrator pattern) and
        # returns the final residuals from INSIDE the program
        res, r = _fit_g2_swaptions_jit(
            jnp.asarray(self.x0 if x0 is None else tuple(x0), dtype),
            jnp.asarray(_LOWER, dtype), jnp.asarray(_UPPER, dtype),
            curve, expiries, pay_times, strikes, quotes,
            payer=bool(payer), n_gh=self.n_gh, max_iter=self.max_iter)
        r = np.asarray(r)
        params = G2Params(*(jnp.asarray(res.x[i]) for i in range(5)),
                          curve)
        return G2CalibrationResult(
            params=params,
            rmse=float(np.sqrt(np.mean(r * r))),
            max_rel_error=float(np.max(np.abs(r))),
            converged=bool(res.converged),
            n_iter=int(res.n_iter),
        )
