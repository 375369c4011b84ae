"""Bates jump-diffusion surface calibration — two-stage (DE + multistart LM).

Eight parameters (kappa, theta, sigma, rho, v0, lam, mu_j, sigma_j) fitted
to a quote surface with the same architecture as the flagship Heston
pipeline (calibrate/heston.py, reference semantics
calibration/heston_calibrator.py:416-477): a jitted differential-evolution
global stage whose every generation prices the whole population as one
grouped-CF tensor, then a vmapped multistart Levenberg-Marquardt polish with
exact jacfwd Jacobians.  Pricing goes through the classic Heston quadrature
machinery — :class:`~pde_tpu.models.bates.BatesParams` plugs into it via
the ``cf_reduced_extra`` hook — so the jump extension costs zero new
quadrature code here too.

Identification note: (lam, mu_j, sigma_j) and (sigma, rho, v0) compete for
short-maturity skew, so the informed start matters more than for Heston.
The pipeline seeds one start from a plain Heston fit with small jumps
attached, alongside the top DE members.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import heston as heston_model
from ..models.bates import BatesParams
from .de import differential_evolution
from .lm import levenberg_marquardt

__all__ = ["BatesCalibrationResult", "BatesCalibrator"]

PARAM_ORDER = ("kappa", "theta", "sigma", "rho", "v0", "lam", "mu_j", "sigma_j")



@dataclass
class BatesCalibrationResult:
    params: BatesParams
    fit_quality: Dict[str, float]
    convergence: Dict[str, Any]
    timestamp: datetime
    warnings: List[str] = field(default_factory=list)

    @property
    def success(self) -> bool:
        return bool(self.convergence.get("local_converged", False))

    @property
    def rmse(self) -> float:
        return float(self.fit_quality.get("rmse", float("inf")))

    def to_dict(self) -> Dict[str, Any]:
        return {
            "params": {k: float(getattr(self.params, k)) for k in PARAM_ORDER},
            "fit_quality": self.fit_quality,
            "convergence": self.convergence,
            "timestamp": self.timestamp,
            "warnings": self.warnings,
            "success": self.success,
            "rmse": self.rmse,
        }


def _price_vec(x, strikes, t_idx, unique_T, is_calls, S0, r, q):
    # CONVERGED composite-GL rule (models/heston.py:_accurate_gl_rule), not
    # the reference-parity rectangle sum the Heston pipeline uses: Bates has
    # no reference counterpart to reproduce bit-for-bit, so the objective
    # should target the true integral — jump-fattened wings otherwise pick
    # up the parity rule's truncation bias exactly where the jump
    # parameters live
    p = BatesParams.from_array(x)
    return heston_model.price_accurate_gl_grouped(
        p, strikes, t_idx, unique_T, S0, r, q, is_calls
    )


@partial(
    jax.jit,
    static_argnames=("global_maxiter", "global_popsize", "local_max_iter"),
)
def _calibrate_pipeline(
    strikes, t_idx, unique_T, is_calls, market_prices, mask, S0, r, q,
    lower, upper, key, x0, use_x0,
    global_maxiter: int = 60,
    global_popsize: int = 20,
    local_max_iter: int = 60,
):
    """Full two-stage 8-parameter calibration as one jitted program.

    Same shape-bucketed masking contract as the Heston pipeline
    (calibrate/heston.py:_calibrate_pipeline): ``mask`` zeroes padded quote
    slots out of the objective, the Jacobian, and the fit metrics.
    """

    def objective(pop):
        prices = jax.vmap(
            lambda x: _price_vec(x, strikes, t_idx, unique_T, is_calls, S0, r, q)
        )(pop)
        prices = jnp.where(mask > 0, prices, market_prices)
        nan_bad = jnp.any(jnp.isnan(prices), axis=-1)
        prices = jnp.maximum(prices, 1e-10)
        errors = mask * (prices - market_prices) / market_prices
        obj = jnp.sum(errors * errors, axis=-1)
        return jnp.where(nan_bad, 1e10, obj)

    seed = jnp.where(use_x0, x0, 0.5 * (lower + upper))
    de = differential_evolution(
        objective, lower, upper, key, x0=seed,
        popsize=global_popsize, maxiter=global_maxiter,
        param_tol=1e-2, stagnation_patience=12,
    )

    def residuals(x):
        prices = _price_vec(x, strikes, t_idx, unique_T, is_calls, S0, r, q)
        prices = jnp.where(mask > 0, prices, market_prices)
        prices = jnp.maximum(prices, 1e-10)
        return mask * (prices - market_prices) / market_prices

    k_starts = 4
    order = jnp.argsort(de.population_energies)
    starts = de.population[order[:k_starts]]
    # the warm start (a Heston fit + small jumps, see calibrate()) is worth
    # polishing directly even when DE wandered off it
    starts = jnp.concatenate([starts, seed[None, :]], axis=0)

    def polish(x):
        first = levenberg_marquardt(
            residuals, x, lower, upper, max_iter=local_max_iter, ftol=1e-8
        )
        return levenberg_marquardt(
            residuals, first.x, lower, upper, max_iter=local_max_iter,
            ftol=1e-8,
        )

    lm_all = jax.vmap(polish)(starts)
    best = jnp.argmin(lm_all.cost)
    lm_x = lm_all.x[best]
    model_prices = _price_vec(lm_x, strikes, t_idx, unique_T, is_calls,
                              S0, r, q)
    return (de.x, de.fun, de.n_iter, lm_x, lm_all.cost[best],
            lm_all.converged[best], lm_all.n_iter[best], model_prices)


class BatesCalibrator:
    """Two-stage Bates surface calibrator.

    Usage mirrors :class:`~pde_tpu.calibrate.heston.HestonCalibrator`;
    ``warm_start_heston=True`` (default) first runs the 5-parameter Heston
    calibration and seeds the 8-dim search from it with small jumps
    attached — the jump/diffusion identification trap (short skew can be
    explained by either rho/sigma or mu_j/lam) is much less likely to
    capture the fit when the diffusion part starts where the smile's term
    structure puts it.
    """

    DEFAULT_BOUNDS = {
        "kappa": (0.1, 10.0),
        "theta": (0.01, 1.0),
        "sigma": (0.01, 2.0),
        "rho": (-0.99, 0.99),
        "v0": (0.01, 1.0),
        "lam": (0.0, 3.0),
        "mu_j": (-0.5, 0.3),
        "sigma_j": (0.01, 0.8),
    }

    def __init__(
        self,
        bounds: Optional[Dict[str, Tuple[float, float]]] = None,
        global_maxiter: int = 60,
        global_popsize: int = 20,
        local_max_iter: int = 60,
        seed: int = 42,
        warm_start_heston: bool = True,
    ):
        self.bounds = bounds or dict(self.DEFAULT_BOUNDS)
        self.global_maxiter = global_maxiter
        self.global_popsize = global_popsize
        self.local_max_iter = local_max_iter
        self.seed = seed
        self.warm_start_heston = warm_start_heston

    def calibrate(
        self,
        strikes,
        maturities,
        market_prices,
        S0: float,
        r: float,
        q: float = 0.0,
        is_calls=None,
        x0: Optional[BatesParams] = None,
    ) -> BatesCalibrationResult:
        strikes = np.asarray(strikes, dtype=np.float64).ravel()
        maturities = np.asarray(maturities, dtype=np.float64).ravel()
        market_prices = np.asarray(market_prices, dtype=np.float64).ravel()
        n = strikes.shape[0]
        if is_calls is None:
            is_calls = np.ones(n, dtype=bool)
        else:
            is_calls = np.asarray(is_calls, dtype=bool).ravel()

        t_start = datetime.now()
        warnings_list: List[str] = []

        lower = jnp.array([self.bounds[k][0] for k in PARAM_ORDER])
        upper = jnp.array([self.bounds[k][1] for k in PARAM_ORDER])

        if x0 is not None:
            seed_x = jnp.asarray(x0.to_array())
            use_x0 = jnp.asarray(True)
        elif self.warm_start_heston:
            from .heston import HestonCalibrator

            hcal = HestonCalibrator(
                global_maxiter=self.global_maxiter,
                global_popsize=max(8, self.global_popsize // 2),
                local_max_iter=self.local_max_iter,
                seed=self.seed,
            )
            hres = hcal.calibrate(
                {"strike": strikes, "maturity": maturities,
                 "mid_price": market_prices, "is_call": is_calls},
                S0=S0, r=r, q=q,
            )
            hp = hres.params
            seed_x = jnp.asarray([
                float(hp.kappa), float(hp.theta), float(hp.sigma),
                float(hp.rho), float(hp.v0),
                0.2, -0.05, 0.15,  # small jumps: near the lam=0 Heston limit
            ])
            use_x0 = jnp.asarray(True)
            warnings_list.extend(hres.warnings)
        else:
            seed_x = 0.5 * (lower + upper)
            use_x0 = jnp.asarray(False)

        unique_T, t_idx = heston_model.group_maturities(maturities)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        out = _calibrate_pipeline(
            jnp.asarray(strikes, dtype=dtype),
            jnp.asarray(t_idx),
            jnp.asarray(unique_T, dtype=dtype),
            jnp.asarray(is_calls),
            jnp.asarray(market_prices, dtype=dtype),
            jnp.ones(n, dtype=dtype),
            S0, r, q,
            lower.astype(dtype), upper.astype(dtype),
            jax.random.PRNGKey(self.seed),
            seed_x.astype(dtype), use_x0,
            global_maxiter=self.global_maxiter,
            global_popsize=self.global_popsize,
            local_max_iter=self.local_max_iter,
        )
        (de_x, de_fun, de_iter, lm_x, lm_cost, lm_conv, lm_iter,
         model_prices) = (np.asarray(o) for o in out)

        params = BatesParams(*(float(v) for v in lm_x))
        resid = (model_prices - market_prices) / market_prices
        abs_err = np.abs(model_prices - market_prices)
        ss_res = float(np.sum((model_prices - market_prices) ** 2))
        ss_tot = float(np.sum((market_prices - market_prices.mean()) ** 2))
        fit_quality = {
            "rmse": float(np.sqrt(np.mean(resid**2))),
            "max_error": float(np.max(abs_err)),
            "mean_error": float(np.mean(abs_err)),
            "r_squared": 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan"),
            "n_options": int(n),
        }
        if not params.feller_satisfied():
            warnings_list.append(
                f"Feller condition violated: 2*kappa*theta - sigma^2 = "
                f"{float(params.feller_value()):.4f} < 0"
            )
        convergence = {
            "global_best_objective": float(de_fun),
            "global_iterations": int(de_iter),
            "local_cost": float(lm_cost),
            "local_converged": bool(lm_conv),
            "local_iterations": int(lm_iter),
            "elapsed_s": (datetime.now() - t_start).total_seconds(),
        }
        return BatesCalibrationResult(
            params=params,
            fit_quality=fit_quality,
            convergence=convergence,
            timestamp=datetime.now(),
            warnings=warnings_list,
        )

    # ------------------------------------------------------------------
    @classmethod
    def generate_synthetic_data(
        cls,
        S0: float = 100.0,
        r: float = 0.05,
        q: float = 0.02,
        kappa: float = 2.0,
        theta: float = 0.04,
        sigma: float = 0.3,
        rho: float = -0.7,
        v0: float = 0.04,
        lam: float = 0.5,
        mu_j: float = -0.1,
        sigma_j: float = 0.15,
        n_strikes: int = 11,
        n_maturities: int = 3,
        noise_std: float = 0.0,
        seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """Synthetic Bates surface from known parameters (style of
        HestonCalibrator.generate_synthetic_data)."""
        strikes = np.linspace(0.8 * S0, 1.2 * S0, n_strikes)
        maturities = np.linspace(0.1, 1.0, n_maturities)
        K, T = np.meshgrid(strikes, maturities)
        K, T = K.ravel(), T.ravel()
        params = BatesParams(kappa, theta, sigma, rho, v0, lam, mu_j, sigma_j)
        unique_T, t_idx = heston_model.group_maturities(T)
        priced = np.asarray(
            heston_model.price_accurate_gl_grouped(
                params, jnp.asarray(K), jnp.asarray(t_idx),
                jnp.asarray(unique_T), S0, r, q, True,
            )
        )
        if noise_std > 0:
            rng = np.random.default_rng(seed)
            priced = priced * (1.0 + noise_std * rng.standard_normal(priced.shape))
        # drop sub-premium quotes (deep-OTM short-dated calls under heavy
        # downward jumps price below any realistic tick) — mirrors the
        # min-price filter real chains get before calibration
        keep = priced > max(1e-3, 1e-5 * S0)
        return {
            "strike": K[keep],
            "maturity": T[keep],
            "mid_price": priced[keep],
            "is_call": np.ones(int(keep.sum()), dtype=bool),
        }
