"""Semi-closed-form forward-start (and cliquet-strip) pricing under Heston.

A forward-start vanilla pays ``(S_T / S_{t0} - k)^+`` at T.  By iterated
conditioning its log-return CF factorizes exactly:

    E[e^{iu ln(S_T/S_{t0})}] = e^{iu(r-q)tau} e^{C(u,tau)} * M_{v_{t0}}(D(u,tau))

with ``tau = T - t0``, ``C``/``D`` the ordinary Heston exponents over tau, and
``M_{v_{t0}}`` the moment generating function of the time-``t0`` CIR variance
given ``v_0`` — a scaled noncentral chi-square with closed-form MGF.  The
forward-start smile is therefore priced by the *same* Carr-Madan machinery as
spot-started vanillas (models/heston.py), through the affine-extension hook
``cf_reduced_extra``: the hook multiplies the reduced CF ``exp(C + D v0)`` by
``exp(-D v0) * M_{v_{t0}}(D)``, which equals 1 at ``u = -i`` so the forward
is preserved — the contract the hook requires.

The reference platform prices only spot-started vanillas
(src/cpp/models/heston.cpp:94-151); this module gives the forward-smile
instruments (cliquet legs) analytically, cross-validated against the QE
Monte Carlo route (models/heston_mc.price_forward_start_mc).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.precision import result_dtype
from . import heston
from .heston import HestonParams

__all__ = [
    "ForwardStartParams",
    "price_forward_start",
    "price_cliquet_strip",
]


class ForwardStartParams(NamedTuple):
    """Heston params + fixing date ``t0``, as a pytree the CF pricers accept.

    Feeding this to any ``models.heston`` pricer with ``spot=1`` and
    ``maturity=tau`` prices the *forward return* ``S_{t0+tau}/S_{t0}``:
    the ``cf_reduced_extra`` hook swaps the deterministic ``exp(D v0)``
    v-dependence for the chi-square-mixed ``M_{v_{t0}}(D)``.
    """

    kappa: jnp.ndarray
    theta: jnp.ndarray
    sigma: jnp.ndarray
    rho: jnp.ndarray
    v0: jnp.ndarray
    t0: jnp.ndarray

    def cf_reduced_extra(self, u, T, rdt, cdt):
        """``exp(-D(u,T) v0) * E[exp(D(u,T) v_{t0}) | v_0]``.

        ``v_{t0} | v_0 ~ c * chi'^2(delta, lam)`` with
        ``c = sigma^2 (1-e^{-kappa t0}) / (4 kappa)``,
        ``delta = 4 kappa theta / sigma^2``, ``lam = v0 e^{-kappa t0} / c``;
        ``E[e^{w v_{t0}}] = (1-2cw)^{-delta/2} exp(lam c w / (1-2cw))``.
        Written with ``lam*c = v0 e^{-kappa t0}`` so ``t0 -> 0`` (c -> 0)
        degrades smoothly to the vanilla factor 1 * exp(0) — no 0/0.

        On the stable branch ``Re(D) <= 0`` along the Carr-Madan contour, so
        ``Re(1 - 2cD) >= 1`` and the principal log/power never crosses a cut.
        """
        kappa = jnp.asarray(self.kappa, dtype=rdt)
        th = jnp.asarray(self.theta, dtype=rdt)
        sig = jnp.asarray(self.sigma, dtype=rdt)
        rho_ = jnp.asarray(self.rho, dtype=rdt)
        v0 = jnp.asarray(self.v0, dtype=rdt)
        t0 = jnp.asarray(self.t0, dtype=rdt)
        i = jnp.asarray(1j, dtype=cdt)

        # D(u, T) in the same trap-free branch as heston._cf_reduced
        sigma2 = sig * sig
        xi = kappa - rho_ * sig * i * u
        d = jnp.sqrt(xi * xi + sigma2 * (i * u + u * u))
        g = (xi - d) / (xi + d)
        exp_mdT = jnp.exp(-d * T)
        D = ((xi - d) / sigma2) * ((1.0 - exp_mdT) / (1.0 - g * exp_mdT))

        e_kt0 = jnp.exp(-kappa * t0)
        c = sigma2 * (1.0 - e_kt0) / (4.0 * kappa)
        delta = 4.0 * kappa * th / sigma2
        lam_c = v0 * e_kt0  # lam * c, finite as t0 -> 0
        one_m2cw = 1.0 - 2.0 * c * D
        # log1p, not log(1-x): as sigma -> 0, c -> 0 while delta ~ 1/sigma^2
        # blows up, so the product delta*log1p(-2cD) needs the log accurate
        # in ABSOLUTE terms near 0, which log(1-x) (rounding at eps(1)) isn't.
        mgf = jnp.exp(
            lam_c * D / one_m2cw - 0.5 * delta * jnp.log1p(-2.0 * c * D)
        )
        return jnp.exp(-D * v0) * mgf

    def heston(self) -> HestonParams:
        return HestonParams(self.kappa, self.theta, self.sigma, self.rho, self.v0)


def price_forward_start(
    params: HestonParams,
    rel_strikes,
    fixing,
    maturity,
    rate=0.0,
    dividend=0.0,
    is_call=True,
    notional=1.0,
):
    """Analytic forward-start vanilla: ``notional * (S_T/S_{t0} - k)^+``.

    One converged Carr-Madan quadrature on the forward-return CF — no paths,
    no grids.  Cross-validated against the QE MC route
    (tests/test_forward_start_analytic.py).  Broadcasts over ``rel_strikes``.
    """
    rdt = result_dtype(maturity, params.kappa)
    tau = jnp.asarray(maturity, rdt) - jnp.asarray(fixing, rdt)
    fsp = ForwardStartParams(
        params.kappa, params.theta, params.sigma, params.rho, params.v0,
        jnp.asarray(fixing, rdt),
    )
    p = heston.price_accurate(
        fsp, rel_strikes, tau, 1.0, rate, dividend, is_call
    )
    disc_t0 = jnp.exp(-jnp.asarray(rate, rdt) * jnp.asarray(fixing, rdt))
    return jnp.asarray(notional, rdt) * disc_t0 * p


def price_cliquet_strip(
    params: HestonParams,
    maturity,
    *,
    n_periods: int = 12,
    local_floor=0.0,
    local_cap=0.08,
    notional=1.0,
    rate=0.0,
    dividend=0.0,
):
    """Analytic cliquet WITHOUT global floor/cap: a strip of forward-start
    call spreads.

    ``clip(R_j - 1, lf, lc) = lf + (R_j - (1+lf))^+ - (R_j - (1+lc))^+`` and
    expectations add across periods, so the no-global-clip cliquet decomposes
    into 2 * n_periods forward-start calls (each coupon discounted from the
    note's maturity).  A binding global floor/cap couples the periods — use
    :func:`pde_tpu.models.heston_mc.price_cliquet_mc` for that contract.
    """
    rdt = result_dtype(maturity, params.kappa)
    T = jnp.asarray(maturity, rdt)
    r = jnp.asarray(rate, rdt)
    lf = jnp.asarray(local_floor, rdt)
    lc = jnp.asarray(local_cap, rdt)
    dt = T / n_periods

    total = jnp.zeros((), rdt)
    for j in range(1, n_periods + 1):
        t_prev, t_j = (j - 1) * dt, j * dt
        spread = price_forward_start(
            params, 1.0 + lf, t_prev, t_j, rate=rate, dividend=dividend
        ) - price_forward_start(
            params, 1.0 + lc, t_prev, t_j, rate=rate, dividend=dividend
        )
        # coupon fixes at t_j but pays at T: extra discount e^{-r (T - t_j)}
        total = total + jnp.exp(-r * (T - t_j)) * spread
    total = total + jnp.exp(-r * T) * lf * n_periods
    return jnp.asarray(notional, rdt) * total
