r"""Digital (binary) option pricing under affine characteristic functions.

Semi-analytic cash-or-nothing / asset-or-nothing digitals via Gil-Pelaez
Fourier inversion, in the same forward-moneyness formulation the vanilla
quadrature stack uses (models/heston.py): the integrand's only phase is the
small exp(i u ln(F/K)), so float32/complex64 device runs keep full relative
precision.  Works for ANY params pytree the shared :func:`._cf_reduced`
accepts — classic Heston, Bates (jump factor through the
``cf_reduced_extra`` hook), and the term-structure variants.

The reference has no digital pricer; the closest machinery is its Heston
CF/quadrature stack (src/cpp/models/heston.cpp:94-151), which these
formulas share.  Monte Carlo twins (plus one-touch/no-touch contracts)
live in :mod:`.heston_mc`; Black-Scholes closed forms (including the
reflection-principle touch probabilities) in :mod:`.black_scholes`.

Gil-Pelaez, money measure and share measure:

  P2 = Q(S_T > K)       = 1/2 + (1/pi) \int_0^inf Re[ e^{-iu ln K} phi(u) / (iu) ] du
  P1 = Q_S(S_T > K)     = 1/2 + (1/pi) \int_0^inf Re[ e^{-iu ln K} phi(u-i) / (iu phi(-i)) ] du

With phi(u) = cf_reduced(u) * exp(iu (ln S0 + (r-q)T)) and the martingale
normalization cf_reduced(-i) = 1 (asserted for every affine extension, see
models/heston.py:138-143), both collapse to

  P_j = 1/2 + (1/pi) \int_0^inf Re[ cf_reduced(u - i*[j==1]) e^{iu x} / (iu) ] du,
  x = ln(F/K)

— no large cancelling phases.  Prices:

  cash-or-nothing  call/put:  e^{-rT} P2          /  e^{-rT} (1 - P2)
  asset-or-nothing call/put:  S0 e^{-qT} P1       /  S0 e^{-qT} (1 - P1)

and the European decomposition  C = asset_call - K * cash_call  ties these
to the Carr-Madan vanilla pricer (tested to 1e-7 in f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.precision import complex_dtype_for, result_dtype
from .heston import _accurate_gl_rule, _cf_reduced


def _gil_pelaez_probs(params, strike, maturity, spot, rate, dividend,
                      n_per_panel):
    rdt = result_dtype(strike, maturity, spot)
    cdt = complex_dtype_for(rdt)
    strike, T = jnp.broadcast_arrays(
        jnp.asarray(strike, dtype=rdt), jnp.asarray(maturity, dtype=rdt)
    )
    spot = jnp.asarray(spot, dtype=rdt)

    v_np, w_np = _accurate_gl_rule(n_per_panel)
    v = jnp.asarray(v_np, dtype=rdt)
    w = jnp.asarray(w_np, dtype=rdt)

    x = (jnp.log(spot / strike) + (rate - dividend) * T)[..., None]
    Tn = T[..., None]
    u = v.astype(cdt)

    cf2 = _cf_reduced(params, u, Tn, rdt, cdt)
    cf1 = _cf_reduced(params, u - 1j, Tn, rdt, cdt)
    # T <= 0: the reduced CF is exp(0) = 1 analytically; guard stray NaNs
    # from 0/0 in intermediates the same way the vanilla pricer does
    one = jnp.asarray(1.0 + 0.0j, dtype=cdt)
    cf2 = jnp.where(Tn <= 0.0, one, cf2)
    cf1 = jnp.where(Tn <= 0.0, one, cf1)

    phase = jnp.exp(1j * u * x.astype(cdt))
    inv_iu = -1j / u  # 1/(iu) on the real nodes (all v > 0 on GL panels)
    integrand2 = (cf2 * phase * inv_iu).real
    integrand1 = (cf1 * phase * inv_iu).real

    inv_pi = jnp.asarray(1.0 / jnp.pi, dtype=rdt)
    p2 = 0.5 + inv_pi * jnp.sum(w * integrand2, axis=-1)
    p1 = 0.5 + inv_pi * jnp.sum(w * integrand1, axis=-1)
    return jnp.clip(p1, 0.0, 1.0), jnp.clip(p2, 0.0, 1.0), strike, T, spot, rdt


@functools.partial(jax.jit, static_argnames=("n_per_panel",))
def probabilities(params, strike, maturity, spot, rate=0.0, dividend=0.0,
                  n_per_panel: int = 40):
    """(P1, P2): share-measure and money-measure exercise probabilities
    Q_S(S_T > K), Q(S_T > K) via Gil-Pelaez on the composite GL rule
    (:func:`.heston._accurate_gl_rule`).  Broadcasts over strike/maturity."""
    p1, p2, *_ = _gil_pelaez_probs(
        params, strike, maturity, spot, rate, dividend, n_per_panel
    )
    return p1, p2


@functools.partial(jax.jit, static_argnames=("kind", "n_per_panel"))
def price(params, strike, maturity, spot, rate=0.0, dividend=0.0,
          is_call=True, kind: str = "cash", n_per_panel: int = 40):
    """Digital option price.

    ``kind="cash"``: pays 1 at expiry if in the money (price
    ``e^{-rT} P2`` / ``e^{-rT}(1-P2)``).  ``kind="asset"``: pays S_T
    (price ``S0 e^{-qT} P1`` / ``S0 e^{-qT}(1-P1)``).  ``is_call`` may be
    an array (broadcasts).  Differentiable in params/spot/rate for AD
    Greeks.
    """
    if kind not in ("cash", "asset"):
        raise ValueError(f"kind must be 'cash' or 'asset', got {kind!r}")
    p1, p2, strike_b, T, spot_a, rdt = _gil_pelaez_probs(
        params, strike, maturity, spot, rate, dividend, n_per_panel
    )
    call = jnp.broadcast_to(jnp.asarray(is_call), p2.shape)
    if kind == "cash":
        df = jnp.exp(-jnp.asarray(rate, dtype=rdt) * T)
        return df * jnp.where(call, p2, 1.0 - p2)
    fwd_df = spot_a * jnp.exp(-jnp.asarray(dividend, dtype=rdt) * T)
    return fwd_df * jnp.where(call, p1, 1.0 - p1)


def _gil_pelaez_probs_grouped(params, strikes, t_idx, unique_T, spot, rate,
                              dividend, n_per_panel):
    """(P1, P2) with the CF rows SHARED per unique maturity (two rows per
    maturity — the u and u-i contours), mirroring
    :func:`.heston._carr_madan_grouped_sum`: an N-option book with M
    maturities costs 2*M*n CF evaluations instead of 2*N*n."""
    rdt = result_dtype(strikes, unique_T, spot)
    cdt = complex_dtype_for(rdt)
    strikes = jnp.asarray(strikes, dtype=rdt)
    uT = jnp.asarray(unique_T, dtype=rdt)
    spot = jnp.asarray(spot, dtype=rdt)

    v_np, w_np = _accurate_gl_rule(n_per_panel)
    v = jnp.asarray(v_np, dtype=rdt)
    w = jnp.asarray(w_np, dtype=rdt)
    u = v.astype(cdt)

    Tm = uT[:, None]  # (M, 1)
    one = jnp.asarray(1.0 + 0.0j, dtype=cdt)
    cf2 = jnp.where(Tm <= 0.0, one, _cf_reduced(params, u, Tm, rdt, cdt))
    cf1 = jnp.where(Tm <= 0.0, one, _cf_reduced(params, u - 1j, Tm, rdt, cdt))
    # fold the GL weight and the 1/(iu) kernel into the maturity rows
    scale = (w / v).astype(cdt) * (-1j)
    cfw2 = cf2 * scale  # (M, n)
    cfw1 = cf1 * scale

    T = uT[t_idx]
    x = jnp.log(spot / strikes) + (rate - dividend) * T
    vx = v * x[..., None]  # (..., n)
    cos_vx, sin_vx = jnp.cos(vx), jnp.sin(vx)

    g2 = cfw2[t_idx]
    g1 = cfw1[t_idx]
    inv_pi = jnp.asarray(1.0 / jnp.pi, dtype=rdt)
    p2 = 0.5 + inv_pi * jnp.sum(g2.real * cos_vx - g2.imag * sin_vx, axis=-1)
    p1 = 0.5 + inv_pi * jnp.sum(g1.real * cos_vx - g1.imag * sin_vx, axis=-1)
    return (jnp.clip(p1, 0.0, 1.0), jnp.clip(p2, 0.0, 1.0),
            strikes, T, spot, rdt)


@functools.partial(jax.jit, static_argnames=("kind", "n_per_panel"))
def price_grouped(params, strikes, t_idx, unique_T, spot, rate=0.0,
                  dividend=0.0, is_call=True, kind: str = "cash",
                  n_per_panel: int = 40):
    """:func:`price` with the CF shared per unique maturity — the fast path
    for digital books (flat chain vectors with a ``group_maturities``
    index, same convention as :func:`.heston.price_accurate_grouped`)."""
    if kind not in ("cash", "asset"):
        raise ValueError(f"kind must be 'cash' or 'asset', got {kind!r}")
    p1, p2, strikes_b, T, spot_a, rdt = _gil_pelaez_probs_grouped(
        params, strikes, t_idx, unique_T, spot, rate, dividend, n_per_panel
    )
    call = jnp.broadcast_to(jnp.asarray(is_call), p2.shape)
    if kind == "cash":
        return jnp.exp(-jnp.asarray(rate, dtype=rdt) * T) * jnp.where(
            call, p2, 1.0 - p2
        )
    return spot_a * jnp.exp(-jnp.asarray(dividend, dtype=rdt) * T) * jnp.where(
        call, p1, 1.0 - p1
    )


@functools.partial(jax.jit, static_argnames=("n_per_panel",))
def european_from_digitals(params, strike, maturity, spot, rate=0.0,
                           dividend=0.0, is_call=True, n_per_panel: int = 40):
    """Vanilla European price assembled from the two digitals:
    ``C = asset_call - K * cash_call`` (put via the complements).  A
    consistency identity against the Carr-Madan pricer, exposed for tests
    and cross-checks."""
    asset = price(params, strike, maturity, spot, rate, dividend,
                  is_call=is_call, kind="asset", n_per_panel=n_per_panel)
    cash = price(params, strike, maturity, spot, rate, dividend,
                 is_call=is_call, kind="cash", n_per_panel=n_per_panel)
    k = jnp.asarray(strike, dtype=asset.dtype)
    return jnp.where(jnp.asarray(is_call), asset - k * cash, k * cash - asset)
