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


def _tail_scale(params, T, rdt):
    """Per-contract quadrature stretch for short-dated / low-variance tails.

    The Gil-Pelaez integrand decays like |cf(u)|/u — one power of u slower
    than the Carr-Madan integrand the composite rule's [0, 204.8]
    truncation was validated against — and the CF's Gaussian-ish decay
    scale is ~1/sqrt(integrated variance).  For short maturities / low
    variance (e.g. T ~ 0.02, v0 ~ 0.01) the tail at u = 204.8 is NOT
    negligible (measured ~1e-2-scale probability error unscaled).  Fix:
    substitute u = s * v with s = sqrt(vbar_ref / vbar) clipped to [1, 8],
    where vbar is the Heston integrated variance
    ``theta T + (v0 - theta)(1 - e^{-kappa T})/kappa`` and vbar_ref = 0.04
    (the regime the rule was tuned in).  The 1/(iu) kernel absorbs the
    Jacobian, so only the CF argument and the phase see the stretch; the
    relevant |ln(F/K)| range shrinks like sqrt(vbar), so oscillation
    resolution per panel is preserved.  ``stop_gradient``: the scale is a
    quadrature choice — analytically d(integral)/ds = 0 — so it must not
    inject discretization noise into AD Greeks.  Non-Heston-shaped params
    (no kappa/theta/v0 fields) keep scale 1.
    """
    kappa = getattr(params, "kappa", None)
    theta = getattr(params, "theta", None)
    v0 = getattr(params, "v0", None)
    if kappa is None or theta is None or v0 is None:
        return jnp.ones_like(jnp.asarray(T, dtype=rdt))
    kappa = jnp.asarray(kappa, dtype=rdt)
    theta = jnp.asarray(theta, dtype=rdt)
    v0 = jnp.asarray(v0, dtype=rdt)
    T = jnp.asarray(T, dtype=rdt)
    k_safe = jnp.maximum(kappa, 1e-6)
    vbar = theta * T + (v0 - theta) * (-jnp.expm1(-k_safe * T)) / k_safe
    s = jnp.sqrt(0.04 / jnp.maximum(vbar, 1e-10))
    return jax.lax.stop_gradient(jnp.clip(s, 1.0, 8.0))


def _gil_pelaez_probs(params, strike, maturity, spot, rate, dividend,
                      n_per_panel, kind: str = "both"):
    """(P1, P2) via Gil-Pelaez.  ``kind`` selects which contour(s) to
    evaluate — 'cash' needs only cf(u) (P2), 'asset' only cf(u-i) (P1),
    'both' both — so single-kind pricing pays half the CF work.  The
    skipped probability returns as None."""
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
    s = _tail_scale(params, T, rdt)[..., None]
    vs = v * s                      # stretched nodes, (..., n)
    u = vs.astype(cdt)

    # the 1/(iu) kernel absorbs the substitution Jacobian: (w s)/(i v s) =
    # w/(i v) — only the CF argument and the phase carry the stretch
    one = jnp.asarray(1.0 + 0.0j, dtype=cdt)
    phase = jnp.exp(1j * u * x.astype(cdt))
    kern = (phase * (-1j / v)).astype(cdt)
    inv_pi = jnp.asarray(1.0 / jnp.pi, dtype=rdt)

    p1 = p2 = None
    if kind in ("cash", "both"):
        cf2 = _cf_reduced(params, u, Tn, rdt, cdt)
        # T <= 0: the reduced CF is exp(0) = 1 analytically; guard stray
        # NaNs from 0/0 in intermediates the same way the vanilla pricer does
        cf2 = jnp.where(Tn <= 0.0, one, cf2)
        p2 = jnp.clip(0.5 + inv_pi * jnp.sum(w * (cf2 * kern).real, axis=-1),
                      0.0, 1.0)
    if kind in ("asset", "both"):
        cf1 = _cf_reduced(params, u - 1j, Tn, rdt, cdt)
        cf1 = jnp.where(Tn <= 0.0, one, cf1)
        p1 = jnp.clip(0.5 + inv_pi * jnp.sum(w * (cf1 * kern).real, axis=-1),
                      0.0, 1.0)
    return p1, p2, strike, T, spot, rdt


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


def prices_from_probs(p1, p2, strike, maturity, spot, rate=0.0, dividend=0.0,
                      is_call=True):
    """Assemble (cash, asset) digital prices from ONE
    :func:`probabilities` result — use when a caller needs both kinds (or
    both plus the probabilities themselves) so the two CF contours are
    evaluated exactly once."""
    p2 = jnp.asarray(p2)
    T = jnp.broadcast_to(jnp.asarray(maturity, dtype=p2.dtype), p2.shape)
    call = jnp.broadcast_to(jnp.asarray(is_call), p2.shape)
    df_r = jnp.exp(-jnp.asarray(rate, dtype=p2.dtype) * T)
    df_q = jnp.asarray(spot, dtype=p2.dtype) * jnp.exp(
        -jnp.asarray(dividend, dtype=p2.dtype) * T
    )
    cash = df_r * jnp.where(call, p2, 1.0 - p2)
    asset = df_q * jnp.where(call, p1, 1.0 - p1)
    return cash, asset


@functools.partial(jax.jit, static_argnames=("kind", "n_per_panel"))
def price(params, strike, maturity, spot, rate=0.0, dividend=0.0,
          is_call=True, kind: str = "cash", n_per_panel: int = 40):
    """Digital option price.

    ``kind="cash"``: pays 1 at expiry if in the money (price
    ``e^{-rT} P2`` / ``e^{-rT}(1-P2)``).  ``kind="asset"``: pays S_T
    (price ``S0 e^{-qT} P1`` / ``S0 e^{-qT}(1-P1)``).  ``is_call`` may be
    an array (broadcasts).  Differentiable in params/spot/rate for AD
    Greeks.  Only the needed CF contour is evaluated (cash -> cf(u),
    asset -> cf(u-i)).
    """
    if kind not in ("cash", "asset"):
        raise ValueError(f"kind must be 'cash' or 'asset', got {kind!r}")
    p1, p2, strike_b, T, spot_a, rdt = _gil_pelaez_probs(
        params, strike, maturity, spot, rate, dividend, n_per_panel,
        kind=kind,
    )
    if kind == "cash":
        call = jnp.broadcast_to(jnp.asarray(is_call), p2.shape)
        df = jnp.exp(-jnp.asarray(rate, dtype=rdt) * T)
        return df * jnp.where(call, p2, 1.0 - p2)
    call = jnp.broadcast_to(jnp.asarray(is_call), p1.shape)
    fwd_df = spot_a * jnp.exp(-jnp.asarray(dividend, dtype=rdt) * T)
    return fwd_df * jnp.where(call, p1, 1.0 - p1)


def _gil_pelaez_probs_grouped(params, strikes, t_idx, unique_T, spot, rate,
                              dividend, n_per_panel, kind: str = "both"):
    """(P1, P2) with the CF rows SHARED per unique maturity (one row per
    needed contour per maturity), mirroring
    :func:`.heston._carr_madan_grouped_sum`: an N-option book with M
    maturities costs (1 or 2)*M*n CF evaluations instead of per-option.
    The short-T/low-variance quadrature stretch (:func:`_tail_scale`)
    applies per maturity row — the 1/(iu) kernel absorbs the Jacobian, so
    only the CF argument and the per-option phase nodes carry it."""
    rdt = result_dtype(strikes, unique_T, spot)
    cdt = complex_dtype_for(rdt)
    strikes = jnp.asarray(strikes, dtype=rdt)
    uT = jnp.asarray(unique_T, dtype=rdt)
    spot = jnp.asarray(spot, dtype=rdt)

    v_np, w_np = _accurate_gl_rule(n_per_panel)
    v = jnp.asarray(v_np, dtype=rdt)
    w = jnp.asarray(w_np, dtype=rdt)

    Tm = uT[:, None]  # (M, 1)
    s_m = _tail_scale(params, uT, rdt)[:, None]       # (M, 1)
    vs = v[None, :] * s_m                             # (M, n) stretched nodes
    u = vs.astype(cdt)
    one = jnp.asarray(1.0 + 0.0j, dtype=cdt)
    # fold the GL weight and the 1/(iu) kernel into the maturity rows; the
    # substitution Jacobian cancels: (w s)/(i v s) = w/(i v)
    scale = (w / v).astype(cdt) * (-1j)

    T = uT[t_idx]
    x = jnp.log(spot / strikes) + (rate - dividend) * T
    vx = vs[t_idx] * x[..., None]  # (..., n) per-option stretched phase
    cos_vx, sin_vx = jnp.cos(vx), jnp.sin(vx)
    inv_pi = jnp.asarray(1.0 / jnp.pi, dtype=rdt)

    p1 = p2 = None
    if kind in ("cash", "both"):
        cf2 = jnp.where(Tm <= 0.0, one, _cf_reduced(params, u, Tm, rdt, cdt))
        g2 = (cf2 * scale)[t_idx]
        p2 = jnp.clip(0.5 + inv_pi * jnp.sum(
            g2.real * cos_vx - g2.imag * sin_vx, axis=-1), 0.0, 1.0)
    if kind in ("asset", "both"):
        cf1 = jnp.where(Tm <= 0.0, one,
                        _cf_reduced(params, u - 1j, Tm, rdt, cdt))
        g1 = (cf1 * scale)[t_idx]
        p1 = jnp.clip(0.5 + inv_pi * jnp.sum(
            g1.real * cos_vx - g1.imag * sin_vx, axis=-1), 0.0, 1.0)
    return p1, p2, strikes, T, spot, rdt


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
        params, strikes, t_idx, unique_T, spot, rate, dividend, n_per_panel,
        kind=kind,
    )
    if kind == "cash":
        call = jnp.broadcast_to(jnp.asarray(is_call), p2.shape)
        return jnp.exp(-jnp.asarray(rate, dtype=rdt) * T) * jnp.where(
            call, p2, 1.0 - p2
        )
    call = jnp.broadcast_to(jnp.asarray(is_call), p1.shape)
    return spot_a * jnp.exp(-jnp.asarray(dividend, dtype=rdt) * T) * jnp.where(
        call, p1, 1.0 - p1
    )


@functools.partial(jax.jit, static_argnames=("n_per_panel",))
def european_from_digitals(params, strike, maturity, spot, rate=0.0,
                           dividend=0.0, is_call=True, n_per_panel: int = 40):
    """Vanilla European price assembled from the two digitals:
    ``C = asset_call - K * cash_call`` (put via the complements).  A
    consistency identity against the Carr-Madan pricer, exposed for tests
    and cross-checks.  One Gil-Pelaez pass evaluates both contours exactly
    once (not two :func:`price` calls at 2x the CF work)."""
    p1, p2, *_ = _gil_pelaez_probs(
        params, strike, maturity, spot, rate, dividend, n_per_panel,
        kind="both",
    )
    cash, asset = prices_from_probs(
        p1, p2, strike, maturity, spot, rate, dividend, is_call=is_call
    )
    k = jnp.asarray(strike, dtype=asset.dtype)
    return jnp.where(jnp.asarray(is_call), asset - k * cash, k * cash - asset)
