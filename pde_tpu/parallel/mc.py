"""Mesh-sharded Monte Carlo: path axis distributed over devices.

The path axis is the framework's embarrassingly parallel MC dimension —
except for Longstaff-Schwartz American pricing, whose per-step
cross-sectional regression couples ALL paths.  This module shards both:

* :func:`price_european_mc_sharded` — each device simulates its own path
  shard (independently seeded via ``fold_in(key, axis_index)``); the
  price/stderr moments are ``psum``-reduced.  Pure data parallelism.
* :func:`price_american_lsm_sharded` — the interesting one: the LSM
  backward induction runs under ``shard_map`` with the regression's
  Gram/moment sums ``psum``-reduced per time step
  (:func:`pde_tpu.solvers.lsm.lsm_backward_induction` with ``axis_name``),
  so every device fits the GLOBAL continuation regression and applies an
  identical exercise policy to its local paths.  Communication cost: one
  fused psum of ~50 scalars per exercise date — the distributed
  normal-equations pattern, same shape as the sharded calibration step's
  J^T J reduction (parallel/mesh.py).

The reference has no Monte Carlo pricer at all (SURVEY §2; its only MC is
the backtest bootstrap) — this is the scale-out story for the MC engine
added in models/heston_mc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.heston import HestonParams
from ..models.heston_mc import simulate_qe, simulate_qe_paths
from ..solvers.lsm import lsm_backward_induction

__all__ = ["price_european_mc_sharded", "price_american_lsm_sharded",
           "calibrate_leverage_sharded", "cva_netting_sharded",
           "bermudan_swaption_lsm_sharded"]


def _pair_fold(discounted, n_local, antithetic):
    """Antithetic pairs are laid out [first half | mirrored half] on EACH
    device — fold locally before the global moment reduction."""
    if antithetic:
        h = n_local // 2
        return 0.5 * (discounted[:h] + discounted[h:])
    return discounted


def _global_mean_stderr(y, axis_name):
    """Mean and standard error over the global (all-device) sample from
    local values ``y``: three psum'd scalars (n, sum, sum of squares)."""
    n = jax.lax.psum(jnp.asarray(y.shape[0], y.dtype), axis_name)
    s1 = jax.lax.psum(jnp.sum(y), axis_name)
    s2 = jax.lax.psum(jnp.sum(y * y), axis_name)
    mean = s1 / n
    var = (s2 - n * mean * mean) / (n - 1.0)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0) / n)


def price_european_mc_sharded(
    params: HestonParams,
    strike,
    maturity,
    spot,
    key,
    mesh: Mesh,
    *,
    axis: str | None = None,
    rate=0.0,
    dividend=0.0,
    is_call=True,
    n_steps: int = 64,
    n_paths: int = 65536,
    antithetic: bool = True,
):
    """European vanilla via QE MC with ``n_paths`` split over ``axis``.

    ``n_paths`` is the GLOBAL path count; it must divide by the axis size
    (and by 2 per device when antithetic).  Returns ``(price, stderr)``
    scalars.  Each device draws from ``fold_in(key, axis_index)`` — the
    estimate differs from the single-device pricer's only statistically,
    not systematically (cross-validated in tests).
    """
    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    if n_paths % ndev:
        raise ValueError(f"n_paths {n_paths} not divisible by axis size {ndev}")
    n_local = n_paths // ndev
    if antithetic and n_local % 2:
        raise ValueError("antithetic sharded MC needs an even per-device count")

    def local(key_global):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_global, idx)
        paths = simulate_qe(
            params, spot, maturity, k,
            n_steps=n_steps, n_paths=n_local,
            rate=rate, dividend=dividend, antithetic=antithetic,
        )
        dtype = paths.spot.dtype
        sign = jnp.where(jnp.asarray(is_call), 1.0, -1.0).astype(dtype)
        disc = jnp.exp(-jnp.asarray(rate, dtype) * jnp.asarray(maturity, dtype))
        payoff = jnp.maximum(sign * (paths.spot - jnp.asarray(strike, dtype)), 0.0)
        y = _pair_fold(disc * payoff, n_local, antithetic)
        return _global_mean_stderr(y, axis)

    # check_vma=False: the QE scan's initial carry is built from replicated
    # scalars while the per-device key makes the outputs device-varying —
    # sound here (every reduction is an explicit psum), but the static
    # varying-axes checker cannot see that through the jitted simulator.
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=(P(), P()),
        check_vma=False,
    ))
    price, stderr = fn(key)
    return price, stderr


def price_american_lsm_sharded(
    params: HestonParams,
    strike,
    maturity,
    spot,
    key,
    mesh: Mesh,
    *,
    axis: str | None = None,
    rate=0.0,
    dividend=0.0,
    is_call=False,
    n_steps: int = 64,
    n_paths: int = 65536,
    antithetic: bool = True,
):
    """American vanilla via Longstaff-Schwartz with the path axis sharded.

    Semantics match :func:`pde_tpu.solvers.lsm.price_american_lsm` run on
    the same global cross-section: the continuation regression at each
    exercise date is fitted over ALL paths (psum-reduced normal equations),
    so the policy quality does not degrade as devices are added — unlike
    the naive "average P independent LSM prices" estimator, whose
    policy-suboptimality bias grows as per-device samples shrink.
    """
    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    if n_paths % ndev:
        raise ValueError(f"n_paths {n_paths} not divisible by axis size {ndev}")
    n_local = n_paths // ndev
    if antithetic and n_local % 2:
        raise ValueError("antithetic sharded LSM needs an even per-device count")

    def local(key_global):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_global, idx)
        s_path, v_path = simulate_qe_paths(
            params, spot, maturity, k,
            n_steps=n_steps, n_paths=n_local,
            rate=rate, dividend=dividend, antithetic=antithetic,
        )
        dtype = s_path.dtype
        sign = jnp.where(jnp.asarray(is_call), 1.0, -1.0).astype(dtype)
        dt = jnp.asarray(maturity, dtype) / n_steps
        disc = jnp.exp(-jnp.asarray(rate, dtype) * dt)
        cashflow = lsm_backward_induction(
            s_path, v_path, strike, sign, disc, axis_name=axis
        )
        y = _pair_fold(cashflow * disc, n_local, antithetic)
        return _global_mean_stderr(y, axis)

    # check_vma=False: the QE scan's initial carry is built from replicated
    # scalars while the per-device key makes the outputs device-varying —
    # sound here (every reduction is an explicit psum), but the static
    # varying-axes checker cannot see that through the jitted simulator.
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=(P(), P()),
        check_vma=False,
    ))
    price, stderr = fn(key)
    dtype = price.dtype
    sign = jnp.where(jnp.asarray(is_call), 1.0, -1.0).astype(dtype)
    intrinsic = jnp.maximum(
        sign * (jnp.asarray(spot, dtype) - jnp.asarray(strike, dtype)), 0.0
    )
    return jnp.maximum(price, intrinsic), stderr


def calibrate_leverage_sharded(
    params: HestonParams,
    vol_fn,
    spot,
    maturity,
    key,
    mesh: Mesh,
    *,
    axis: str | None = None,
    strikes=None,
    rate=0.0,
    dividend=0.0,
    n_steps: int = 48,
    n_paths: int = 65536,
    n_bins: int = 31,
    antithetic: bool = True,
):
    """Distributed SLV particle calibration: the particle cloud sharded
    over ``axis``, the per-step conditional expectation E[v | S] built from
    GLOBAL statistics by one fused psum of ~2*n_bins scalars per step
    (models/slv.py:_bin_expectation with ``axis_name``).

    Every device therefore computes the SAME leverage rows from the same
    global E[v | S] — the calibration quality matches the single-device
    sweep at the same GLOBAL particle count (cross-validated in tests),
    while the naive alternative (calibrate per device, average surfaces)
    degrades as per-device clouds shrink.

    Returns ``(LeverageSurface, prices, stderrs)`` — the surface replicated,
    and validation vanilla prices over the global terminal cloud for the
    given ``strikes`` (ATM-only when omitted).
    """
    from ..models.slv import calibrate_leverage

    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    if n_paths % ndev:
        raise ValueError(f"n_paths {n_paths} not divisible by axis size {ndev}")
    n_local = n_paths // ndev
    if antithetic and n_local % 2:
        raise ValueError("antithetic sharded SLV needs an even per-device count")
    strikes_a = jnp.atleast_1d(
        jnp.asarray(spot if strikes is None else strikes))

    def local(key_global):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_global, idx)
        lev, paths = calibrate_leverage(
            params, vol_fn, spot, maturity, k,
            n_steps=n_steps, n_paths=n_local, n_bins=n_bins,
            rate=rate, dividend=dividend, antithetic=antithetic,
            axis_name=axis,
        )
        dtype = paths.spot.dtype
        disc = jnp.exp(-jnp.asarray(rate, dtype) * jnp.asarray(maturity, dtype))
        payoff = jnp.maximum(
            paths.spot[:, None] - strikes_a[None, :].astype(dtype), 0.0)
        folded = _pair_fold(disc * payoff, n_local, antithetic)
        price, stderr = jax.vmap(
            lambda col: _global_mean_stderr(col, axis), in_axes=1,
        )(folded)
        return lev, price, stderr

    # check_vma=False: same rationale as the samplers above — the leverage
    # rows are device-invariant BECAUSE they derive from psum'd statistics,
    # which the static checker cannot see through the scan.
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))
    return fn(key)


def bermudan_swaption_lsm_sharded(
    params,
    strike_rate,
    schedule,
    key,
    mesh: Mesh,
    *,
    axis: str | None = None,
    payer: bool = True,
    exercise=None,
    n_paths: int = 65536,
):
    """Bermudan swaption LSM with the path axis sharded over the mesh —
    the multi-chip face of the rates desk's early-exercise engines
    (:func:`pde_tpu.solvers.bermudan_hw.bermudan_swaption_mc` /
    :func:`pde_tpu.solvers.bermudan_g2.bermudan_swaption_g2_mc`).

    Dispatches on the parameter type: one-factor Hull-White
    (``HullWhiteParams``, cubic basis in x) or two-factor G2++
    (``G2Params``, quadratic bivariate basis in (x, y)); both use
    exact-transition exercise-date panels (zero discretization bias).
    Exactly the :func:`price_american_lsm_sharded` pattern: each device
    simulates its own shard, and the continuation regression at each
    exercise date fits the GLOBAL cross-section via one fused psum of
    the Gram/moment sums (4x4+4 scalars for HW, 6x6+6 for G2) — every
    device then applies the identical exercise policy to its local
    paths, so policy quality does not degrade as devices are added.

    Returns ``(price, stderr)``: the in-sample LSM policy value over the
    global path set.  With a single exercise date the policy has no
    regression and the estimator collapses to the plain European MC —
    pinned against the closed-form swaption in tests and the multichip
    dry run.
    """
    from ..core.precision import result_dtype
    from ..models.g2 import G2Params
    from ..models.rates import HullWhiteParams
    from ..solvers import bermudan_g2 as bg2
    from ..solvers import bermudan_hw as bhw

    if not isinstance(params, (HullWhiteParams, G2Params)):
        raise TypeError(
            f"params must be HullWhiteParams or G2Params, got {type(params)}")
    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    if n_paths % ndev:
        raise ValueError(f"n_paths {n_paths} not divisible by axis size {ndev}")
    n_local = n_paths // ndev

    schedule = jnp.asarray(schedule)
    dtype = result_dtype(schedule, params.sigma)
    schedule = schedule.astype(dtype)
    strike_rate = jnp.asarray(strike_rate, dtype)
    m = int(schedule.shape[0]) - 1
    if exercise is None:
        exercise = (True,) * m
    exercise = tuple(bool(b) for b in exercise)
    if len(exercise) != m or not any(exercise):
        raise ValueError("exercise must flag at least one of the M dates")
    ex_idx = tuple(j for j, b in enumerate(exercise) if b)
    n_ex = len(ex_idx)
    ex_arr = jnp.asarray(ex_idx)

    if isinstance(params, HullWhiteParams):
        basis = bhw._mc_basis

        def payoff_at(row, state):
            return jnp.maximum(
                bhw.remaining_swap_value(
                    params, strike_rate, schedule, ex_idx[row], state[0],
                    payer),
                0.0)

        def simulate_local(k):
            xs, log_ds = bhw._simulate_events(
                params, schedule, ex_arr, n_local, k, dtype)
            return (xs,), jnp.exp(log_ds)

    elif isinstance(params, G2Params):
        basis = bg2._basis2
        ex_dates = jnp.concatenate(
            [jnp.zeros((1,), dtype), schedule[ex_arr]])
        steps = [
            bg2._step_sampler(params, ex_dates[r], ex_dates[r + 1], dtype)
            for r in range(n_ex)
        ]

        def payoff_at(row, state):
            return jnp.maximum(
                bg2.remaining_swap_value_g2(
                    params, strike_rate, schedule, ex_idx[row], state[0],
                    state[1], payer),
                0.0)

        def simulate_local(k):
            xs, ys, lds = [], [], []
            xv = jnp.zeros((n_local,), dtype)
            yv = jnp.zeros((n_local,), dtype)
            ld = jnp.zeros((n_local,), dtype)
            for r in range(n_ex):
                k, k_r = jax.random.split(k)
                xv, yv, ld = steps[r](xv, yv, ld, k_r)
                xs.append(xv)
                ys.append(yv)
                lds.append(ld)
            return ((jnp.stack(xs), jnp.stack(ys)),
                    jnp.exp(jnp.stack(lds)))
    else:
        raise TypeError(
            f"params must be HullWhiteParams or G2Params, got {type(params)}")

    def local(key_global):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_global, idx)
        states, ds = simulate_local(k)
        state_at = lambda j: tuple(s[j] for s in states)  # noqa: E731
        pay = jnp.stack(
            [payoff_at(j, state_at(j)) for j in range(n_ex)])

        cash = ds[-1] * pay[-1]
        for j in range(n_ex - 2, -1, -1):
            phi = basis(*state_at(j))
            w = (pay[j] > 0.0).astype(dtype)
            # GLOBAL normal equations: one fused psum per exercise date
            gram = jax.lax.psum((phi * w[:, None]).T @ phi, axis)
            rhs = jax.lax.psum((phi * w[:, None]).T @ (cash / ds[j]), axis)
            gram = gram + 1e-10 * jnp.eye(phi.shape[-1], dtype=dtype)
            beta = jnp.linalg.solve(gram, rhs)
            cont = phi @ beta
            ex = (pay[j] > 0.0) & (pay[j] > cont)
            cash = jnp.where(ex, ds[j] * pay[j], cash)
        return _global_mean_stderr(cash, axis)

    # check_vma=False: same rationale as the samplers above — betas are
    # device-invariant BECAUSE they derive from psum'd Gram/moment sums,
    # which the static varying-axes checker cannot see.
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=(P(), P()),
        check_vma=False,
    ))
    return fn(key)


def cva_netting_sharded(
    params,
    hazard,
    trades,
    schedule,
    key,
    mesh: Mesh,
    *,
    recovery=0.4,
    n_paths: int = 65536,
    axis: str | None = None,
):
    """Netting-set CVA with the exposure-path axis sharded over the mesh.

    The multi-chip face of :func:`pde_tpu.models.credit.cva_netting_hw_mc`:
    each device simulates its own shard of exact Hull-White transitions
    (independently seeded via ``fold_in``), and the per-date discounted
    positive exposure is ``psum``-reduced so every device holds the GLOBAL
    expected-exposure profile.  Communication: one psum of ``n_dates``
    scalars — the whole netting set rides a single collective.

    Returns ``(cva, ee)`` (both replicated across the mesh).
    """
    from ..models.credit import HazardCurve  # noqa: F401  (type anchor)
    from ..solvers.bermudan_hw import _simulate_events, remaining_swap_value

    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    if n_paths % ndev:
        raise ValueError(f"n_paths {n_paths} not divisible by axis size {ndev}")
    n_local = n_paths // ndev

    schedule = jnp.asarray(schedule)
    dtype = schedule.dtype
    n_dates = int(schedule.shape[0]) - 1
    dates = jnp.arange(n_dates)
    strikes = jnp.stack([jnp.asarray(t.strike_rate, dtype) for t in trades])
    signs = jnp.stack([jnp.asarray(t.payer_sign, dtype) for t in trades])
    notionals = jnp.stack([jnp.asarray(t.notional, dtype) for t in trades])

    def local(key_global):
        idx = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_global, idx)
        xs, log_ds = _simulate_events(
            params, schedule, dates, n_local, k, dtype)
        ds = jnp.exp(log_ds)

        def net_value(j):
            vals = jnp.stack([
                signs[t] * notionals[t] * remaining_swap_value(
                    params, strikes[t], schedule, j, xs[j], payer=True)
                for t in range(strikes.shape[0])
            ])
            return jnp.sum(vals, axis=0)

        expo = jnp.stack([
            jnp.sum(ds[j] * jnp.maximum(net_value(j), 0.0))
            for j in range(n_dates)
        ])
        n_tot = jax.lax.psum(jnp.asarray(n_local, dtype), axis)
        return jax.lax.psum(expo, axis) / n_tot

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False))
    ee = fn(key)
    q = hazard.q(schedule)
    dq = q[:-1] - q[1:]
    cva = (1.0 - jnp.asarray(recovery, dtype)) * jnp.sum(ee * dq[:n_dates])
    return cva, ee
