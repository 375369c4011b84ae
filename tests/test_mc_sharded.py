"""Mesh-sharded Monte Carlo (pde_tpu/parallel/mc.py) on the 8-device
virtual CPU mesh.

The load-bearing test is the exact one: the LSM backward induction run with
the path axis sharded must reproduce the single-device induction on the
SAME paths to float64 round-off — that proves the psum-reduced regression
is the global regression, not eight local ones averaged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pde_tpu.models.heston import HestonParams
from pde_tpu.models.heston_mc import price_european_mc, simulate_qe_paths
from pde_tpu.parallel.mc import (
    price_american_lsm_sharded,
    price_european_mc_sharded,
)
from pde_tpu.parallel.mesh import make_mesh
from pde_tpu.solvers.lsm import lsm_backward_induction, price_american_lsm

PARAMS = HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_names=("dp",), shape=(8,))


class TestDistributedRegressionExact:
    def test_sharded_backward_induction_matches_unsharded_on_same_paths(self, mesh):
        """Same stored paths, path axis sharded 8 ways: the psum-reduced
        normal equations must give the identical exercise policy, so the
        per-path cashflows agree to reduction-order round-off."""
        key = jax.random.PRNGKey(7)
        s_path, v_path = simulate_qe_paths(
            PARAMS, 100.0, 1.0, key, n_steps=16, n_paths=4096,
            rate=0.05, antithetic=False,
        )
        disc = jnp.exp(jnp.asarray(-0.05 * 1.0 / 16, s_path.dtype))

        ref = lsm_backward_induction(s_path, v_path, 100.0, -1.0, disc)

        spec = P(None, "dp")
        sharded = jax.jit(jax.shard_map(
            lambda s, v: lsm_backward_induction(
                s, v, 100.0, -1.0, disc, axis_name="dp"
            ),
            mesh=mesh, in_specs=(spec, spec), out_specs=P("dp"),
        ))(s_path, v_path)

        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(ref), rtol=0, atol=1e-9
        )

    def test_global_regression_beats_local_averaging(self, mesh):
        """Sanity on WHY the psum matters: 8 independent 512-path local
        regressions disagree with the global 4096-path one (different
        policy on at least some paths)."""
        key = jax.random.PRNGKey(7)
        s_path, v_path = simulate_qe_paths(
            PARAMS, 100.0, 1.0, key, n_steps=16, n_paths=4096,
            rate=0.05, antithetic=False,
        )
        disc = jnp.exp(jnp.asarray(-0.05 * 1.0 / 16, s_path.dtype))
        spec = P(None, "dp")
        local_only = jax.jit(jax.shard_map(
            lambda s, v: lsm_backward_induction(s, v, 100.0, -1.0, disc),
            mesh=mesh, in_specs=(spec, spec), out_specs=P("dp"),
        ))(s_path, v_path)
        global_reg = jax.jit(jax.shard_map(
            lambda s, v: lsm_backward_induction(
                s, v, 100.0, -1.0, disc, axis_name="dp"
            ),
            mesh=mesh, in_specs=(spec, spec), out_specs=P("dp"),
        ))(s_path, v_path)
        assert float(jnp.max(jnp.abs(local_only - global_reg))) > 1e-6


class TestShardedEuropean:
    def test_statistically_consistent_with_single_device(self, mesh):
        price_1, stderr_1 = price_european_mc(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(3),
            rate=0.05, n_steps=32, n_paths=16384,
        )
        price_8, stderr_8 = price_european_mc_sharded(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(3), mesh,
            rate=0.05, n_steps=32, n_paths=16384,
        )
        # independent draws of the same estimand
        tol = 4.0 * float(jnp.hypot(stderr_1, stderr_8)) + 1e-6
        assert abs(float(price_8) - float(price_1)) < tol
        assert 0.0 < float(stderr_8) < 1.0

    def test_divisibility_validation(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            price_european_mc_sharded(
                PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(0), mesh,
                n_paths=1001,
            )


class TestShardedLSM:
    def test_price_matches_unsharded_lsm_statistically(self, mesh):
        price_1, stderr_1 = price_american_lsm(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(11),
            rate=0.05, is_call=False, n_steps=16, n_paths=16384,
        )
        price_8, stderr_8 = price_american_lsm_sharded(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(11), mesh,
            rate=0.05, is_call=False, n_steps=16, n_paths=16384,
        )
        tol = 4.0 * float(jnp.hypot(stderr_1, stderr_8)) + 1e-6
        assert abs(float(price_8) - float(price_1)) < tol

    def test_american_premium_positive(self, mesh):
        """The sharded American put must sit above the European put."""
        eur, _ = price_european_mc_sharded(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(5), mesh,
            rate=0.05, is_call=False, n_steps=16, n_paths=16384,
        )
        amer, stderr = price_american_lsm_sharded(
            PARAMS, 100.0, 1.0, 100.0, jax.random.PRNGKey(5), mesh,
            rate=0.05, is_call=False, n_steps=16, n_paths=16384,
        )
        assert float(amer) > float(eur) - 4.0 * float(stderr)


class TestShardedSLVCalibration:
    def test_bin_expectation_sharded_is_exactly_global(self, mesh):
        """The psum'd conditional expectation must equal the single-device
        one on the concatenated cloud — bit-for-bit up to reduction order.
        This is the whole correctness content of the distributed particle
        method: every device regresses on the GLOBAL cloud."""
        from pde_tpu.models.slv import _bin_expectation

        rng = np.random.default_rng(0)
        n_bins = 11
        edges = jnp.linspace(4.0, 5.2, n_bins + 1)
        ln_s = jnp.asarray(rng.normal(4.6, 0.25, 8 * 512))
        v = jnp.asarray(rng.gamma(2.0, 0.02, 8 * 512))
        ev_single, _ = _bin_expectation(ln_s, v, edges, n_bins)

        def local(ls, vv):
            ev, _ = _bin_expectation(ls, vv, edges, n_bins, axis_name="dp")
            return ev

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P(),
            check_vma=False,
        ))
        ev_sharded = fn(ln_s, v)
        np.testing.assert_allclose(np.asarray(ev_sharded),
                                   np.asarray(ev_single), rtol=1e-12)

    @pytest.mark.slow
    def test_sharded_calibration_reprices_target(self, mesh):
        """Full distributed particle calibration on the 8-device mesh:
        mixed dynamics (vol-of-vol halved) calibrated to the target's
        Dupire surface re-price its vanillas within the documented bias."""
        from pde_tpu.models import heston, local_vol
        from pde_tpu.parallel.mc import calibrate_leverage_sharded

        HP = HestonParams(2.0, 0.04, 0.4, -0.6, 0.05)
        S0, R, Q, T = 100.0, 0.04, 0.01, 0.75
        Ks = jnp.asarray(np.exp(np.linspace(np.log(55.0), np.log(180.0), 24)))
        Ts = jnp.asarray([0.01, 0.05, 0.15, 0.35, 0.6, 0.95])
        surf = local_vol.dupire_surface(HP, Ks, Ts, S0, R, Q)
        interp = local_vol.SurfaceInterpolator(Ks, Ts, surf)
        mixed = HP._replace(sigma=jnp.asarray(0.2))
        strikes = jnp.asarray([90.0, 100.0, 110.0])
        lev, prices, stderrs = calibrate_leverage_sharded(
            mixed, interp, S0, T, jax.random.PRNGKey(3), mesh,
            strikes=strikes, rate=R, dividend=Q,
            n_steps=32, n_paths=32768, n_bins=25,
        )
        assert lev.values.shape == (32, 25)
        assert np.all(np.isfinite(np.asarray(lev.values)))
        cf = np.asarray(heston.price_accurate(HP, strikes, T, S0, R, Q))
        err = np.abs(np.asarray(prices) - cf) / cf
        # documented bias at this resolution ~0.6-2%; + MC noise at 32k paths
        assert np.all(err < 0.03), (np.asarray(prices), cf, err)


class TestShardedCVA:
    def test_sharded_cva_matches_closed_form(self, mesh):
        """Path-sharded netting CVA vs the single-swap Jamshidian strip."""
        from pde_tpu.models import credit, rates
        from pde_tpu.parallel.mc import cva_netting_sharded

        curve = rates.curve_from_zero_rates(
            jnp.array([1.0, 5.0, 10.0]), jnp.array([0.03, 0.04, 0.042]))
        hw = rates.HullWhiteParams(
            jnp.asarray(0.1), jnp.asarray(0.012), curve)
        sched = jnp.arange(0.5, 3.01, 0.5)
        K = rates.hw_swap_rate(curve, 0.5, sched[1:])
        hz = credit.flat_hazard(0.02)
        trade = credit.SwapTrade(K, jnp.asarray(1.0), jnp.asarray(1.0))
        cva, ee = cva_netting_sharded(
            hw, hz, [trade], sched, jax.random.PRNGKey(0), mesh,
            n_paths=8 * 2048)
        cf = float(credit.cva_swap_hw(hw, hz, K, sched))
        assert abs(float(cva) / cf - 1.0) < 0.1
        # EE profile: every date's exposure equals the matching swaption
        for j in range(len(sched) - 1):
            sw = float(rates.hw_swaption(
                hw, K, float(sched[j]), sched[j + 1:]))
            assert abs(float(ee[j]) / max(sw, 1e-12) - 1.0) < 0.25

    def test_sharded_cva_divisibility(self, mesh):
        from pde_tpu.models import credit, rates
        from pde_tpu.parallel.mc import cva_netting_sharded

        curve = rates.flat_curve(0.03)
        hw = rates.HullWhiteParams(
            jnp.asarray(0.1), jnp.asarray(0.012), curve)
        trade = credit.SwapTrade(
            jnp.asarray(0.03), jnp.asarray(1.0), jnp.asarray(1.0))
        with pytest.raises(ValueError, match="divisible"):
            cva_netting_sharded(
                hw, credit.flat_hazard(0.02), [trade],
                jnp.arange(0.5, 2.01, 0.5), jax.random.PRNGKey(0), mesh,
                n_paths=8 * 100 + 3)


class TestShardedBermudanLSM:
    """Path-sharded Bermudan swaption LSM (HW + G2): psum-reduced
    regression normal equations, European collapse pins, and the
    single-device sandwich cross-check."""

    @pytest.fixture(scope="class")
    def rates_setup(self):
        from pde_tpu.models import rates

        curve = rates.curve_from_zero_rates(
            jnp.array([1.0, 5.0, 10.0]), jnp.array([0.03, 0.04, 0.042]))
        hw = rates.HullWhiteParams(jnp.asarray(0.1), jnp.asarray(0.012),
                                   curve)
        sched = jnp.arange(1.0, 5.01, 0.5)
        K = rates.hw_swap_rate(curve, 1.0, sched[1:])
        return rates, curve, hw, sched, K

    def test_hw_european_collapse_matches_closed_form(self, mesh, rates_setup):
        """Single exercise date -> no regression -> plain European MC,
        which must agree with the Jamshidian closed form to MC error."""
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded

        rates, curve, hw, sched, K = rates_setup
        m = len(sched) - 1
        exercise = (False,) * (m - 1) + (True,)
        price, se = bermudan_swaption_lsm_sharded(
            hw, K, sched, jax.random.PRNGKey(3), mesh,
            exercise=exercise, n_paths=8 * 4096)
        cf = float(rates.hw_swaption(hw, K, float(sched[-2]), sched[-1:]))
        assert abs(float(price) - cf) < 4.0 * float(se) + 1e-6, (
            float(price), cf, float(se))

    def test_hw_bermudan_inside_single_device_sandwich(self, mesh, rates_setup):
        """The sharded in-sample policy value must land inside (or within
        MC error of) the single-device lower/upper dual sandwich, and
        dominate the most expensive European component."""
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded
        from pde_tpu.solvers.bermudan_hw import bermudan_swaption_mc

        rates, curve, hw, sched, K = rates_setup
        price, se = bermudan_swaption_lsm_sharded(
            hw, K, sched, jax.random.PRNGKey(4), mesh, n_paths=8 * 4096)
        lower, se_lo, upper, se_up = bermudan_swaption_mc(
            hw, K, sched, jax.random.PRNGKey(5),
            n_paths=16384, n_outer=256, n_inner=32)
        assert float(price) > 0.0
        assert float(price) >= float(lower) - 4.0 * (float(se) + float(se_lo))
        assert float(price) <= float(upper) + 4.0 * (float(se) + float(se_up))
        # Bermudan >= best European (max over single exercise dates at ATM
        # forward strike, the first date's swaption is the usual floor)
        eur0 = float(rates.hw_swaption(hw, K, float(sched[0]), sched[1:]))
        assert float(price) >= eur0 - 4.0 * float(se)

    def test_hw_sharded_statistically_matches_one_device_mesh(self, rates_setup):
        """8-device and 1-device meshes draw different shard seeds but the
        SAME estimator; prices agree within combined MC error."""
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded

        rates, curve, hw, sched, K = rates_setup
        mesh8 = make_mesh(8, axis_names=("dp",), shape=(8,))
        mesh1 = make_mesh(1, axis_names=("dp",), shape=(1,))
        p8, se8 = bermudan_swaption_lsm_sharded(
            hw, K, sched, jax.random.PRNGKey(6), mesh8, n_paths=8 * 2048)
        p1, se1 = bermudan_swaption_lsm_sharded(
            hw, K, sched, jax.random.PRNGKey(6), mesh1, n_paths=8 * 2048)
        tol = 4.0 * (float(se8) + float(se1))
        assert abs(float(p8) - float(p1)) < tol, (float(p8), float(p1), tol)

    def test_g2_european_collapse_matches_gauss_hermite(self, mesh, rates_setup):
        """Two-factor dispatch: single-date collapse onto the G2++
        Gauss-Hermite European swaption formula."""
        from pde_tpu.models import g2 as g2_mod
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded

        rates, curve, hw, sched, K = rates_setup
        g2p = g2_mod.G2Params(
            jnp.asarray(0.5), jnp.asarray(0.1), jnp.asarray(0.008),
            jnp.asarray(0.006), jnp.asarray(-0.6), curve)
        m = len(sched) - 1
        exercise = (False,) * (m - 1) + (True,)
        price, se = bermudan_swaption_lsm_sharded(
            g2p, K, sched, jax.random.PRNGKey(7), mesh,
            exercise=exercise, n_paths=8 * 4096)
        cf = float(g2_mod.g2_swaption(g2p, K, float(sched[-2]), sched[-1:]))
        assert abs(float(price) - cf) < 4.0 * float(se) + 1e-6, (
            float(price), cf, float(se))

    def test_g2_bermudan_floors_europeans(self, mesh, rates_setup):
        from pde_tpu.models import g2 as g2_mod
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded

        rates, curve, hw, sched, K = rates_setup
        g2p = g2_mod.G2Params(
            jnp.asarray(0.5), jnp.asarray(0.1), jnp.asarray(0.008),
            jnp.asarray(0.006), jnp.asarray(-0.6), curve)
        price, se = bermudan_swaption_lsm_sharded(
            g2p, K, sched, jax.random.PRNGKey(8), mesh, n_paths=8 * 2048)
        eur0 = float(g2_mod.g2_swaption(g2p, K, float(sched[0]), sched[1:]))
        assert float(price) >= eur0 - 4.0 * float(se)

    def test_rejects_unknown_params_and_bad_paths(self, mesh, rates_setup):
        from pde_tpu.parallel.mc import bermudan_swaption_lsm_sharded

        rates, curve, hw, sched, K = rates_setup
        with pytest.raises(ValueError, match="divisible"):
            bermudan_swaption_lsm_sharded(
                hw, K, sched, jax.random.PRNGKey(0), mesh, n_paths=8 * 64 + 1)
        with pytest.raises(TypeError, match="HullWhiteParams or G2Params"):
            bermudan_swaption_lsm_sharded(
                object(), K, sched, jax.random.PRNGKey(0), mesh,
                n_paths=8 * 64)
