"""Bates (Heston + lognormal jumps) model and calibration tests.

The Bates family is BEYOND the reference (dharvpat/PDE ships Heston/SABR/OU
only, src/cpp/models/); these tests pin the affine-extension seam it rides
on: the ``cf_reduced_extra`` hook in models/heston.py must reduce exactly to
Heston at lam=0, match the independent Merton (1976) series oracle when the
diffusion degenerates, keep the forward a martingale (put-call parity), and
agree with the jump-overlay QE Monte Carlo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import bates, heston
from pde_tpu.models.bates import BatesParams
from pde_tpu.models.heston import HestonParams

BP = BatesParams(
    kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04,
    lam=0.6, mu_j=-0.08, sigma_j=0.18,
)


class TestBatesCF:
    def test_lam_zero_reduces_to_heston(self):
        """lam=0 must reproduce the Heston price bit-for-near-bit: the jump
        factor is exp(0) = 1."""
        bp = BP._replace(lam=jnp.asarray(0.0))
        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        K = jnp.linspace(70.0, 130.0, 13)
        for T in (0.1, 0.5, 2.0):
            p_b = bates.price_accurate(bp, K, T, 100.0, 0.05, 0.02)
            p_h = heston.price_accurate(hp, K, T, 100.0, 0.05, 0.02)
            np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_h),
                                       rtol=1e-12, atol=1e-12)

    def test_merton_series_oracle(self):
        """Degenerate diffusion (sigma -> 0, v0 = theta) + jumps must match
        the Merton (1976) Poisson-weighted BS series, an independent numpy
        float64 oracle."""
        vol = 0.2
        bp = BatesParams(
            kappa=1.0, theta=vol**2, sigma=1e-4, rho=0.0, v0=vol**2,
            lam=0.7, mu_j=-0.1, sigma_j=0.2,
        )
        K = np.linspace(75.0, 130.0, 12)
        for T in (0.25, 1.0):
            for is_call in (True, False):
                p = np.asarray(bates.price_accurate(
                    bp, jnp.asarray(K), T, 100.0, 0.05, 0.02, is_call=is_call))
                ref = bates.merton_reference_price(
                    K, T, 100.0, 0.05, 0.02, vol, 0.7, -0.1, 0.2,
                    is_call=is_call)
                np.testing.assert_allclose(p, ref, rtol=2e-5, atol=2e-5)

    def test_put_call_parity(self):
        """The compensated jump factor is 1 at u = -i, so the forward — and
        with it put-call parity — must hold exactly."""
        K = jnp.linspace(60.0, 140.0, 17)
        T, S0, r, q = 0.75, 100.0, 0.04, 0.01
        call = np.asarray(bates.price_accurate(BP, K, T, S0, r, q, is_call=True))
        put = np.asarray(bates.price_accurate(BP, K, T, S0, r, q, is_call=False))
        parity = S0 * np.exp(-q * T) - np.asarray(K) * np.exp(-r * T)
        np.testing.assert_allclose(call - put, parity, atol=1e-9)

    def test_jumps_fatten_the_smile(self):
        """Downward jumps must raise OTM-put implied vol relative to the
        pure-diffusion smile — the economic reason the model exists."""
        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        K, T, S0 = 75.0, 0.25, 100.0
        p_b = bates.price_accurate(BP, K, T, S0, 0.03, 0.0, is_call=False)
        p_h = heston.price_accurate(hp, K, T, S0, 0.03, 0.0, is_call=False)
        assert float(p_b) > float(p_h) * 1.2

    def test_grouped_matches_scalar(self):
        K = np.array([80.0, 95.0, 110.0, 80.0, 95.0, 110.0])
        T = np.array([0.25, 0.25, 0.25, 1.0, 1.0, 1.0])
        unique_T, t_idx = heston.group_maturities(T)
        grouped = np.asarray(heston.price_accurate_gl_grouped(
            BP, jnp.asarray(K), jnp.asarray(t_idx), jnp.asarray(unique_T),
            100.0, 0.05, 0.02, True))
        scalar = np.asarray([
            float(bates.price_accurate(BP, k, t, 100.0, 0.05, 0.02))
            for k, t in zip(K, T)
        ])
        np.testing.assert_allclose(grouped, scalar, rtol=5e-6, atol=5e-6)

    def test_full_cf_hook(self):
        """characteristic_function (spot-carrying form) gets the jump factor
        too, and equals the Heston CF at lam=0."""
        u = jnp.asarray([0.5 + 0.0j, 2.0 - 1.25j])
        phi_b = bates.heston_model.characteristic_function(
            BP._replace(lam=jnp.asarray(0.0)), u, 0.5, 100.0, 0.03, 0.0)
        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        phi_h = heston.characteristic_function(hp, u, 0.5, 100.0, 0.03, 0.0)
        np.testing.assert_allclose(np.asarray(phi_b), np.asarray(phi_h),
                                   rtol=1e-12)

    def test_validate(self):
        BP.validate()
        with pytest.raises(ValueError):
            BP._replace(lam=jnp.asarray(-0.1)).validate()
        with pytest.raises(ValueError):
            BP._replace(sigma_j=jnp.asarray(0.0)).validate()

    def test_array_roundtrip(self):
        arr = BP.to_array()
        assert arr.shape == (8,)
        back = BatesParams.from_array(arr)
        for a, b in zip(BP, back):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestBatesMC:
    @pytest.mark.slow
    def test_european_mc_vs_cf(self):
        """QE + jump-overlay MC must agree with the CF quadrature price."""
        K = jnp.asarray([85.0, 100.0, 115.0])
        T, S0, r, q = 0.5, 100.0, 0.04, 0.01
        price, stderr = bates.price_european_mc(
            BP, K, T, S0, jax.random.PRNGKey(7), rate=r, dividend=q,
            n_steps=48, n_paths=65536)
        cf = bates.price_accurate(BP, K, T, S0, r, q)
        err = np.abs(np.asarray(price) - np.asarray(cf))
        tol = 4.0 * np.asarray(stderr) + 0.03
        assert np.all(err < tol), (err, np.asarray(stderr))

    @pytest.mark.slow
    def test_forward_martingale(self):
        """Discounted terminal spot must have mean S0 e^{-qT}: the jump
        compensator in the simulator is doing its job."""
        paths = bates.simulate_qe(
            BP, 100.0, 1.0, jax.random.PRNGKey(3),
            n_steps=64, n_paths=131072, rate=0.06, dividend=0.02)
        mean_disc = float(jnp.mean(paths.spot)) * np.exp(-0.06)
        target = 100.0 * np.exp(-0.02)
        assert abs(mean_disc - target) / target < 0.01

    @pytest.mark.slow
    def test_exotics_sanity(self):
        """Path-payoff estimators see the jumps: the knock-out DISCOUNT
        (vanilla minus down-and-out barrier) must be larger under heavy
        downward jumps than under the pure diffusion — jumps both fatten the
        vanilla and breach the barrier more often, so comparing barrier
        prices directly is not a clean signal; the discount is."""
        from pde_tpu.models import heston_mc

        key = jax.random.PRNGKey(11)
        kw = dict(barrier_type="down-and-out", rate=0.03,
                  n_steps=48, n_paths=32768)
        b_px, _ = heston_mc.price_barrier_mc(
            BP, 100.0, 80.0, 0.5, 100.0, key,
            simulate_fn=bates.simulate_qe, **kw)
        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        h_px, _ = heston_mc.price_barrier_mc(
            hp, 100.0, 80.0, 0.5, 100.0, key, **kw)
        # control variate off: same key => identical paths as the barrier
        # estimator, so barrier <= vanilla holds PATHWISE (a CV-adjusted
        # vanilla can land below the raw barrier mean by estimator noise)
        mc_kw = dict(rate=0.03, n_steps=48, n_paths=32768,
                     control_variate=False)
        vanilla_b, _ = bates.price_european_mc(BP, 100.0, 0.5, 100.0, key, **mc_kw)
        vanilla_h, _ = heston_mc.price_european_mc(hp, 100.0, 0.5, 100.0, key, **mc_kw)
        assert float(b_px) < float(vanilla_b)
        discount_bates = float(vanilla_b) - float(b_px)
        discount_heston = float(vanilla_h) - float(h_px)
        assert discount_bates > discount_heston * 1.1, (
            discount_bates, discount_heston)


@pytest.mark.slow
class TestBatesAmerican:
    def test_lam_zero_matches_heston_lsm(self):
        """Jump-overlay LSM at lam = 0 must agree with the plain Heston LSM
        within MC noise (different key-split trees => different draws, so
        the comparison is statistical, not bitwise)."""
        from pde_tpu.solvers import lsm

        bp0 = BP._replace(lam=jnp.asarray(0.0))
        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        kw = dict(rate=0.04, dividend=0.0, n_steps=32, n_paths=32768)
        p_b, se_b = bates.price_american_mc(
            bp0, 105.0, 0.5, 100.0, jax.random.PRNGKey(5), **kw)
        p_h, se_h = lsm.price_american_lsm(
            hp, 105.0, 0.5, 100.0, jax.random.PRNGKey(6), **kw)
        tol = 4.0 * float(jnp.sqrt(se_b**2 + se_h**2)) + 0.02
        assert abs(float(p_b) - float(p_h)) < tol

    def test_early_exercise_premium_under_jumps(self):
        """American put >= European put (CF) under Bates, and the premium is
        positive for an ITM put with positive rates."""
        key = jax.random.PRNGKey(9)
        K, T, S0, r = 110.0, 1.0, 100.0, 0.06
        am, se = bates.price_american_mc(
            BP, K, T, S0, key, rate=r, n_steps=50, n_paths=32768)
        eu = float(bates.price_accurate(BP, K, T, S0, r, 0.0, is_call=False))
        assert float(am) > eu - 3.0 * float(se)
        assert float(am) >= K - S0  # >= intrinsic by construction
        premium = float(am) - eu
        assert premium > 0.05, (float(am), eu)

    def test_jumps_raise_american_put_value(self):
        """Downward jumps fatten the left tail: the Bates American put must
        exceed the pure-diffusion American put (same diffusion params)."""
        from pde_tpu.solvers import lsm

        hp = HestonParams(BP.kappa, BP.theta, BP.sigma, BP.rho, BP.v0)
        key = jax.random.PRNGKey(13)
        kw = dict(rate=0.03, n_steps=32, n_paths=32768)
        p_b, se_b = bates.price_american_mc(BP, 95.0, 0.5, 100.0, key, **kw)
        p_h, se_h = lsm.price_american_lsm(hp, 95.0, 0.5, 100.0, key, **kw)
        assert float(p_b) > float(p_h) + 2.0 * float(se_b)


class TestOrchestratorBates:
    def test_bates_failure_is_isolated(self):
        """A bates-stage exception degrades to PARTIAL and never poisons the
        classic results (per-model isolation, reference orchestrator
        semantics)."""
        from pde_tpu.calibrate import HestonCalibrator
        from pde_tpu.calibrate.orchestrator import (
            CalibrationConfig,
            CalibrationOrchestrator,
            CalibrationStatus,
        )

        class Boom:
            def calibrate(self, *a, **k):
                raise RuntimeError("boom")

        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0, n_strikes=7, n_maturities=2
        )
        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_sabr=False, calibrate_bates=True,
                risk_free_rate=0.05, dividend_yield=0.0,
            ),
            heston_calibrator=HestonCalibrator(global_maxiter=15, global_popsize=6),
            bates_calibrator=Boom(),
        )
        res = orch.run_daily_calibration("TEST", data, S0=100.0)
        assert res.heston_result is not None
        assert res.bates_result is None
        assert any("bates" in e for e in res.errors)
        assert res.status == CalibrationStatus.PARTIAL

    @pytest.mark.slow
    def test_bates_opt_in_runs_and_reports(self):
        """calibrate_bates=True adds an 8-parameter jump refinement seeded
        from the classic fit; data generated by the Bates pricer itself must
        fit with tiny residuals."""
        from pde_tpu.calibrate import HestonCalibrator
        from pde_tpu.calibrate.bates import BatesCalibrator
        from pde_tpu.calibrate.orchestrator import (
            CalibrationConfig,
            CalibrationOrchestrator,
            CalibrationStatus,
        )

        data = BatesCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0,
            lam=0.5, mu_j=-0.1, sigma_j=0.15,
            n_strikes=7, n_maturities=2,
        )
        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_sabr=False, calibrate_bates=True,
                risk_free_rate=0.05, dividend_yield=0.0,
            ),
            heston_calibrator=HestonCalibrator(global_maxiter=20, global_popsize=6),
            bates_calibrator=BatesCalibrator(
                global_maxiter=25, global_popsize=12, local_max_iter=30,
                warm_start_heston=False,  # x0 comes from the orchestrator
            ),
        )
        res = orch.run_daily_calibration("TEST", data, S0=100.0)
        assert res.bates_result is not None
        assert res.bates_result.rmse < 5e-3
        assert res.status in (CalibrationStatus.SUCCESS, CalibrationStatus.PARTIAL)


@pytest.mark.slow
class TestBatesCalibration:
    def test_recovers_synthetic_surface(self):
        from pde_tpu.calibrate.bates import BatesCalibrator

        true = dict(kappa=2.0, theta=0.04, sigma=0.35, rho=-0.65, v0=0.05,
                    lam=0.5, mu_j=-0.1, sigma_j=0.15)
        data = BatesCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.02, **true)
        cal = BatesCalibrator(global_maxiter=40, global_popsize=16,
                              local_max_iter=40, seed=1)
        res = cal.calibrate(
            data["strike"], data["maturity"], data["mid_price"],
            S0=100.0, r=0.05, q=0.02, is_calls=data["is_call"])
        assert res.rmse < 5e-3, res.to_dict()
        # price-space recovery is the contract (8-param Bates has genuine
        # jump/diffusion identification degeneracy; exact parameter-space
        # recovery is not guaranteed on a noiseless but finite chain)
        assert res.fit_quality["r_squared"] > 0.999
