"""Calibration tests: optimizer correctness + synthetic round-trip recovery
(the reference pattern, tests/python/calibration/test_calibration.py:98-395)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.calibrate import de as de_mod
from pde_tpu.calibrate import lm as lm_mod
from pde_tpu.calibrate.heston import CalibrationError, HestonCalibrator
from pde_tpu.calibrate.orchestrator import (
    CalibrationOrchestrator,
    CalibrationConfig,
    CalibrationStatus,
)
from pde_tpu.calibrate.ou import OUFitter
from pde_tpu.calibrate.sabr import SABRCalibrator
from pde_tpu.models.sabr import SABRParams


class TestLM:
    def test_rosenbrock_valley(self):
        def residuals(x):
            return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        res = lm_mod.levenberg_marquardt(
            residuals,
            jnp.array([-1.2, 1.0]),
            jnp.array([-2.0, -2.0]),
            jnp.array([2.0, 2.0]),
            max_iter=100,
        )
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)

    def test_linear_least_squares_exact(self, rng):
        A = jnp.asarray(rng.standard_normal((20, 3)))
        x_true = jnp.array([0.5, -1.0, 2.0])
        b = A @ x_true

        res = lm_mod.levenberg_marquardt(
            lambda x: A @ x - b,
            jnp.zeros(3),
            jnp.full(3, -5.0),
            jnp.full(3, 5.0),
            max_iter=50,
        )
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-8)

    def test_respects_bounds(self):
        res = lm_mod.levenberg_marquardt(
            lambda x: x - 10.0,
            jnp.array([0.0]),
            jnp.array([-1.0]),
            jnp.array([1.0]),
            max_iter=30,
        )
        assert float(res.x[0]) == 1.0  # clipped at the boundary

    def test_vmapped_multistart(self, rng):
        def residuals(x):
            return jnp.array([x[0] ** 2 - 4.0, x[1] - 1.0])

        x0s = jnp.asarray(rng.uniform(0.5, 3.0, (6, 2)))
        fit = jax.vmap(
            lambda x0: lm_mod.levenberg_marquardt(
                residuals, x0, jnp.array([0.0, -5.0]), jnp.array([5.0, 5.0]), max_iter=60
            ).x
        )
        out = np.asarray(fit(x0s))
        np.testing.assert_allclose(out[:, 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(out[:, 1], 1.0, atol=1e-5)


class TestDE:
    def test_sphere(self):
        def objective(pop):
            return jnp.sum((pop - jnp.array([0.3, -0.7, 1.1])) ** 2, axis=-1)

        res = de_mod.differential_evolution(
            objective,
            jnp.array([-2.0, -2.0, -2.0]),
            jnp.array([2.0, 2.0, 2.0]),
            jax.random.PRNGKey(0),
            maxiter=120,
        )
        np.testing.assert_allclose(np.asarray(res.x), [0.3, -0.7, 1.1], atol=2e-2)

    def test_rastrigin_multimodal(self):
        def objective(pop):
            return jnp.sum(
                pop**2 - 10.0 * jnp.cos(2.0 * jnp.pi * pop) + 10.0, axis=-1
            )

        res = de_mod.differential_evolution(
            objective,
            jnp.array([-5.12, -5.12]),
            jnp.array([5.12, 5.12]),
            jax.random.PRNGKey(1),
            popsize=20,
            maxiter=200,
        )
        assert float(res.fun) < 1e-2  # global basin found

    def test_target_energy_stops_early(self):
        def objective(pop):
            return jnp.sum((pop - 0.3) ** 2, axis=-1)

        kw = dict(
            lower=jnp.array([-2.0, -2.0]), upper=jnp.array([2.0, 2.0]),
            key=jax.random.PRNGKey(4), maxiter=150,
        )
        full = de_mod.differential_evolution(objective, **kw)
        stopped = de_mod.differential_evolution(
            objective, target_energy=1e-3, **kw
        )
        # fires well before the budget, at a solution inside the target
        assert int(stopped.n_iter) < int(full.n_iter)
        assert float(stopped.fun) <= 1e-3
        # an infeasibility-penalty plateau (the 1e10 flag) must NOT satisfy
        # any criterion — the guard keeps the search alive
        plateau = de_mod.differential_evolution(
            lambda pop: jnp.full(pop.shape[0], 1e10),
            target_energy=1e-3, **kw,
        )
        assert int(plateau.n_iter) == 150

    def test_warm_start_seeds_population(self):
        def objective(pop):
            return jnp.sum(pop**2, axis=-1)

        res = de_mod.differential_evolution(
            objective,
            jnp.array([-1.0]),
            jnp.array([1.0]),
            jax.random.PRNGKey(2),
            x0=jnp.array([0.0]),
            maxiter=1,
        )
        assert float(res.fun) <= 1e-12  # x0 already optimal, retained


class TestHestonCalibration:
    """Synthetic round-trip (the reference north-star test,
    test_calibration.py:125)."""

    TRUE = dict(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)

    @pytest.fixture(scope="class")
    def result(self):
        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.02, **self.TRUE, n_strikes=11, n_maturities=3
        )
        cal = HestonCalibrator(global_maxiter=40, global_popsize=10, seed=42)
        return cal.calibrate(data, S0=100.0, r=0.05, q=0.02)

    def test_parameter_recovery(self, result):
        p = result.params
        # v0 and theta are strongly identified; kappa/sigma/rho less so
        assert abs(p.v0 - self.TRUE["v0"]) < 0.005
        assert abs(p.theta - self.TRUE["theta"]) < 0.01
        assert abs(p.rho - self.TRUE["rho"]) < 0.15
        assert abs(p.kappa - self.TRUE["kappa"]) < 1.0
        assert abs(p.sigma - self.TRUE["sigma"]) < 0.15

    def test_fit_quality(self, result):
        assert result.fit_quality["rmse"] < 0.05
        assert result.fit_quality["r_squared"] > 0.999
        assert result.success

    def test_de_early_stop_fires_with_identical_recovery(self, result):
        """Round-2 verdict #9: the floor-immune early-stop criteria must be
        ON for the flagship Heston stage and actually fire — the DE stops
        well short of its generation budget on the golden surface, while
        the same fixture's recovery/fit assertions (above) still hold."""
        nit = result.convergence["global_nit"]
        assert 0 < nit < 40, f"DE ran all {nit} generations — no early stop"

    def test_warm_start_path(self):
        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.02, **self.TRUE, n_strikes=7, n_maturities=2
        )
        cal = HestonCalibrator(global_maxiter=5, global_popsize=6)
        res = cal.calibrate(
            data, S0=100.0, r=0.05, q=0.02, warm_start=dict(self.TRUE)
        )
        # warm-started at the truth, LM should stay there
        assert res.fit_quality["rmse"] < 0.01

    def test_validation_errors(self):
        cal = HestonCalibrator()
        with pytest.raises((ValueError, CalibrationError)):
            cal.calibrate(
                {"strike": [100.0], "maturity": [1.0], "mid_price": [-5.0]},
                S0=100.0,
                r=0.05,
                q=0.0,
            )

    def test_feller_warning_surfaces(self):
        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0,
            kappa=0.5, theta=0.02, sigma=0.9, rho=-0.3, v0=0.04,
            n_strikes=9, n_maturities=2,
        )
        cal = HestonCalibrator(global_maxiter=30, global_popsize=8)
        res = cal.calibrate(data, S0=100.0, r=0.05, q=0.0)
        if not res.params.feller_satisfied():
            assert any("Feller" in w for w in res.warnings)

    def test_moment_explosion_warning(self):
        from pde_tpu.calibrate.heston import HestonCalibrator
        from pde_tpu.models.heston import HestonParams

        # near the 1.75-moment explosion horizon (T* = 2.14) -> warn
        bad = HestonParams(1.345, 0.192, 1.601, 0.286, 0.724)
        ws = HestonCalibrator._validate_parameters(bad, max_maturity=2.0)
        assert any("Carr-Madan validity" in w for w in ws)
        # benign parameters never warn
        good = HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
        ws = HestonCalibrator._validate_parameters(good, max_maturity=2.0)
        assert not any("Carr-Madan" in w for w in ws)


class TestSABRCalibration:
    TRUE = dict(alpha=0.25, beta=0.5, rho=-0.3, nu=0.5)

    def test_single_smile_recovery(self):
        strikes, vols = SABRCalibrator.generate_synthetic_smile(
            F=100.0, T=0.5, **self.TRUE, n_strikes=11
        )
        cal = SABRCalibrator(beta=0.5)
        params, rmse = cal.calibrate_single_maturity(strikes, vols, F=100.0, T=0.5)
        assert rmse < 1e-6
        assert abs(params.alpha - 0.25) < 0.01
        assert abs(params.rho - (-0.3)) < 0.05
        assert abs(params.nu - 0.5) < 0.05

    def test_surface_calibration(self):
        rows = {"strike": [], "T": [], "implied_vol": []}
        for T in (0.25, 0.5, 1.0):
            strikes, vols = SABRCalibrator.generate_synthetic_smile(
                F=100.0, T=T, **self.TRUE, n_strikes=9
            )
            rows["strike"].extend(strikes.tolist())
            rows["T"].extend([T] * len(strikes))
            rows["implied_vol"].extend(vols.tolist())

        cal = SABRCalibrator(beta=0.5)
        res = cal.calibrate(rows, F0=100.0, r=0.0, q=0.0, use_forward=False)
        assert res.success
        assert res.total_rmse < 1e-5
        assert res.n_maturities == 3

    def test_batched_surface(self):
        M, K = 4, 9
        strikes = np.tile(np.linspace(80, 120, K), (M, 1))
        forwards = np.full(M, 100.0)
        maturities = np.array([0.25, 0.5, 1.0, 2.0])
        import pde_tpu.models.sabr as sm

        vols = np.stack(
            [
                np.asarray(
                    sm.implied_volatilities(strikes[i], 100.0, maturities[i], SABRParams(**self.TRUE))
                )
                for i in range(M)
            ]
        )
        cal = SABRCalibrator(beta=0.5)
        out = cal.calibrate_surface_batch(strikes, vols, forwards, maturities)
        np.testing.assert_allclose(out["alpha"], 0.25, atol=0.01)
        np.testing.assert_allclose(out["rmse"], 0.0, atol=1e-5)

    def test_parameter_interpolation(self):
        cal = SABRCalibrator(beta=0.5)
        pbm = {
            0.25: SABRParams(0.2, 0.5, -0.2, 0.4),
            0.75: SABRParams(0.3, 0.5, -0.4, 0.6),
        }
        p = cal.interpolate_parameters(0.5, pbm)
        assert abs(float(p.alpha) - 0.25) < 1e-12
        assert abs(float(p.rho) - (-0.3)) < 1e-12
        # clamped outside
        assert float(cal.interpolate_parameters(0.1, pbm).alpha) == 0.2

    def test_too_few_strikes_raises(self):
        from pde_tpu.calibrate.sabr import SABRCalibrationError

        cal = SABRCalibrator()
        with pytest.raises(SABRCalibrationError):
            cal.calibrate_single_maturity(
                np.array([95.0, 105.0]), np.array([0.2, 0.2]), F=100.0, T=1.0
            )


class TestOUFitter:
    def test_round_trip_recovery(self):
        data = OUFitter.generate_synthetic_data(
            theta=0.5, mu=8.0, sigma=0.3, n_points=4000, dt=1 / 252, seed=3
        )
        res = OUFitter().fit(data, dt=1 / 252)
        assert res.success
        assert abs(res.params.theta - 0.5) < 0.05
        assert abs(res.params.mu - 8.0) / 8.0 < 0.35
        assert abs(res.params.sigma - 0.3) / 0.3 < 0.05

    def test_boundaries_structure(self):
        from pde_tpu.models.ou import OUParams

        b = OUFitter().compute_optimal_boundaries(
            OUParams(theta=0.0, mu=5.0, sigma=0.2), transaction_cost=0.001
        )
        assert b.entry_lower < b.exit_short < b.exit_long < b.entry_upper
        assert b.stop_loss_long < b.entry_lower
        assert b.stop_loss_short > b.entry_upper

    def test_stationarity_test(self):
        data = OUFitter.generate_synthetic_data(mu=20.0, n_points=2000, seed=5)
        out = OUFitter().test_stationarity(data)
        assert out["is_stationary"]
        rw = np.cumsum(np.random.default_rng(0).standard_normal(2000)) * 0.1
        out2 = OUFitter().test_stationarity(rw)
        assert not out2["is_stationary"]

    def test_fit_batch(self):
        paths = np.stack(
            [
                OUFitter.generate_synthetic_data(theta=t, mu=5.0, sigma=0.2, n_points=1500, seed=i)
                for i, t in enumerate((0.0, 1.0, -1.0))
            ]
        )
        params = OUFitter().fit_batch(paths, dt=1 / 252)
        np.testing.assert_allclose(
            np.asarray(params.theta), [0.0, 1.0, -1.0], atol=0.15
        )

    def test_residual_diagnostics_present(self):
        data = OUFitter.generate_synthetic_data(n_points=600, seed=9)
        res = OUFitter().fit(data)
        for k in ("mean", "std", "skewness", "kurtosis", "ljung_box_p"):
            assert k in res.residual_stats
        assert res.residual_stats["ljung_box_p"] > 0.01  # residuals are white


class TestOrchestrator:
    def test_full_run_success(self):
        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0, n_strikes=9, n_maturities=2
        )
        spread = OUFitter.generate_synthetic_data(n_points=600, seed=1)
        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_ou=True, risk_free_rate=0.05, dividend_yield=0.0
            ),
            heston_calibrator=HestonCalibrator(global_maxiter=25, global_popsize=8),
        )
        res = orch.run_daily_calibration(
            "TEST", data, S0=100.0, spread_series=spread
        )
        assert res.status in (CalibrationStatus.SUCCESS, CalibrationStatus.PARTIAL)
        assert res.heston_result is not None
        assert res.sabr_result is not None
        assert res.ou_result is not None
        # warm start cached for next run
        assert "TEST" in orch._heston_warm

    @pytest.mark.slow
    def test_run_all_concurrent_matches_sequential(self):
        def fresh():
            return CalibrationOrchestrator(
                heston_calibrator=HestonCalibrator(global_maxiter=20, global_popsize=6),
            )

        tasks = {
            name: {
                "market_options": HestonCalibrator.generate_synthetic_data(
                    n_strikes=7, n_maturities=2
                ),
                "S0": 100.0,
            }
            for name in ("AAA", "BBB")
        }
        seq = fresh().run_all(tasks)
        conc = fresh().run_all(tasks, concurrent=True, max_workers=2)
        assert set(seq) == set(conc) == {"AAA", "BBB"}
        for name in tasks:
            assert conc[name].heston_result is not None
            np.testing.assert_allclose(
                conc[name].heston_result.params.kappa,
                seq[name].heston_result.params.kappa,
                rtol=1e-6,
            )

    def test_too_few_options_fails(self):
        orch = CalibrationOrchestrator()
        res = orch.run_daily_calibration(
            "X",
            {"strike": [100.0], "maturity": [1.0], "mid_price": [5.0]},
            S0=100.0,
        )
        assert res.status == CalibrationStatus.FAILED


class _RecordingDB:
    """Minimal parameter-store fake: records store calls, serves none."""

    def __init__(self):
        self.stored = []

    def store_model_parameters(self, **kw):
        self.stored.append(kw)

    def get_latest_model_parameters(self, **kw):
        return None


class TestOrchestratorRatesCredit:
    """The opt-in Hull-White / G2++ / CDS-bootstrap stages (round-5: wire
    the rates/credit desks into the daily driver, reference
    orchestrator.py:166-264 semantics — warm starts, quality gates,
    persistence keys)."""

    @pytest.fixture(scope="class")
    def desks(self):
        import jax.numpy as jnp

        from pde_tpu.models import g2 as g2_mod
        from pde_tpu.models import rates as rates_mod

        curve = rates_mod.curve_from_zero_rates(
            jnp.asarray([0.5, 1.0, 2.0, 5.0, 10.0, 30.0]),
            jnp.asarray([0.030, 0.032, 0.035, 0.040, 0.042, 0.043]))
        hw_true = rates_mod.HullWhiteParams(
            jnp.asarray(0.12), jnp.asarray(0.011), curve)
        starts = jnp.asarray(np.arange(0.5, 5.01, 0.5))
        ends = starts + 0.5
        ks = curve.forward(starts, ends)
        cap_quotes = rates_mod.hw_caplet(hw_true, ks, starts, ends)

        g2_true = g2_mod.G2Params(
            jnp.asarray(0.5), jnp.asarray(0.05), jnp.asarray(0.011),
            jnp.asarray(0.0085), jnp.asarray(-0.55), curve)
        g2_exps = [1.0, 2.0, 3.0, 5.0]
        g2_pts = [jnp.asarray(np.arange(e + 0.5, e + 3.01, 0.5))
                  for e in g2_exps]
        g2_ks = [float(rates_mod.hw_swap_rate(curve, e, pt))
                 for e, pt in zip(g2_exps, g2_pts)]
        g2_quotes = jnp.asarray([
            float(g2_mod.g2_swaption(g2_true, k, e, pt))
            for e, pt, k in zip(g2_exps, g2_pts, g2_ks)])

        rates_market = {
            "curve": curve,
            "caplets": {"starts": starts, "ends": ends, "strikes": ks,
                        "quotes": cap_quotes},
            "swaptions": {"expiries": g2_exps, "pay_times": g2_pts,
                          "strikes": g2_ks, "quotes": g2_quotes},
        }
        credit_market = {
            "curve": curve,
            "pillars": [1.0, 3.0, 5.0, 10.0],
            "spreads": [0.008, 0.011, 0.013, 0.015],
            "recovery": 0.4,
        }
        return hw_true, g2_true, rates_market, credit_market

    def _orch(self, db=None):
        from pde_tpu.calibrate.g2 import G2Calibrator
        from pde_tpu.calibrate.rates import HullWhiteCalibrator

        return CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_heston=False, calibrate_sabr=False,
                calibrate_rates=True, calibrate_g2=True,
                calibrate_credit=True,
            ),
            db=db,
            rates_calibrator=HullWhiteCalibrator(max_iter=40),
            g2_calibrator=G2Calibrator(max_iter=25),
        )

    def test_stages_recover_recalibrate_and_persist(self, desks):
        hw_true, g2_true, rates_market, credit_market = desks
        db = _RecordingDB()
        orch = self._orch(db)
        res = orch.run_daily_calibration(
            "USD", {"strike": []}, S0=100.0,
            rates_market=rates_market, credit_market=credit_market)
        assert res.status == CalibrationStatus.SUCCESS, res.errors
        # HW recovered the synthetic (a, sigma)
        np.testing.assert_allclose(
            float(res.rates_result.params.a), float(hw_true.a), rtol=1e-3)
        np.testing.assert_allclose(
            float(res.rates_result.params.sigma), float(hw_true.sigma),
            rtol=1e-3)
        # G2 reprices the panel (the 5-param fit is not unique from 4
        # quotes, so pin the prices, not the parameters)
        assert res.g2_result.max_rel_error < 1e-4
        # credit round-trip is exact by construction
        assert res.credit_result["max_roundtrip_error"] < 1e-8
        assert np.all(res.credit_result["hazards"] > 0)
        # warm caches populated, one store call per stage
        assert "USD" in orch._hw_warm and "USD" in orch._g2_warm
        assert sorted(s["model_type"] for s in db.stored) == [
            "cds_hazard", "g2pp", "hull_white"]
        pillars = db.stored[[s["model_type"] for s in db.stored]
                            .index("cds_hazard")]["parameters"]["pillars"]
        assert pillars == [1.0, 3.0, 5.0, 10.0]

    def test_warm_start_feeds_second_run(self, desks):
        hw_true, g2_true, rates_market, credit_market = desks
        orch = self._orch()
        r1 = orch.run_daily_calibration(
            "EUR", {"strike": []}, S0=100.0, rates_market=rates_market)
        warm = orch._hw_warm["EUR"]
        r2 = orch.run_daily_calibration(
            "EUR", {"strike": []}, S0=100.0, rates_market=rates_market)
        assert r1.status == r2.status == CalibrationStatus.SUCCESS
        # warm-started refit lands on the same optimum
        np.testing.assert_allclose(
            float(r2.rates_result.params.a), warm[0], rtol=1e-4)

    def test_quality_gate_failure_degrades_to_partial(self, desks):
        hw_true, g2_true, rates_market, credit_market = desks
        from pde_tpu.calibrate.g2 import G2Calibrator
        from pde_tpu.calibrate.rates import HullWhiteCalibrator

        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_heston=False, calibrate_sabr=False,
                calibrate_rates=True, calibrate_credit=True,
                max_credit_roundtrip_error=0.0,  # force the credit gate
            ),
            rates_calibrator=HullWhiteCalibrator(max_iter=40),
        )
        res = orch.run_daily_calibration(
            "JPY", {"strike": []}, S0=100.0,
            rates_market=rates_market, credit_market=credit_market)
        # stages still return results; the gate shows up in errors
        assert res.credit_result is not None
        assert any("credit quality gate" in e for e in res.errors)
        assert res.status == CalibrationStatus.PARTIAL

    def test_stage_only_run_skips_option_count_gate(self, desks):
        """With every options stage off, an empty chain must not FAIL the
        run (the rates/credit desks have no option quotes)."""
        hw_true, g2_true, rates_market, credit_market = desks
        orch = self._orch()
        res = orch.run_daily_calibration(
            "GBP", {"strike": []}, S0=100.0, rates_market=rates_market)
        assert res.status == CalibrationStatus.SUCCESS, res.errors


class TestReviewRegressions:
    def test_dict_input_honors_option_type(self):
        """Puts in a dict input must not be priced as calls (review find)."""
        import numpy as np

        from pde_tpu.calibrate.heston import HestonCalibrator

        strikes, mats, prices, is_calls, und = HestonCalibrator._extract(
            {
                "strike": [90.0, 100.0],
                "maturity": [1.0, 1.0],
                "mid_price": [5.0, 6.0],
                "option_type": ["put", "call"],
                "underlying": ["SPY", "SPY"],
            },
            None,
        )
        assert list(is_calls) == [False, True]
        assert und == "SPY"

    def test_filter_keeps_closest_to_money(self):
        import numpy as np

        from pde_tpu.calibrate.orchestrator import CalibrationConfig, CalibrationOrchestrator

        orch = CalibrationOrchestrator(CalibrationConfig(max_options_per_underlying=3))
        data = {
            "strike": np.array([50.0, 80.0, 100.0, 105.0, 200.0]),
            "maturity": np.ones(5),
            "mid_price": np.ones(5),
            "underlying": "SPY",   # scalar entry must not crash the filter
        }
        out = orch._filter_options(data)
        assert sorted(out["strike"].tolist()) == [80.0, 100.0, 105.0]
        assert out["underlying"] == "SPY"

    def test_sabr_result_reports_convergence(self):
        import numpy as np

        from pde_tpu.calibrate.sabr import SABRCalibrator

        cal = SABRCalibrator(beta=0.7)
        strikes, vols = cal.generate_synthetic_smile(
            alpha=0.25, beta=0.7, rho=-0.3, nu=0.45, F=100.0, T=1.0,
            n_strikes=9,
        )
        res = cal.calibrate(
            {"strike": strikes, "T": np.full(9, 1.0), "implied_vol": vols},
            F0=100.0, use_forward=False,
        )
        assert res.success
        assert res.converged_by_maturity and all(res.converged_by_maturity.values())


class TestShapePadding:
    def test_nan_in_padded_slot_is_inert(self):
        """A CF that NaNs on a PADDED quote slot must not poison the
        member: NaN * 0 is NaN, so the mask alone can't neutralize it —
        regression for the jnp.where(mask > 0, ...) fix in the DE
        objective."""
        import jax.numpy as jnp

        from pde_tpu.calibrate.heston import _objective_population_gl_grouped

        # (kappa=10, sigma=2, rho=-0.99, v0=1) NaNs the f32 GL pricer at
        # T=200 (CF overflow) but prices T=0.5 fine
        pop = jnp.asarray([[10.0, 1.0, 2.0, -0.99, 1.0]], dtype=jnp.float32)
        strikes = jnp.asarray([90.0, 100.0, 110.0, 100.0], dtype=jnp.float32)
        unique_T = jnp.asarray([0.5, 200.0], dtype=jnp.float32)
        t_idx = jnp.asarray([0, 0, 0, 1])
        market = jnp.asarray([5.0, 4.0, 3.0, 1.0], dtype=jnp.float32)
        mask_pad = jnp.asarray([1.0, 1.0, 1.0, 0.0], dtype=jnp.float32)

        def obj(mask, ti, k, mk):
            return float(_objective_population_gl_grouped(
                pop, k, ti, unique_T, jnp.ones(k.shape, bool), mk, mask,
                100.0, 0.05, 0.0,
            )[0])

        padded = obj(mask_pad, t_idx, strikes, market)
        assert np.isfinite(padded) and padded < 1e9  # not the NaN penalty

        # equals the objective on the three REAL quotes alone
        real = obj(jnp.ones(3, jnp.float32), t_idx[:3], strikes[:3], market[:3])
        assert padded == pytest.approx(real, rel=1e-6)


    """pad_shapes: different chain sizes reuse ONE compiled pipeline (the
    padded tail is mask-weighted to zero residual), and padding does not
    change the recovered parameters."""

    def test_chain_size_change_reuses_compile(self):
        from pde_tpu.calibrate.heston import HestonCalibrator, _calibrate_pipeline

        base = HestonCalibrator.generate_synthetic_data(
            n_strikes=9, n_maturities=2
        )
        cal = HestonCalibrator(global_maxiter=25, global_popsize=8)

        r1 = cal.calibrate(base, S0=100.0, r=0.05, q=0.02)
        after_first = _calibrate_pipeline._cache_size()

        # drop two quotes: a different raw chain size, same shape bucket —
        # must NOT trace/compile a new pipeline variant
        smaller = {k: np.asarray(v)[:-2] for k, v in base.items()}
        r2 = cal.calibrate(smaller, S0=100.0, r=0.05, q=0.02)
        after_second = _calibrate_pipeline._cache_size()

        assert after_second == after_first  # no recompile
        assert r1.rmse < 1e-2 and r2.rmse < 1e-2

    @pytest.mark.slow
    def test_padded_matches_unpadded_params(self):
        # Compile-bound (two full calibration pipelines); the fast tier keeps
        # the no-recompile cache check above.
        from pde_tpu.calibrate.heston import HestonCalibrator

        data = HestonCalibrator.generate_synthetic_data(
            n_strikes=7, n_maturities=2
        )
        padded = HestonCalibrator(
            global_maxiter=15, global_popsize=6, pad_shapes=True
        ).calibrate(data, S0=100.0, r=0.05, q=0.02)
        exact = HestonCalibrator(
            global_maxiter=15, global_popsize=6, pad_shapes=False
        ).calibrate(data, S0=100.0, r=0.05, q=0.02)
        for k in ("kappa", "theta", "sigma", "rho", "v0"):
            a, b = float(getattr(padded.params, k)), float(getattr(exact.params, k))
            assert a == pytest.approx(b, rel=1e-2, abs=1e-3), k
        assert padded.fit_quality["n_options"] == exact.fit_quality["n_options"]


class TestParameterSensitivities:
    """IFT quote sensitivities vs an actual bumped-quote LM refit."""

    @pytest.mark.slow
    def test_prediction_matches_refit(self):
        import jax.numpy as jnp
        from pde_tpu.calibrate.heston import (
            HestonCalibrator, _price_vec_grouped, parameter_sensitivities)
        from pde_tpu.calibrate.lm import levenberg_marquardt
        from pde_tpu.models import heston as hm

        data = HestonCalibrator.generate_synthetic_data(
            n_strikes=9, n_maturities=3)
        res = HestonCalibrator(global_maxiter=30, global_popsize=10).calibrate(
            data, S0=100.0, r=0.05, q=0.02)
        sens = parameter_sensitivities(
            res.params, data["strike"], data["maturity"], data["is_call"],
            data["mid_price"], 100.0, 0.05, 0.02, quote_noise_rel=0.01)
        assert sens["dparams_dprice"].shape == (5, len(data["strike"]))
        assert np.all(sens["param_std"] >= 0.0)
        assert np.all(np.isfinite(sens["influence"]))

        i = 13
        eps = 1e-4 * float(data["mid_price"][i])
        bumped = np.asarray(data["mid_price"], np.float64).copy()
        bumped[i] += eps
        uT, t_idx = hm.group_maturities(data["maturity"])
        args = (jnp.asarray(np.asarray(data["strike"], np.float64)),
                jnp.asarray(t_idx), jnp.asarray(uT),
                jnp.asarray(np.asarray(data["is_call"], bool)))
        x_star = jnp.asarray([res.params.kappa, res.params.theta,
                              res.params.sigma, res.params.rho, res.params.v0])

        def make_res(pv):
            pvj = jnp.asarray(pv)

            def rf(x):
                m = jnp.maximum(
                    _price_vec_grouped(x, *args, 100.0, 0.05, 0.02), 1e-10)
                return (m - pvj) / pvj

            return rf

        lo = jnp.asarray([0.1, 0.01, 0.01, -0.99, 0.01])
        hi = jnp.asarray([10.0, 1.0, 2.0, 0.99, 1.0])
        lm0 = levenberg_marquardt(
            make_res(np.asarray(data["mid_price"], np.float64)), x_star,
            lo, hi, max_iter=40)
        lm1 = levenberg_marquardt(make_res(bumped), x_star, lo, hi, max_iter=40)
        actual = np.asarray(lm1.x - lm0.x)
        pred = sens["dparams_dprice"][:, i] * eps
        # first-order IFT prediction: <2% relative on components that moved
        big = np.abs(actual) > 1e-7
        assert big.any()
        np.testing.assert_allclose(pred[big], actual[big], rtol=2e-2)


class TestOrchestratorRough:
    @pytest.mark.slow
    def test_rough_opt_in_runs_and_reports(self):
        """calibrate_rough=True adds a rough-Heston refinement seeded from
        the classic fit; data generated by the CONVERGED classic pricer must
        fit with H near the classic limit and tiny residuals.  (The classic
        generator's reference-parity quadrature truncates at u = 10.24 — a
        deliberate price-definition difference the rough pricer does not
        share, so model-consistent data must come from price_accurate.)"""
        from pde_tpu.calibrate.rough import RoughHestonCalibrator
        from pde_tpu.models import heston as heston_model

        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0, n_strikes=7, n_maturities=2
        )
        hp = heston_model.HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
        data["mid_price"] = np.asarray(heston_model.price_accurate(
            hp, jnp.asarray(data["strike"]), jnp.asarray(data["maturity"]),
            100.0, 0.05, 0.0, is_call=jnp.asarray(data["is_call"]),
        ))
        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_sabr=False, calibrate_rough=True,
                risk_free_rate=0.05, dividend_yield=0.0,
            ),
            heston_calibrator=HestonCalibrator(global_maxiter=20, global_popsize=6),
            rough_calibrator=RoughHestonCalibrator(n_steps=48, max_iter=25),
        )
        res = orch.run_daily_calibration("TEST", data, S0=100.0)
        assert res.rough_result is not None
        # the fit quality is the contract; the PARAMETERS are not — a
        # 2-maturity surface cannot separate (H, lam, nu), so the rough
        # model may land on a different-but-equivalent point (observed:
        # H=0.29, lam=0.14 repricing the H=0.5, lam=2.0 surface to 2e-4)
        assert res.rough_result.rmse < 1e-3
        assert 0.02 <= res.rough_result.params.hurst <= 0.5
        assert res.status in (CalibrationStatus.SUCCESS, CalibrationStatus.PARTIAL)

    def test_rough_failure_is_isolated(self):
        """A rough-stage exception degrades to PARTIAL, never poisons the
        classic results (per-model isolation, reference orchestrator
        semantics)."""

        class Boom:
            def calibrate_quotes(self, *a, **k):
                raise RuntimeError("boom")

        data = HestonCalibrator.generate_synthetic_data(
            S0=100.0, r=0.05, q=0.0, n_strikes=7, n_maturities=2
        )
        orch = CalibrationOrchestrator(
            config=CalibrationConfig(
                calibrate_sabr=False, calibrate_rough=True,
                risk_free_rate=0.05, dividend_yield=0.0,
            ),
            heston_calibrator=HestonCalibrator(global_maxiter=15, global_popsize=6),
            rough_calibrator=Boom(),
        )
        res = orch.run_daily_calibration("TEST", data, S0=100.0)
        assert res.heston_result is not None
        assert res.rough_result is None
        assert any("rough" in e for e in res.errors)
        assert res.status == CalibrationStatus.PARTIAL
