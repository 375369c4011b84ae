"""Validation layer tests: model checks, statistical tests, walk-forward,
stress, benchmarks."""

import numpy as np
import pytest

from pde_tpu.validation import benchmarks as bm
from pde_tpu.validation import statistical_tests as st
from pde_tpu.validation import stress_testing as sx
from pde_tpu.validation import walk_forward as wf
from pde_tpu.validation.model_validation import (
    HestonModelValidator,
    OUModelValidator,
    SABRModelValidator,
    ValidationStatus,
)


class TestModelValidation:
    def test_heston_passes_good_params(self):
        v = HestonModelValidator()
        report = v.validate(
            data=dict(kappa=2.0, theta=0.04, sigma=0.2, rho=-0.7, v0=0.04,
                      rmse=0.01, r_squared=0.999)
        )
        assert report.passed
        assert report.failed_tests == 0

    def test_heston_feller_violation_warns_not_fails(self):
        v = HestonModelValidator()
        report = v.validate(
            data=dict(kappa=0.5, theta=0.02, sigma=0.9, rho=-0.3, v0=0.04, rmse=0.01)
        )
        assert report.passed  # WARNING severity doesn't fail the model
        feller = next(r for r in report.results if r.check_name == "feller_condition")
        assert feller.status == ValidationStatus.WARNING

    def test_heston_bad_rmse_fails(self):
        v = HestonModelValidator()
        report = v.validate(
            data=dict(kappa=2.0, theta=0.04, sigma=0.2, rho=-0.7, v0=0.04, rmse=2.0)
        )
        assert not report.passed

    def test_parameter_bounds(self):
        v = SABRModelValidator()
        report = v.validate(data=dict(alpha=0.2, beta=0.5, rho=-0.3, nu=0.4, rmse=0.001))
        assert report.passed
        report2 = v.validate(data=dict(alpha=-1.0, beta=0.5, rho=-0.3, nu=0.4, rmse=0.001))
        assert not report2.passed

    def test_ou_half_life_gate(self):
        v = OUModelValidator()
        bad = v.validate(data=dict(mu=5.0, sigma=0.2, half_life_days=400.0))
        assert not bad.passed
        ok = v.validate(data=dict(mu=5.0, sigma=0.2, half_life_days=30.0, ljung_box_p=0.8))
        assert ok.passed

    def test_report_serializes(self):
        v = HestonModelValidator()
        d = v.validate(data=dict(kappa=2.0, theta=0.04, sigma=0.2, rho=-0.7, v0=0.04)).to_dict()
        assert "results" in d and d["model_name"] == "heston"


class TestStatisticalTests:
    # own fixed generator: these are marginal statistical assertions, so the
    # sample must not depend on how many tests drew from the shared session
    # rng before this class runs
    @pytest.fixture
    def profitable(self):
        return np.random.default_rng(3).normal(0.001, 0.01, 1000)

    @pytest.fixture
    def noise(self):
        return np.random.default_rng(8).normal(0.0, 0.01, 1000)

    def test_returns_significance(self, profitable, noise):
        tester = st.StrategyStatisticalTests()
        assert tester.test_returns_significance(profitable).result == st.TestResult.SIGNIFICANT
        assert tester.test_returns_significance(noise).result == st.TestResult.NOT_SIGNIFICANT

    def test_sharpe_significance(self, profitable):
        res = st.StrategyStatisticalTests().test_sharpe_significance(profitable)
        assert res.result == st.TestResult.SIGNIFICANT
        assert res.details["sharpe_annualized"] > 1.0

    def test_normality_detects_fat_tails(self, rng):
        tester = st.StrategyStatisticalTests()
        t_returns = rng.standard_t(3, 2000) * 0.01
        assert tester.test_returns_normality(t_returns).result == st.TestResult.SIGNIFICANT

    def test_strategy_comparison(self):
        rng = np.random.default_rng(123)
        base = rng.normal(0.0, 0.01, 1500)
        better = base + 0.002  # same noise, clear paired edge
        res = st.StrategyStatisticalTests().test_strategy_comparison(better, base)
        assert res.result == st.TestResult.SIGNIFICANT
        assert res.details["mean_diff_daily"] == pytest.approx(0.002)

    def test_deflated_sharpe_penalizes_trials(self):
        det = st.OverfittingDetector()
        few = det.deflated_sharpe_ratio(0.1, n_trials=2, n_observations=1000)
        many = det.deflated_sharpe_ratio(0.1, n_trials=1000, n_observations=1000)
        assert few["deflated_sharpe_ratio"] > many["deflated_sharpe_ratio"]

    def test_pbo(self, rng):
        det = st.OverfittingDetector()
        # pure noise: IS winner is random OOS -> PBO ~ 0.5
        is_m = rng.normal(0, 1, (20, 10))
        oos_m = rng.normal(0, 1, (20, 10))
        out = det.probability_of_backtest_overfitting(is_m, oos_m)
        assert 0.2 <= out["pbo"] <= 0.8
        # skilled config: best IS is best OOS -> PBO ~ 0
        is_s = rng.normal(0, 0.1, (20, 10)); is_s[:, 3] += 5
        oos_s = rng.normal(0, 0.1, (20, 10)); oos_s[:, 3] += 5
        assert det.probability_of_backtest_overfitting(is_s, oos_s)["pbo"] < 0.2

    @pytest.mark.slow
    def test_bootstrap_cis(self, profitable):
        boot = st.BootstrapAnalysis(n_bootstrap=500)
        point, lo, hi = boot.sharpe_confidence_interval(profitable)
        assert lo < point < hi
        point, lo, hi = boot.max_drawdown_confidence_interval(profitable)
        assert 0 <= lo <= hi


class TestWalkForward:
    def test_window_generation(self):
        opt = wf.WalkForwardOptimizer(train_size=100, test_size=50)
        windows = opt.generate_windows(400)
        assert len(windows) == 6
        assert windows[0].train_size == 100 and windows[0].test_size == 50
        anchored = wf.WalkForwardOptimizer(100, 50, scheme="anchored").generate_windows(400)
        assert all(w.train_start == 0 for w in anchored)
        assert anchored[-1].train_end > anchored[0].train_end

    def test_run_with_generic_evaluator(self, rng):
        data = rng.normal(0.0005, 0.01, 500)
        opt = wf.WalkForwardOptimizer(train_size=200, test_size=100)

        def evaluate(x, params):
            return float(np.mean(x) * params["scale"])

        report = opt.run(data, evaluate, [{"scale": 1.0}, {"scale": 2.0}])
        assert len(report.results) >= 2
        assert report.param_stability["scale"] > 0

    def test_purged_kfold_embargo(self):
        pk = wf.PurgedKFold(n_splits=5, purge_gap=10, embargo_pct=0.02)
        for train, test in pk.split(500):
            # no train index within purge_gap of the test block
            assert np.min(np.abs(train[:, None] - test[None, :])) > 10 - 1
        with pytest.raises(ValueError):
            wf.PurgedKFold(n_splits=1)

    def test_oos_validator(self, rng):
        data = rng.normal(0.001, 0.01, 1000)
        v = wf.OutOfSampleValidator(oos_fraction=0.3)
        out = v.validate(data, evaluate=lambda x: float(np.mean(x)))
        assert "metric_decay" in out


class TestStress:
    def test_historical_scenarios(self):
        eng = sx.StressTestEngine()
        out = eng.run_all_historical_scenarios(beta=1.0)
        crisis = out["2008_financial_crisis"]
        assert crisis.total_pnl_pct < -25
        assert crisis.breaches_risk_limit
        # half-beta strategy suffers roughly half
        half = eng.run_historical_scenario("2008_financial_crisis", beta=0.5)
        assert half.total_pnl_pct > crisis.total_pnl_pct

    def test_monte_carlo_stress(self):
        eng = sx.StressTestEngine()
        out = eng.run_monte_carlo_stress(daily_vol=0.02, n_days=63, n_paths=500)
        assert 0.0 <= out["prob_breach_risk_limit"] <= 1.0
        assert out["p99_max_drawdown"] > out["expected_max_drawdown"]

    def test_reverse_stress(self):
        eng = sx.StressTestEngine()
        # a 25% slide over a month at 1% daily vol is a ~1.4 sigma/day drift:
        # severe but plausible
        out = eng.reverse_stress_test(daily_vol=0.01, target_loss=0.25, n_days=21)
        assert out["required_daily_shock"] > 0
        assert out["plausible"]
        # the same loss in two days needs >13 sigma days: implausible
        crash = eng.reverse_stress_test(daily_vol=0.01, target_loss=0.25, n_days=2)
        assert not crash["plausible"]

    def test_tail_analyzer(self, rng):
        analyzer = sx.TailRiskAnalyzer()
        fat = rng.standard_t(3, 5000) * 0.01
        thin = rng.normal(0, 0.01, 5000)
        out_fat = analyzer.analyze(fat)
        out_thin = analyzer.analyze(thin)
        assert out_fat["excess_kurtosis"] > out_thin["excess_kurtosis"]
        hill_fat = analyzer.hill_tail_index(fat)
        hill_thin = analyzer.hill_tail_index(thin)
        assert hill_fat < hill_thin  # fatter tail -> smaller index


class TestBenchmarks:
    def test_comparator(self, rng):
        market = rng.normal(0.0004, 0.01, 750)
        strategy = market * 0.5 + rng.normal(0.0004, 0.004, 750)
        report = bm.BenchmarkComparator(risk_free_rate=0.02).compare(strategy, market)
        names = [b.name for b in report.benchmark_results]
        assert "Buy-and-Hold" in names and "60/40" in names
        assert set(report.beats_benchmark) == set(names)

    def test_alpha_beta_recovery(self, rng):
        market = rng.normal(0.0004, 0.01, 2000)
        alpha_daily = 0.0002
        strategy = alpha_daily + 0.8 * market + rng.normal(0, 0.001, 2000)
        calc = bm.AlphaCalculator(risk_free_rate=0.0)
        out = calc.calculate(strategy, market)
        assert abs(out["beta"] - 0.8) < 0.02
        assert abs(out["alpha_annualized_pct"] - alpha_daily * 252 * 100) < 2.0
        assert out["alpha_t_stat"] > 2.0
        assert out["r_squared"] > 0.9

    def test_risk_free_benchmark(self):
        rf = bm.RiskFreeBenchmark(0.05)
        r = rf.calculate_returns(np.zeros(252))
        assert np.allclose(r, 0.05 / 252)


class TestReviewRegressions:
    def test_oos_decay_sign_safe(self):
        """A negative IS metric must not flip the degradation gate open."""
        from pde_tpu.validation.statistical_tests import OverfittingDetector
        from pde_tpu.validation.walk_forward import OutOfSampleValidator

        det = OverfittingDetector()
        out = det.is_oos_degradation(is_sharpe=-0.1, oos_sharpe=-2.0)
        assert out["suspicious"]

        v = OutOfSampleValidator(oos_fraction=0.5, max_metric_decay=0.5)
        data = np.arange(100, dtype=float)
        # IS metric slightly negative, OOS catastrophic
        metrics = iter([-0.1, -2.0])
        res = v.validate(data, evaluate=lambda _x: next(metrics))
        assert not res["passed"]

    def test_crisis_paths_realize_declared_shock(self):
        from pde_tpu.validation.stress_testing import BUILTIN_SCENARIOS

        for sc in BUILTIN_SCENARIOS:
            realized = float(np.prod(1.0 + sc.return_path) - 1.0)
            assert realized == pytest.approx(sc.equity_shock, abs=1e-10), sc.name
