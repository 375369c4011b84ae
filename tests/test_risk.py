"""Risk layer tests: sizing formula, VaR methods, limits, drawdown tiers,
Greeks thresholds, correlation health."""

import numpy as np
import pytest

from pde_tpu.risk.correlation_monitor import CorrelationMonitor, HealthStatus
from pde_tpu.risk.drawdown_controller import (
    DrawdownController,
    RiskAction,
    RiskLevel,
)
from pde_tpu.risk.greeks_monitor import (
    GreeksRiskMonitor,
    HedgeActionType,
    PortfolioGreeks,
)
from pde_tpu.risk.position_sizer import (
    KellyPositionSizer,
    PositionSizerConfig,
    VolatilityEstimator,
    VolatilityMethod,
    VolatilityScaledPositionSizer,
)
from pde_tpu.risk.risk_manager import (
    PositionRisk,
    RiskLimit,
    RiskLimitType,
    RiskManager,
)
from pde_tpu.risk.var_calculator import (
    StressTester,
    VaRBacktester,
    VaRCalculator,
    VaRMethod,
)


@pytest.fixture
def returns_20pct(rng):
    """Daily returns with ~20% annualized vol."""
    return rng.normal(0.0, 0.20 / np.sqrt(252), 500)


class TestVolatilityEstimator:
    def test_realized_recovers_vol(self, returns_20pct):
        est = VolatilityEstimator(VolatilityMethod.REALIZED, lookback_days=252)
        vol = est.estimate(returns_20pct)
        assert abs(vol - 0.20) < 0.04

    def test_ewma(self, returns_20pct):
        vol = VolatilityEstimator(VolatilityMethod.EWMA).estimate(returns_20pct)
        assert 0.1 < vol < 0.35

    def test_garch_native_fit(self, returns_20pct):
        vol = VolatilityEstimator(VolatilityMethod.GARCH).estimate(returns_20pct)
        assert 0.1 < vol < 0.4

    def test_hybrid_between(self, returns_20pct):
        est = VolatilityEstimator(VolatilityMethod.HYBRID)
        r = VolatilityEstimator(VolatilityMethod.REALIZED).estimate(returns_20pct)
        e = VolatilityEstimator(VolatilityMethod.EWMA).estimate(returns_20pct)
        h = est.estimate(returns_20pct)
        assert min(r, e) - 1e-12 <= h <= max(r, e) + 1e-12

    def test_insufficient_data_default(self):
        assert VolatilityEstimator().estimate(np.array([0.01, 0.02])) == 0.20

    def test_batch(self, rng):
        rets = rng.normal(0, 0.01, (4, 300))
        vols = VolatilityEstimator(VolatilityMethod.EWMA).estimate_batch(rets)
        assert vols.shape == (4,)
        assert np.all(vols > 0)

    def test_batch_matches_scalar_per_method(self, rng):
        """estimate_batch must use the SAME estimator per method as
        estimate() (regression: GARCH/HYBRID silently fell back to
        realized vol in the batch path)."""
        rets = rng.normal(0, 0.013, (3, 260))
        for method in (VolatilityMethod.REALIZED, VolatilityMethod.EWMA,
                       VolatilityMethod.HYBRID, VolatilityMethod.GARCH):
            est = VolatilityEstimator(method)
            batch = est.estimate_batch(rets)
            scalar = np.array([est.estimate(r) for r in rets])
            np.testing.assert_allclose(batch, scalar, rtol=1e-6,
                                       err_msg=str(method))

    def test_confidence_interval(self, returns_20pct):
        v, lo, hi = VolatilityEstimator().estimate_with_confidence(returns_20pct)
        assert lo < v < hi


class TestVolScaledSizer:
    def test_scaling_formula(self, returns_20pct):
        """w = sigma_target^2/sigma_realized^2 (Moreira-Muir)."""
        sizer = VolatilityScaledPositionSizer(
            PositionSizerConfig(target_annual_vol=0.15, max_position_pct=1.0, vol_lookback_days=252)
        )
        res = sizer.compute_position_size(returns_20pct, 1_000_000)
        expected_w = np.clip((0.15 / res.realized_vol) ** 2, 0.2, 2.0)
        assert abs(res.target_weight - expected_w) < 1e-10
        assert res.position_size == pytest.approx(1_000_000 * res.target_weight)

    def test_low_vol_increases_leverage(self, rng):
        calm = rng.normal(0, 0.05 / np.sqrt(252), 100)
        sizer = VolatilityScaledPositionSizer(PositionSizerConfig(max_position_pct=10.0))
        res = sizer.compute_position_size(calm, 1_000_000)
        assert res.target_weight == 2.0  # capped at max leverage

    def test_drawdown_reduces(self, returns_20pct):
        sizer = VolatilityScaledPositionSizer(PositionSizerConfig(max_position_pct=10.0))
        normal = sizer.compute_position_size(returns_20pct, 1e6, current_drawdown=0.05)
        stressed = sizer.compute_position_size(returns_20pct, 1e6, current_drawdown=0.25)
        assert stressed.target_weight < normal.target_weight

    def test_position_cap(self, returns_20pct):
        sizer = VolatilityScaledPositionSizer(PositionSizerConfig(max_position_pct=0.10))
        res = sizer.compute_position_size(returns_20pct, 1e6)
        assert res.position_size <= 1e5 + 1e-6

    def test_portfolio_weights(self, returns_20pct, rng):
        sizer = VolatilityScaledPositionSizer()
        out = sizer.compute_portfolio_weights(
            {"a": returns_20pct, "b": rng.normal(0, 0.005, 300)}, 1e6
        )
        assert set(out) == {"a", "b"}

    def test_kelly(self):
        kelly = KellyPositionSizer(kelly_fraction=0.5)
        res = kelly.compute_position_size(0.6, 2.0, 1e6)
        # f* = 0.6 - 0.4/2 = 0.4; half-kelly = 0.2
        assert abs(res.target_weight - 0.2) < 1e-12
        with pytest.raises(ValueError):
            kelly.compute_position_size(1.5, 2.0, 1e6)


class TestVaR:
    @pytest.fixture
    def market(self, rng):
        cov = np.array([[1e-4, 4e-5], [4e-5, 2.25e-4]])
        rets = rng.multivariate_normal([0, 0], cov, 1000)
        return {"SPY": 600_000.0, "QQQ": 400_000.0}, rets

    def test_methods_agree_roughly(self, market):
        pv, rets = market
        results = {
            m: VaRCalculator(method=m).calculate(pv, rets, ["SPY", "QQQ"])
            for m in VaRMethod
        }
        vars95 = [r.var_95 for r in results.values()]
        assert max(vars95) / min(vars95) < 1.5  # same ballpark
        for r in results.values():
            assert r.var_99 > r.var_95 > 0
            assert r.cvar_95 >= r.var_95 * 0.95

    def test_component_var_present(self, market):
        pv, rets = market
        res = VaRCalculator(method=VaRMethod.PARAMETRIC).calculate(pv, rets, ["SPY", "QQQ"])
        assert set(res.component_var) == {"SPY", "QQQ"}
        # parametric components sum to total VaR
        assert abs(sum(res.component_var.values()) - res.var_95) < res.var_95 * 0.05

    def test_var_pct(self, market):
        pv, rets = market
        res = VaRCalculator().calculate(pv, rets, ["SPY", "QQQ"])
        assert res.var_95_pct == pytest.approx(res.var_95 / 1_000_000)

    def test_correlation_matrix_override_raises_var(self, market):
        """A stressed correlation matrix must actually change the VaR
        (regression: the parameter used to be silently ignored)."""
        pv, rets = market
        calc = VaRCalculator(method=VaRMethod.PARAMETRIC)
        base = calc.calculate(pv, rets, ["SPY", "QQQ"])
        stressed = calc.calculate(
            pv, rets, ["SPY", "QQQ"],
            correlation_matrix=np.array([[1.0, 0.99], [0.99, 1.0]]),
        )
        # both long: correlation -> 0.99 strictly increases portfolio vol
        assert stressed.var_95 > base.var_95 * 1.05

    def test_stress_scenarios(self):
        st = StressTester()
        portfolio = {"SPY": 500_000.0, "TLT": 500_000.0}
        res = st.apply_scenario(portfolio, "2008_financial_crisis")
        assert res.scenario_pnl == pytest.approx(500_000 * -0.38 + 500_000 * 0.25)
        worst = st.get_worst_case(portfolio)
        assert worst.scenario_pnl <= res.scenario_pnl
        with pytest.raises(KeyError):
            st.apply_scenario(portfolio, "nope")

    def test_custom_scenario_and_report(self):
        st = StressTester()
        st.add_scenario("custom_crash", {"XYZ": -0.5})
        res = st.apply_scenario({"XYZ": 100_000.0}, "custom_crash")
        assert res.scenario_pnl == -50_000.0
        assert "custom_crash" in st.summary_report({"XYZ": 100_000.0})

    def test_kupiec_backtest(self, rng):
        pnl = rng.normal(0, 1000, 1000)
        var = np.full(1000, 1645.0)  # true 95% var of N(0,1000)
        out = VaRBacktester.kupiec_test(pnl, var, confidence=0.95)
        assert not out["reject_model"]
        # badly understated VaR gets rejected
        out_bad = VaRBacktester.kupiec_test(pnl, np.full(1000, 200.0), 0.95)
        assert out_bad["reject_model"]


class TestRiskManager:
    def test_pretrade_position_size_gate(self):
        rm = RiskManager(total_capital=1_000_000)
        rm.set_default_limits()
        ok = rm.check_position_allowed("SPY", 100, 450.0)  # 4.5%
        assert ok.is_allowed
        bad = rm.check_position_allowed("SPY", 400, 450.0)  # 18%
        assert not bad.is_allowed
        assert any("position_size" in b for b in bad.breached_limits)

    def test_exposure_accumulates(self):
        rm = RiskManager(total_capital=1_000_000)
        rm.set_default_limits()
        rm.update_position(PositionRisk("A", 100, 950_000.0))
        res = rm.check_position_allowed("B", 100, 900.0)
        assert not res.is_allowed  # 95% + 9% > 100%

    def test_circuit_breaker_blocks_everything(self):
        rm = RiskManager(total_capital=1e6)
        rm.activate_circuit_breaker("test")
        res = rm.check_position_allowed("SPY", 1, 1.0)
        assert not res.is_allowed
        assert res.recommended_action == "halt"
        rm.deactivate_circuit_breaker()
        assert rm.check_position_allowed("SPY", 1, 1.0).is_allowed

    def test_portfolio_risk_aggregation(self):
        rm = RiskManager(total_capital=1e6)
        rm.update_position(PositionRisk("A", 10, 400_000.0, delta=10, sector="tech"))
        rm.update_position(PositionRisk("B", -5, -200_000.0, delta=-3, sector="energy"))
        risk = rm.compute_portfolio_risk()
        assert risk.total_exposure == 600_000.0
        assert risk.net_exposure == 200_000.0
        assert risk.total_delta == 7.0
        assert risk.exposure_by_sector == {"tech": 400_000.0, "energy": 200_000.0}
        # Herfindahl: (2/3)^2 + (1/3)^2
        assert risk.concentration_risk == pytest.approx((2 / 3) ** 2 + (1 / 3) ** 2)

    def test_check_all_limits_carries_var_forward(self):
        """check_all_limits without fresh return history must keep the
        last computed VaR instead of silently zeroing it (regression: the
        VAR limit could never breach)."""
        from pde_tpu.risk.risk_manager import RiskLimit, RiskLimitType

        rng = np.random.default_rng(8)
        rm = RiskManager(total_capital=1e6)
        rm.update_position(PositionRisk("A", 10, 500_000.0))
        rm.update_position(PositionRisk("B", 5, 300_000.0))
        rets = rng.normal(0, 0.03, (500, 2))  # ~3%/day vol: big VaR
        risk = rm.compute_portfolio_risk(historical_returns=rets,
                                         asset_ids=["A", "B"])
        assert risk.var_95 > 0
        rm.add_limit(RiskLimit(RiskLimitType.VAR, value=0.01,
                               action_on_breach="reduce"))
        res = rm.check_all_limits()
        assert any("var" in b for b in res.breached_limits), res.breached_limits

    def test_check_all_limits_halts_on_drawdown(self):
        rm = RiskManager(total_capital=1e6)
        rm.set_default_limits()
        rm.update_portfolio_value(1e6)
        rm.update_portfolio_value(0.7e6)  # 30% drawdown > 25% limit
        res = rm.check_all_limits()
        assert not res.is_allowed
        assert rm.circuit_breaker_active


class TestDrawdownController:
    def _drift_to(self, dc, target):
        """Walk equity down in <3%/day steps so only drawdown tiers trigger."""
        v = dc._equity[-1]
        while v > target * 1.001:
            v = max(target, v * 0.98)
            dc.update(v)

    def test_risk_level_tiers(self):
        dc = DrawdownController(1_000_000)
        dc.update(1_000_000)
        self._drift_to(dc, 880_000)  # 12% dd -> normal tier (elevated at 15%)
        # note: a fresh losing streak may elevate; clear it with a flat day
        dc.update(dc._equity[-1])
        assert dc.check_limits().risk_level == RiskLevel.NORMAL
        self._drift_to(dc, 820_000)  # 18% -> elevated
        dc.update(dc._equity[-1])
        assert dc.check_limits().risk_level == RiskLevel.ELEVATED
        self._drift_to(dc, 760_000)  # 24% -> high
        dc.update(dc._equity[-1])
        st = dc.check_limits()
        assert st.risk_level == RiskLevel.HIGH
        assert st.exposure_multiplier == 0.5
        self._drift_to(dc, 680_000)  # 32% -> emergency
        st = dc.check_limits()
        assert st.risk_level == RiskLevel.EMERGENCY
        assert st.recommended_action == RiskAction.CLOSE_POSITIONS
        assert st.exposure_multiplier == 0.0

    def test_single_day_crash_triggers_daily_loss(self):
        """A 12% one-day drop elevates via the daily-loss gate even though
        the drawdown tier alone would still be NORMAL."""
        dc = DrawdownController(1_000_000)
        dc.update(1_000_000)
        dc.update(880_000)
        st = dc.check_limits()
        assert st.risk_level == RiskLevel.ELEVATED
        assert any("daily loss" in b for b in st.limits_breached)

    def test_kill_switch(self):
        dc = DrawdownController(1e6)
        dc.activate_kill_switch("manual")
        st = dc.check_limits()
        assert st.recommended_action == RiskAction.KILL_SWITCH
        dc.deactivate_kill_switch()
        assert dc.check_limits().risk_level == RiskLevel.NORMAL

    def test_consecutive_losses_elevate(self):
        dc = DrawdownController(1e6)
        v = 1e6
        for _ in range(6):
            v *= 0.998  # six small losing days, dd stays < 15%
            dc.update(v)
        st = dc.check_limits()
        assert st.risk_level == RiskLevel.ELEVATED
        assert any("consecutive" in b for b in st.limits_breached)

    def test_metrics_and_recovery(self):
        dc = DrawdownController(1e6)
        dc.update(1.2e6)
        dc.update(0.9e6)
        m = dc.get_metrics()
        assert m.peak_value == 1.2e6
        assert m.current_drawdown == pytest.approx(0.25)
        assert m.recovery_needed == pytest.approx(1.2 / 0.9 - 1)

    def test_strategy_limits(self):
        dc = DrawdownController(1e6)
        out = dc.check_strategy_limits(
            {"good": [100, 105, 102], "bad": [100, 80, 70]}
        )
        assert out["good"].risk_level == RiskLevel.NORMAL
        assert out["bad"].risk_level == RiskLevel.HIGH


class TestGreeksMonitor:
    def test_aggregation_and_hedge(self):
        from datetime import datetime, timezone

        from pde_tpu.risk.greeks_monitor import OptionPosition

        mon = GreeksRiskMonitor()
        pos = [
            OptionPosition(
                symbol="SPY_C450", underlying="SPY", option_type="call",
                strike=450.0, expiration=datetime.now(timezone.utc), quantity=10,
                direction="long", delta=0.5, gamma=0.02, vega=0.3, theta=-0.05,
                underlying_price=450.0,
            )
        ]
        g = mon.compute_portfolio_greeks(pos)
        assert g.delta == pytest.approx(0.5 * 10 * 100)
        needs, actions = mon.check_rehedge_needed(g)
        assert needs
        assert any(a.action_type == HedgeActionType.HEDGE_DELTA for a in actions)
        hedge = mon.compute_hedge_trade(g)
        assert hedge.quantity == pytest.approx(-g.delta)

    def test_no_action_when_flat(self):
        mon = GreeksRiskMonitor()
        g = PortfolioGreeks(delta=10.0, gamma=1.0, vega=50.0, theta=-100.0)
        needs, actions = mon.check_rehedge_needed(g)
        assert not needs

    def test_urgency_escalation(self):
        mon = GreeksRiskMonitor()
        g = PortfolioGreeks(delta=350.0, gamma=0, vega=0, theta=0)
        _, actions = mon.check_rehedge_needed(g)
        assert actions[0].urgency == "critical"

    def test_dollar_greek_limits_enforced(self):
        """The dollar-Greek caps in the config must fire even when the
        unit Greeks are under their thresholds (regression: the three
        *_dollars fields were silently unenforced)."""
        mon = GreeksRiskMonitor()
        cfg = mon.config
        # unit vega under 1000 but dollar vega 20x its cap
        g = PortfolioGreeks(delta=0.0, gamma=0.0, vega=500.0, theta=0.0,
                            vega_dollars=cfg.max_vega_dollars * 20)
        needs, actions = mon.check_rehedge_needed(g)
        assert needs
        assert any(a.action_type == HedgeActionType.REDUCE_VEGA for a in actions)

        g = PortfolioGreeks(delta=0.0, gamma=1.0, vega=0.0, theta=0.0,
                            gamma_dollars=cfg.gamma_dollars_threshold * 5)
        needs, actions = mon.check_rehedge_needed(g)
        assert any(a.action_type == HedgeActionType.ALERT for a in actions)

        g = PortfolioGreeks(delta=10.0, gamma=0.0, vega=0.0, theta=0.0,
                            delta_dollars=cfg.delta_dollars_threshold * 2)
        needs, actions = mon.check_rehedge_needed(
            g, portfolio_value=1e9  # pct path stays quiet; dollar cap fires
        )
        assert any(a.action_type == HedgeActionType.HEDGE_DELTA for a in actions)


class TestCorrelationMonitor:
    def test_healthy_cointegrated_pair(self, rng):
        common = np.cumsum(rng.normal(0, 0.01, 400))
        p1 = 100 * np.exp(common + rng.normal(0, 0.001, 400))
        p2 = 50 * np.exp(common + rng.normal(0, 0.001, 400))
        mon = CorrelationMonitor()
        health = mon.check_pair_health("A-B", p1, p2)
        assert health.status in (HealthStatus.HEALTHY, HealthStatus.WARNING)
        assert health.current_correlation > 0.7
        assert health.cointegration.is_cointegrated

    def test_unrelated_pair_flagged(self, rng):
        p1 = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 400)))
        p2 = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 400)))
        mon = CorrelationMonitor()
        health = mon.check_pair_health("X-Y", p1, p2)
        assert health.status in (HealthStatus.CRITICAL, HealthStatus.FAILED)
        recs = mon.get_position_recommendations({"X-Y": health})
        assert recs["X-Y"] in ("close", "close_immediately")

    def test_insufficient_history_is_warning_not_critical(self, rng):
        """Too-short or degenerate history means the correlation is
        UNMEASURABLE — the pair must not be escalated to CRITICAL/'close'
        (regression: _rolling_corr returned 0.0, which read as a broken
        pair)."""
        mon = CorrelationMonitor()
        short = mon.check_pair_health("A-B", np.array([100.0, 101.0, 100.5]),
                                      np.array([50.0, 50.4, 50.2]))
        assert short.status == HealthStatus.WARNING
        recs = mon.get_position_recommendations({"A-B": short})
        assert recs["A-B"] == "reduce"

        flat = np.full(100, 100.0)
        other = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 100)))
        degen = mon.check_pair_health("F-G", flat, other)
        assert degen.status != HealthStatus.CRITICAL

    def test_hedge_ratio_recovered(self):
        rng = np.random.default_rng(7)  # own seed: immune to suite ordering
        common = np.cumsum(rng.normal(0, 0.01, 300))
        p2 = 100 + 30 * common
        p1 = 5.0 + 2.0 * p2 + rng.normal(0, 0.2, 300)
        mon = CorrelationMonitor()
        coint = mon.test_cointegration(p1, p2)
        assert abs(coint.hedge_ratio - 2.0) < 0.1
