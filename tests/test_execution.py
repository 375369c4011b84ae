"""Execution layer tests: order lifecycle, algos, routing, broker, emergency,
reconciliation, TCA (cf. tests/python/execution/test_execution.py)."""

from datetime import datetime, timedelta, timezone, time as dtime, date

import numpy as np
import pytest

from pde_tpu.execution import algorithms as alg
from pde_tpu.execution import emergency as em
from pde_tpu.execution import routing as rt
from pde_tpu.execution import tca as tca_mod
from pde_tpu.execution.broker import BrokerConnectionManager, SimulatedBroker
from pde_tpu.execution.order import (
    Fill,
    InvalidTransition,
    Order,
    OrderSide,
    OrderStatus,
    OrderType,
)
from pde_tpu.execution.order_manager import OrderManager, OrderValidator
from pde_tpu.execution.reconciliation import AuditTrail, DiscrepancySeverity, FillReconciler


def mk_order(qty=100, side=OrderSide.BUY, **kw):
    return Order(symbol="SPY", side=side, quantity=qty, **kw)


class TestOrderLifecycle:
    def test_happy_path_fills(self):
        o = mk_order(100)
        o.transition(OrderStatus.SUBMITTED)
        o.transition(OrderStatus.ACKNOWLEDGED)
        o.add_fill(Fill(o.order_id, "SPY", OrderSide.BUY, 60, 450.0))
        assert o.status == OrderStatus.PARTIALLY_FILLED
        assert o.remaining_quantity == 40
        o.add_fill(Fill(o.order_id, "SPY", OrderSide.BUY, 40, 451.0))
        assert o.is_filled
        assert o.avg_fill_price == pytest.approx((60 * 450 + 40 * 451) / 100)

    def test_illegal_transition_raises(self):
        o = mk_order()
        o.transition(OrderStatus.SUBMITTED)
        o.transition(OrderStatus.FILLED)
        with pytest.raises(InvalidTransition):
            o.transition(OrderStatus.CANCELLED)  # FILLED is terminal

    def test_overfill_rejected(self):
        o = mk_order(10)
        o.transition(OrderStatus.SUBMITTED)
        with pytest.raises(ValueError):
            o.add_fill(Fill(o.order_id, "SPY", OrderSide.BUY, 20, 450.0))

    def test_validation_on_construction(self):
        with pytest.raises(ValueError):
            mk_order(0)
        with pytest.raises(ValueError):
            mk_order(10, order_type=OrderType.LIMIT)  # missing limit price


class TestOrderManager:
    def test_fat_finger_rejection(self):
        om = OrderManager(OrderValidator(max_order_value=10_000))
        o = om.submit_order(mk_order(1000), reference_price=450.0)
        assert o.status == OrderStatus.REJECTED
        assert any(r["rule"] == "fat_finger_value" for r in o.metadata["rejections"])

    def test_submit_and_fill_via_events(self):
        om = OrderManager()
        o = om.submit_order(mk_order(100), reference_price=450.0)
        assert o.status == OrderStatus.SUBMITTED
        om.acknowledge(o.order_id)
        om.process_fill(Fill(o.order_id, "SPY", OrderSide.BUY, 100, 450.2))
        assert om.get_order(o.order_id).is_filled
        events = [e["event"] for e in om.get_events(o.order_id)]
        assert events == ["validating", "submitted", "acknowledged", "fill"]

    def test_cancel_all(self):
        om = OrderManager()
        for _ in range(3):
            om.submit_order(mk_order(10), reference_price=100.0)
        assert om.cancel_all() == 3
        assert om.active_orders() == []

    def test_cancel_rejected_by_broker_stays_cancelling(self):
        """If the broker refuses the cancel (order already filled there),
        the book must NOT mark it CANCELLED — that diverges from broker
        state (regression: the boolean result was ignored)."""

        class RefusingBroker:
            def submit_order(self, order):
                return order

            def cancel_order(self, order_id):
                return False

        om = OrderManager(broker=RefusingBroker())
        o = om.submit_order(mk_order(10), reference_price=100.0)
        out = om.cancel_order(o.order_id)
        assert out.status == OrderStatus.CANCELLING
        events = [e["event"] for e in om.get_events(o.order_id)]
        assert "cancel_rejected" in events
        # the fill that explains the refusal can still resolve the order
        om.process_fill(Fill(o.order_id, "SPY", OrderSide.BUY, 10, 100.0))
        assert om.get_order(o.order_id).is_filled

    def test_price_deviation_check(self):
        om = OrderManager(OrderValidator(max_price_deviation_pct=0.05))
        o = Order(symbol="SPY", side=OrderSide.BUY, quantity=10,
                  order_type=OrderType.LIMIT, limit_price=500.0)
        out = om.submit_order(o, reference_price=450.0)
        assert out.status == OrderStatus.REJECTED


class TestAlgorithms:
    def test_twap_even_slices(self):
        plan = alg.TWAPExecutor().create_plan(mk_order(1000), duration_minutes=60, n_slices=10)
        assert plan.n_slices == 10
        assert plan.total_quantity == pytest.approx(1000)
        gaps = np.diff([s.scheduled_time.timestamp() for s in plan.slices])
        assert np.allclose(gaps, 360.0)

    def test_vwap_u_profile(self):
        plan = alg.VWAPExecutor().create_plan(mk_order(10_000))
        q = np.array([s.quantity for s in plan.slices])
        assert q.sum() == pytest.approx(10_000)
        assert q[0] > q[5] and q[-1] > q[5]  # open/close heavy

    def test_iceberg_display(self):
        plan = alg.IcebergExecutor().create_plan(mk_order(950), display_size=300)
        q = [s.quantity for s in plan.slices]
        assert q == [300, 300, 300, 50]

    def test_pov_participation(self):
        plan = alg.POVExecutor().create_plan(
            mk_order(5000), participation_rate=0.1, expected_volume_per_bucket=10_000
        )
        assert all(s.quantity <= 1000 + 1e-9 for s in plan.slices)
        assert plan.total_quantity == pytest.approx(5000)

    def test_plan_progress_tracking(self):
        plan = alg.TWAPExecutor().create_plan(mk_order(100), n_slices=4)
        nxt = plan.next_slice(now=plan.slices[0].scheduled_time)
        assert nxt.slice_id == 0
        plan.record_fill(0, 25, 450.0)
        assert plan.completion_rate == pytest.approx(0.25)
        assert plan.avg_fill_price == pytest.approx(450.0)

    def test_factory(self):
        assert isinstance(alg.create_executor("vwap"), alg.VWAPExecutor)
        with pytest.raises(ValueError):
            alg.create_executor("nope")


class TestRouting:
    def test_best_venue_routing(self):
        router = rt.SmartOrderRouter()
        decision = router.route(mk_order(1000))
        assert len(decision.allocations) == 1
        assert decision.allocations[0][1] == 1000

    def test_split_and_spray(self):
        router = rt.SmartOrderRouter()
        split = router.route(mk_order(900), rt.RoutingStrategy.SPLIT)
        assert len(split.allocations) == 3
        assert sum(q for _, q in split.allocations) == pytest.approx(900)
        spray = router.route(mk_order(1000), rt.RoutingStrategy.SPRAY)
        assert len(spray.allocations) == len(router.venues)

    def test_fill_quality_feedback(self):
        router = rt.SmartOrderRouter()
        before = router.venues["IEX"].fill_probability
        for _ in range(20):
            router.record_fill_quality("IEX", filled=False, latency_ms=5.0)
        assert router.venues["IEX"].fill_probability < before


class TestSimulatedBroker:
    def test_market_order_fill_and_account(self):
        b = SimulatedBroker(initial_cash=100_000, slippage_pct=0.001)
        b.connect()
        b.set_price("SPY", 450.0)
        o = mk_order(100)
        b.submit_order(o)
        assert o.is_filled
        assert o.avg_fill_price == pytest.approx(450.45)
        assert b.get_positions()["SPY"] == 100
        assert b.get_account().cash < 100_000 - 45_000

    def test_limit_order_rests_then_fills(self):
        b = SimulatedBroker()
        b.connect()
        b.set_price("SPY", 450.0)
        o = Order(symbol="SPY", side=OrderSide.BUY, quantity=10,
                  order_type=OrderType.LIMIT, limit_price=445.0)
        b.submit_order(o)
        assert not o.is_filled and o.order_id in b.open_orders
        fills = b.update_price("SPY", 444.0)
        assert len(fills) == 1 and o.is_filled

    def test_margin_rejection(self):
        b = SimulatedBroker(initial_cash=1000, margin_ratio=1.0)
        b.connect()
        b.set_price("SPY", 450.0)
        o = mk_order(100)
        b.submit_order(o)
        assert o.status == OrderStatus.REJECTED

    def test_fill_callbacks_and_round_trip(self):
        b = SimulatedBroker(slippage_pct=0.0, commission_per_share=0.0)
        b.connect()
        fills = []
        b.on_fill(fills.append)
        b.set_price("X", 100.0)
        b.submit_order(Order(symbol="X", side=OrderSide.BUY, quantity=50))
        b.submit_order(Order(symbol="X", side=OrderSide.SELL, quantity=50))
        assert len(fills) == 2
        assert b.get_positions() == {}

    def test_connection_manager_reconnects(self):
        b = SimulatedBroker()
        mgr = BrokerConnectionManager(b, check_interval=0.01)
        assert not b.connected
        assert mgr.ensure_connected()
        assert b.connected and mgr.reconnect_count == 1


class TestEmergency:
    def test_kill_switch_engage_disarm(self):
        b = SimulatedBroker()
        b.connect()
        b.set_price("SPY", 450.0)
        b.submit_order(Order(symbol="SPY", side=OrderSide.BUY, quantity=10,
                             order_type=OrderType.LIMIT, limit_price=400.0))
        om = OrderManager(broker=b)
        messages = []
        ks = em.KillSwitch(order_manager=om, broker=b, notifiers=[messages.append])
        out = ks.engage("drawdown limit")
        assert ks.is_engaged and not ks.check_allowed()
        assert out["orders_cancelled"] >= 1
        assert "KILL SWITCH" in messages[0]
        assert not ks.disarm("ops", "wrong")
        assert ks.disarm("ops", "DISARM")
        assert ks.check_allowed()

    def test_position_flattener(self):
        b = SimulatedBroker(slippage_pct=0.0)
        b.connect()
        b.set_price("A", 100.0)
        b.set_price("B", 50.0)
        b.submit_order(Order(symbol="A", side=OrderSide.BUY, quantity=10))
        b.submit_order(Order(symbol="B", side=OrderSide.SHORT, quantity=20))
        orders = em.PositionFlattener(b).flatten_all()
        assert len(orders) == 2
        assert b.get_positions() == {}

    def test_trading_hours(self):
        thc = em.TradingHoursController()
        # session times are EXCHANGE-LOCAL (ET): aware datetimes convert
        # before comparison.  Friday 2026-08-14, EDT = UTC-4.
        open_dt = datetime(2026, 8, 14, 18, 30, tzinfo=timezone.utc)   # 14:30 ET
        early_dt = datetime(2026, 8, 14, 10, 30, tzinfo=timezone.utc)  # 06:30 ET
        closed_dt = datetime(2026, 8, 14, 22, 0, tzinfo=timezone.utc)  # 18:00 ET
        weekend = datetime(2026, 8, 15, 18, 30, tzinfo=timezone.utc)
        assert thc.is_market_open(open_dt)
        assert not thc.is_market_open(early_dt)
        assert not thc.is_market_open(closed_dt)
        assert not thc.is_market_open(weekend)
        assert thc.session(open_dt) == "regular"
        assert thc.session(weekend) == "closed"
        # naive datetimes are taken as already exchange-local
        assert thc.is_market_open(datetime(2026, 8, 14, 14, 30))
        assert not thc.is_market_open(datetime(2026, 8, 14, 6, 30))


class TestReconciliation:
    def test_fill_matching(self):
        rec = FillReconciler()
        f = Fill("o1", "SPY", OrderSide.BUY, 100, 450.0)
        report = rec.reconcile_fills(
            [f],
            [{"order_id": "o1", "symbol": "SPY", "quantity": 100, "price": 450.01}],
        )
        assert report.n_matched == 1 and report.clean

    def test_price_mismatch_flagged(self):
        rec = FillReconciler(price_tolerance_pct=0.0001)
        f = Fill("o1", "SPY", OrderSide.BUY, 100, 450.0)
        report = rec.reconcile_fills(
            [f], [{"order_id": "o1", "symbol": "SPY", "quantity": 100, "price": 451.0}]
        )
        assert not report.clean
        assert report.discrepancies[0].kind == "price_mismatch"

    def test_missing_and_unknown(self):
        rec = FillReconciler()
        f = Fill("o1", "SPY", OrderSide.BUY, 100, 450.0)
        report = rec.reconcile_fills(
            [f], [{"order_id": "oX", "symbol": "SPY", "quantity": 5, "price": 450.0}]
        )
        kinds = {d.kind for d in report.discrepancies}
        assert kinds == {"missing_external", "unknown_external"}
        assert all(d.severity == DiscrepancySeverity.CRITICAL for d in report.discrepancies)

    def test_position_reconciliation(self):
        rec = FillReconciler()
        report = rec.reconcile_positions({"SPY": 100, "QQQ": -50}, {"SPY": 100, "QQQ": 50})
        assert report.n_matched == 1
        assert report.discrepancies[0].severity == DiscrepancySeverity.CRITICAL  # sign flip

    def test_audit_trail(self, tmp_path):
        trail = AuditTrail(path=str(tmp_path / "audit.jsonl"))
        trail.record("order_submitted", order_id="o1", symbol="SPY")
        trail.record("fill", order_id="o1", quantity=100)
        assert len(trail) == 2
        assert len(trail.query("fill")) == 1
        assert (tmp_path / "audit.jsonl").read_text().count("\n") == 2


class TestTCA:
    def test_slippage_vs_benchmarks(self):
        analyzer = tca_mod.TCAAnalyzer()
        fills = [
            Fill("o1", "SPY", OrderSide.BUY, 50, 450.5, commission=1.0),
            Fill("o1", "SPY", OrderSide.BUY, 50, 450.7, commission=1.0),
        ]
        res = analyzer.analyze_order(
            fills,
            arrival_price=450.0,
            market_prices=np.array([450.0, 450.4, 450.8]),
            market_volumes=np.array([100.0, 100.0, 200.0]),
            close_price=451.0,
        )
        assert res.avg_fill_price == pytest.approx(450.6)
        # bought above arrival: positive cost
        assert res.slippage_bps["arrival"] == pytest.approx((450.6 - 450.0) / 450.0 * 1e4)
        assert res.slippage_bps["close"] < 0  # beat the close
        assert res.implementation_shortfall_bps > res.slippage_bps["arrival"]

    def test_sell_side_sign(self):
        analyzer = tca_mod.TCAAnalyzer()
        fills = [Fill("o2", "SPY", OrderSide.SELL, 100, 449.0)]
        res = analyzer.analyze_order(fills, arrival_price=450.0)
        assert res.slippage_bps["arrival"] > 0  # sold below arrival = cost

    def test_aggregate_report(self):
        analyzer = tca_mod.TCAAnalyzer()
        rs = [
            analyzer.analyze_order([Fill(f"o{i}", "SPY", OrderSide.BUY, 100, 450.0 + i * 0.1)],
                                   arrival_price=450.0)
            for i in range(3)
        ]
        report = analyzer.aggregate_report(rs)
        assert report["n_orders"] == 3
        assert report["worst_order"] == "o2"


class TestSimulatePlan:
    """TWAP plan driven through the native fill engine end-to-end."""

    def _plan_and_ticks(self):
        from datetime import datetime, timedelta, timezone

        import numpy as np

        from pde_tpu.execution.algorithms import TWAPExecutor
        from pde_tpu.execution.order import Order, OrderSide

        start = datetime(2026, 1, 2, 14, 30, tzinfo=timezone.utc)
        order = Order(symbol="SPY", side=OrderSide.BUY, quantity=10_000.0)
        plan = TWAPExecutor().create_plan(
            order, start_time=start, end_time=start + timedelta(hours=1),
            n_slices=10,
        )
        t0 = start.timestamp()
        times = t0 + np.arange(0.0, 3700.0, 10.0)
        rng = np.random.default_rng(3)
        prices = 500.0 * np.exp(np.cumsum(rng.normal(0, 1e-4, len(times))))
        return plan, times, prices

    def test_twap_fills_and_summary(self):
        import numpy as np

        from pde_tpu.execution.algorithms import simulate_plan

        plan, times, prices = self._plan_and_ticks()
        summary = simulate_plan(plan, times, prices)
        assert summary["n_filled"] == summary["n_slices"] == 10.0
        assert summary["filled_quantity"] == 10_000.0
        assert plan.completion_rate == 1.0
        # buy with slippage: avg fill above the clean tick average
        assert summary["avg_fill_price"] > 0
        assert abs(summary["implementation_shortfall_bps"]) < 100
        assert summary["total_commission"] >= 10.0  # >= min commission per slice

    def test_native_matches_python_fallback(self, monkeypatch):
        import numpy as np

        from pde_tpu import native
        from pde_tpu.execution.algorithms import simulate_plan

        if not native.is_available():
            pytest.skip("native unavailable")
        plan_a, times, prices = self._plan_and_ticks()
        a = simulate_plan(plan_a, times, prices)
        plan_b, _, _ = self._plan_and_ticks()
        monkeypatch.setattr(native, "is_available", lambda: False)
        b = simulate_plan(plan_b, times, prices)
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-12), k
