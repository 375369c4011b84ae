"""Prometheus metrics registry with mock fallback.

Mirrors the reference monitoring/metrics.py: the metric inventory (system /
orders / PnL / positions / signals / risk / latency / data quality /
calibration; :103-436), the mock metric classes used when prometheus_client
is absent (:57-95), the ``track_latency`` / ``count_calls`` decorators
(:448-525) and the background MetricsCollector (:527-620).
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Callable, Dict, Optional

__all__ = [
    "PROMETHEUS_AVAILABLE",
    "REGISTRY",
    "track_latency",
    "count_calls",
    "MetricsCollector",
    "get_metric",
]

try:  # pragma: no cover - import guard
    from prometheus_client import CollectorRegistry, Counter, Gauge, Histogram

    PROMETHEUS_AVAILABLE = True
except ImportError:  # pragma: no cover
    PROMETHEUS_AVAILABLE = False

    class _MockMetric:
        """No-op stand-in (metrics.py:57-95)."""

        def __init__(self, *a, **k):
            self._value = 0.0

        def labels(self, *a, **k):
            return self

        def inc(self, amount=1.0):
            self._value += amount

        def dec(self, amount=1.0):
            self._value -= amount

        def set(self, value):
            self._value = value

        def observe(self, value):
            self._value = value

    Counter = Gauge = Histogram = _MockMetric  # type: ignore

    class CollectorRegistry:  # type: ignore
        pass


REGISTRY = CollectorRegistry() if PROMETHEUS_AVAILABLE else None
_KW = {"registry": REGISTRY} if PROMETHEUS_AVAILABLE else {}

# ---- metric inventory (subset-faithful to metrics.py:103-436) ----
system_up = Gauge("qt_system_up", "1 when the trading system is running", **_KW)
system_errors = Counter("qt_system_errors_total", "Unhandled errors", ["component"], **_KW)

orders_submitted = Counter("qt_orders_submitted_total", "Orders submitted", ["symbol", "side"], **_KW)
orders_filled = Counter("qt_orders_filled_total", "Orders filled", ["symbol"], **_KW)
orders_rejected = Counter("qt_orders_rejected_total", "Orders rejected", ["reason"], **_KW)

portfolio_value = Gauge("qt_portfolio_value", "Total portfolio value", **_KW)
daily_pnl = Gauge("qt_daily_pnl", "Daily PnL", **_KW)
unrealized_pnl = Gauge("qt_unrealized_pnl", "Unrealized PnL", **_KW)
open_positions = Gauge("qt_open_positions", "Number of open positions", **_KW)
gross_exposure = Gauge("qt_gross_exposure", "Gross exposure", **_KW)

signals_generated = Counter("qt_signals_generated_total", "Signals generated", ["strategy", "signal_type"], **_KW)

var_95 = Gauge("qt_var_95", "Portfolio 95% VaR", **_KW)
portfolio_delta = Gauge("qt_portfolio_delta", "Aggregate delta", **_KW)
portfolio_vega = Gauge("qt_portfolio_vega", "Aggregate vega", **_KW)
current_drawdown = Gauge("qt_current_drawdown", "Drawdown from peak", **_KW)
sharpe_ratio = Gauge("qt_sharpe_ratio", "Rolling Sharpe ratio", **_KW)

signal_latency = Histogram("qt_signal_latency_seconds", "Signal generation latency", **_KW)
order_latency = Histogram("qt_order_latency_seconds", "Order submission latency", **_KW)
calibration_latency = Histogram("qt_calibration_latency_seconds", "Calibration wall time", ["model"], **_KW)
data_ingestion_latency = Histogram("qt_data_ingestion_latency_seconds", "Ingestion latency", **_KW)

calibration_rmse = Gauge("qt_calibration_rmse", "Latest calibration RMSE", ["model", "underlying"], **_KW)
data_quality_errors = Counter("qt_data_quality_errors_total", "Validation errors", ["check"], **_KW)

_METRICS: Dict[str, object] = {
    name: obj
    for name, obj in list(globals().items())
    if name not in ("REGISTRY",) and obj.__class__.__name__ in ("Counter", "Gauge", "Histogram", "_MockMetric")
}


def get_metric(name: str):
    return _METRICS.get(name)


def track_latency(histogram) -> Callable:
    """Context decorator recording wall time (metrics.py:448-497)."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            finally:
                histogram.observe(time.perf_counter() - t0)

        return inner

    return wrap


def count_calls(counter, **labels) -> Callable:
    """Call counter decorator (metrics.py:498-525)."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            (counter.labels(**labels) if labels else counter).inc()
            return fn(*args, **kwargs)

        return inner

    return wrap


class MetricsCollector:
    """Background gauge refresher (metrics.py:527-620): polls registered
    callables and pushes their values into gauges."""

    def __init__(self, interval: float = 15.0):
        self.interval = interval
        self._sources: Dict[object, Callable[[], float]] = {}
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def register(self, gauge, source: Callable[[], float]) -> None:
        self._sources[gauge] = source

    def collect_once(self) -> None:
        for gauge, source in self._sources.items():
            try:
                gauge.set(float(source()))
            except Exception:  # noqa: BLE001 - a bad source must not kill collection
                system_errors.labels(component="metrics_collector").inc()

    def start(self) -> None:
        self._running = True

        def loop():
            while self._running:
                self.collect_once()
                time.sleep(self.interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=2.0)
