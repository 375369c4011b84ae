"""Native C++ runtime tests: build, ABI, and parity with the Python/JAX twins."""

import numpy as np
import pytest

from pde_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


def _hjb_payoffs(p, all_problems=False):
    """Host-side (x grid, stacked exercise payoffs) for HJB parity tests."""
    from pde_tpu.solvers import hjb

    problems = list(hjb.StoppingProblem) if all_problems else [p.problem]
    return hjb._host_grid_and_payoffs(p, problems)


class TestBuild:
    def test_abi(self):
        lib = native.load()
        assert lib.pde_host_abi_version() == 3


class TestBarAggregation:
    def test_ohlcv(self):
        times = np.array([0.0, 10.0, 30.0, 61.0, 62.0])
        prices = np.array([100.0, 102.0, 99.0, 101.0, 103.0])
        sizes = np.array([10.0, 20.0, 30.0, 5.0, 5.0])
        bars = native.aggregate_bars(times, prices, sizes, bar_seconds=60.0)
        assert bars.shape == (2, 6)
        # first bar: open 100, high 102, low 99, close 99, volume 60
        np.testing.assert_allclose(bars[0], [0.0, 100.0, 102.0, 99.0, 99.0, 60.0])
        np.testing.assert_allclose(bars[1], [60.0, 101.0, 103.0, 101.0, 103.0, 10.0])

    def test_matches_python_aggregator(self, rng):
        from datetime import datetime, timezone

        from pde_tpu.data.streaming import BarAggregator, StreamTrade

        n = 500
        times = np.sort(rng.uniform(0, 600, n))
        prices = 100 + np.cumsum(rng.normal(0, 0.1, n))
        sizes = rng.integers(1, 100, n).astype(float)

        fast = native.aggregate_bars(times, prices, sizes, 60.0)

        agg = BarAggregator(bar_seconds=60.0)
        done = []
        for t, p, s in zip(times, prices, sizes):
            bar = agg.add_trade(
                StreamTrade("X", float(p), float(s),
                            time=datetime.fromtimestamp(t, tz=timezone.utc))
            )
            if bar:
                done.append(bar)
        done.extend(agg.flush())

        assert len(fast) == len(done)
        np.testing.assert_allclose(fast[:, 4], [b.close for b in done], atol=1e-12)
        np.testing.assert_allclose(fast[:, 5], [b.volume for b in done], atol=1e-12)


class TestPositionBacktest:
    def test_matches_vectorized(self, rng):
        import jax.numpy as jnp

        from pde_tpu.backtest import vectorized

        prices = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, 800)))
        positions = np.sign(rng.normal(0, 1, 800))
        fast = native.run_position_backtest(prices, positions, cost_per_turnover=0.0005)
        ret, eq = vectorized.equity_from_positions(
            jnp.asarray(prices), jnp.asarray(positions), 0.0005
        )
        np.testing.assert_allclose(fast["returns"], np.asarray(ret), atol=1e-12)
        np.testing.assert_allclose(fast["equity"], np.asarray(eq), atol=1e-10)
        stats = vectorized.backtest_positions(jnp.asarray(prices), jnp.asarray(positions), 0.0005)
        assert fast["total_return"] == pytest.approx(float(stats["total_return"]), abs=1e-10)
        assert fast["max_drawdown"] == pytest.approx(float(stats["max_drawdown"]), abs=1e-10)

    def test_native_zscore_matches_python(self, rng):
        from pde_tpu.backtest.strategy import MeanReversionStrategy

        prices = 100 + np.cumsum(rng.normal(0, 0.5, 400))
        fast = native.zscore_positions(prices, 20, 2.0, 0.5)
        ref = MeanReversionStrategy.signal_array(prices, 20, 2.0, 0.5)
        np.testing.assert_allclose(fast, ref, atol=1e-12)


class TestOracles:
    def test_thomas_matches_jax(self, rng):
        from pde_tpu.ops import tridiag
        import jax.numpy as jnp

        B, n = 5, 40
        lower = rng.uniform(-1, 1, (B, n - 1))
        upper = rng.uniform(-1, 1, (B, n - 1))
        diag = 4 + rng.uniform(0, 1, (B, n))
        rhs = rng.uniform(-1, 1, (B, n))
        fast = native.thomas_solve(lower, diag, upper, rhs)
        ref = np.asarray(tridiag.thomas(*map(jnp.asarray, (lower, diag, upper, rhs))))
        np.testing.assert_allclose(fast, ref, rtol=1e-12)

    def test_ou_mle_matches_jax(self):
        import jax
        import jax.numpy as jnp

        from pde_tpu.models import ou

        params = ou.OUParams(theta=2.0, mu=6.0, sigma=0.4)
        path = np.asarray(ou.simulate(params, 2.0, 4.0, 1000, jax.random.PRNGKey(5)))
        fast = native.ou_mle(path, 4.0 / 1000)
        ref = ou.fit_mle(jnp.asarray(path), 4.0 / 1000)
        assert fast[0] == pytest.approx(float(ref.params.theta), abs=1e-8)
        assert fast[1] == pytest.approx(float(ref.params.mu), rel=1e-6)
        assert fast[2] == pytest.approx(float(ref.params.sigma), rel=1e-8)

    def test_heston_oracle_matches_jax(self):
        """Native Carr-Madan (the reference's per-option C++ loop, written
        independently) agrees with the JAX pricer to float64 roundoff."""
        import jax.numpy as jnp

        from pde_tpu.models import heston

        p = heston.HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
        K = np.linspace(80.0, 120.0, 21)
        T = np.full(21, 0.9)
        T[:3] = 0.0  # exercise the zero-maturity intrinsic branch
        ic = (np.arange(21) % 2).astype(float)
        cpp = native.heston_price_batch(
            2.0, 0.04, 0.3, -0.7, 0.04, 100.0, 0.05, 0.02, K, T, ic
        )
        jx = np.asarray(
            heston.price_carr_madan(
                p, jnp.asarray(K), jnp.asarray(T), 100.0, 0.05, 0.02,
                is_call=jnp.asarray(ic) > 0.5,
            )
        )
        np.testing.assert_allclose(cpp, jx, atol=1e-10)

    @pytest.mark.slow
    def test_sabr_oracle_matches_jax(self):
        import jax.numpy as jnp

        from pde_tpu.models import sabr

        sp = sabr.SABRParams(alpha=0.25, beta=0.7, rho=-0.3, nu=0.45)
        K = np.linspace(80.0, 120.0, 21)
        cpp = native.sabr_vols(0.25, 0.7, -0.3, 0.45, 100.0, 1.25, K)
        jx = np.asarray(sabr.implied_volatilities(jnp.asarray(K), 100.0, 1.25, sp))
        np.testing.assert_allclose(cpp, jx, atol=1e-12)
        # ATM and zero-maturity branches
        atm_cpp = native.sabr_vols(0.25, 0.7, -0.3, 0.45, 100.0, 1.25,
                                   np.array([100.0]))
        atm_jx = float(sabr.implied_volatility(jnp.asarray(100.0), 100.0, 1.25, sp))
        np.testing.assert_allclose(atm_cpp[0], atm_jx, atol=1e-12)
        t0_cpp = native.sabr_vols(0.25, 0.7, -0.3, 0.45, 100.0, 0.0, K[:2])
        t0_jx = np.asarray(sabr.implied_volatility(jnp.asarray(K[:2]), 100.0, 0.0, sp))
        np.testing.assert_allclose(t0_cpp, t0_jx, atol=1e-12)


class TestSolverOracles:
    """Independent float64 C++ marches cross-check the JAX PDE solvers.

    Same role as the reference's C++ solver tests (tests/cpp +
    test_cpp_bindings.py:465-571): two implementations of each scheme,
    written independently, must agree to float64 round-off."""

    def test_bs_pde_european_matches_jax(self):
        from pde_tpu.solvers import bs_pde

        p = bs_pde.BSPDEParams(sigma=0.25, r=0.05, q=0.01, T=1.0, K=100.0)
        res = bs_pde.solve(p, 105.0)
        price, grid, sgrid = native.bs_pde_solve(105.0, 0.25, 0.05, 0.01, 1.0, 100.0)
        assert price == pytest.approx(float(res.price), abs=1e-10)
        np.testing.assert_allclose(grid, np.asarray(res.prices), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(sgrid, np.asarray(res.spot_grid), rtol=1e-12)

    def test_bs_pde_american_put_matches_jax(self):
        from pde_tpu.solvers import bs_pde

        p = bs_pde.BSPDEParams(
            sigma=0.25, r=0.05, q=0.0, T=1.0, K=100.0, is_call=False, american=True
        )
        res = bs_pde.solve(p, 95.0)
        price, _, _ = native.bs_pde_solve(
            95.0, 0.25, 0.05, 0.0, 1.0, 100.0, is_call=False, american=True
        )
        assert price == pytest.approx(float(res.price), abs=1e-9)

    def test_bs_pde_implicit_scheme_matches_jax(self):
        from pde_tpu.solvers import bs_pde

        p = bs_pde.BSPDEParams(sigma=0.3, r=0.03, T=0.5, K=90.0, scheme="implicit")
        res = bs_pde.solve(p, 92.0)
        price, _, _ = native.bs_pde_solve(
            92.0, 0.3, 0.03, 0.0, 0.5, 90.0, crank_nicolson=False
        )
        assert price == pytest.approx(float(res.price), abs=1e-9)

    def test_heston_adi_european_matches_jax(self, heston_test_params):
        from pde_tpu.solvers import heston_adi

        hp = heston_adi.HestonPDEParams()
        res = heston_adi.solve(hp, 100.0)
        price, grid = native.heston_adi_solve(
            2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.0, 1.0, 100.0, 100.0
        )
        assert price == pytest.approx(float(res.price), abs=1e-9)
        np.testing.assert_allclose(
            grid, np.asarray(res.prices), rtol=1e-6, atol=1e-7
        )

    def test_heston_adi_american_put_matches_jax(self):
        from pde_tpu.solvers import heston_adi

        hp = heston_adi.HestonPDEParams(is_call=False, american=True)
        res = heston_adi.solve(hp, 100.0)
        price, _ = native.heston_adi_solve(
            2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.0, 1.0, 100.0, 100.0,
            is_call=False, american=True,
        )
        assert price == pytest.approx(float(res.price), abs=1e-9)

    def test_heston_adi_nonzero_dividend_put(self):
        from pde_tpu.solvers import heston_adi

        hp = heston_adi.HestonPDEParams(q=0.02, T=0.5, K=95.0, is_call=False)
        res = heston_adi.solve(hp, 100.0)
        price, _ = native.heston_adi_solve(
            2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.02, 0.5, 95.0, 100.0, is_call=False
        )
        assert price == pytest.approx(float(res.price), abs=1e-9)

    def test_hjb_march_matches_jax(self):
        from pde_tpu.solvers import hjb

        # backend="device": the JAX side must NOT itself route to native,
        # or this parity check compares native against native
        p = hjb.HJBParams(backend="device")
        res = hjb.solve(p)
        exercise = np.asarray(_hjb_payoffs(p)[1][0])
        vn = native.hjb_march(
            p.theta, p.mu, p.sigma, p.r, p.T, p.x_min, p.x_max, exercise,
            n_time=p.n_time,
        )
        np.testing.assert_allclose(vn, res.value_function, rtol=1e-10, atol=1e-12)

    def test_hjb_march_bs_matches_jax_all_problems(self):
        """Native Brennan-Schwartz twin == device march for every stopping
        problem / sweep direction.  Regression: the twin originally assembled
        the operator with central differences while the device LCP path uses
        monotone upwind (the M-matrix form Brennan-Schwartz requires), so its
        detected entry boundaries were off by several cells."""
        from pde_tpu.solvers import hjb

        p = hjb.HJBParams(
            mu=5.0, sigma=0.1, c_entry=0.002, c_exit=0.002,
            n_space=96, n_time=24, method="brennan_schwartz",
        )
        x_np, g_np = _hjb_payoffs(p, all_problems=True)
        for k, pr in enumerate(hjb.StoppingProblem):
            rev = hjb._BS_REVERSE[pr]
            vn = native.hjb_march_bs(
                p.theta, p.mu, p.sigma, p.r, p.T, p.x_min, p.x_max,
                g_np[k], rev, n_time=p.n_time,
            )
            _, vd = hjb._march(
                g_np[k], p.theta, p.mu, p.sigma, p.r, p.T, p.x_min, p.x_max,
                p.n_space, p.n_time, method="brennan_schwartz",
                bs_reverse=np.asarray(rev),
            )
            np.testing.assert_allclose(
                vn, np.asarray(vd), rtol=1e-10, atol=1e-12,
                err_msg=f"problem {pr.name}",
            )

    def test_hjb_march_bs_multi_matches_single(self):
        """The one-call multi-problem march (one std::thread per problem on
        multi-core hosts, inline on 1-core) is bit-identical to the four
        single marches."""
        from pde_tpu.solvers import hjb

        p = hjb.HJBParams(mu=4.0, sigma=0.12, c_entry=0.002, c_exit=0.002,
                          n_space=96, n_time=24)
        _, g_np = _hjb_payoffs(p, all_problems=True)
        rev = [hjb._BS_REVERSE[pr] for pr in hjb.StoppingProblem]
        multi = native.hjb_march_bs_multi(
            p.theta, p.mu, p.sigma, p.r, p.T, p.x_min, p.x_max,
            g_np, rev, n_time=p.n_time)
        for k, pr in enumerate(hjb.StoppingProblem):
            single = native.hjb_march_bs(
                p.theta, p.mu, p.sigma, p.r, p.T, p.x_min, p.x_max,
                g_np[k], rev[k], n_time=p.n_time)
            assert np.array_equal(multi[k], single), pr.name


class TestCppUnitTests:
    """Build + run the native assert-suite (src/cpp/pde_host_test.cpp) —
    the analog of the reference's GTest layer (tests/cpp, 57 TEST cases)."""

    @pytest.mark.slow
    def test_cpp_suite_passes(self, tmp_path):
        import subprocess
        from pathlib import Path

        root = Path(__file__).resolve().parents[1]
        binary = tmp_path / "pde_host_test"
        sources = [
            root / "src" / "cpp" / f
            for f in ("pde_host.cpp", "pde_solvers.cpp", "pde_host_test.cpp")
        ]
        build = subprocess.run(
            ["g++", "-O2", "-march=native", "-std=c++17", "-pthread",
             *map(str, sources), "-o", str(binary)],
            capture_output=True, text=True, timeout=300,
        )
        assert build.returncode == 0, build.stderr
        run = subprocess.run(
            [str(binary)], capture_output=True, text=True, timeout=600
        )
        assert run.returncode == 0, run.stdout + run.stderr
        assert "0 failures" in run.stdout


class TestFillEngine:
    """Native order-stream fill engine vs the Python execution handler."""

    def _python_fills(self, ticks, orders, slippage, impact, adv):
        from pde_tpu.backtest.events import Direction, MarketEvent, OrderEvent, OrderType

        handler_cls = __import__(
            "pde_tpu.backtest.execution", fromlist=["SimulatedExecutionHandler"]
        ).SimulatedExecutionHandler
        h = handler_cls(slippage_pct=slippage, market_impact_coeff=impact, adv=adv)
        results = {}
        oi = 0
        for t, px in ticks:
            h.update_market_data(MarketEvent(event_type=None, timestamp=t, symbol="X", price=px))
            while oi < len(orders) and orders[oi][0] <= t:
                st, side, typ, lp, sp, q = orders[oi]
                ev = OrderEvent(
                    event_type=None, timestamp=st, symbol="X",
                    direction=Direction.BUY if side > 0 else Direction.SELL,
                    quantity=q,
                    order_type=[OrderType.MARKET, OrderType.LIMIT, OrderType.STOP][int(typ)],
                    limit_price=lp, stop_price=sp, order_id=str(oi),
                )
                fill = h.execute_order(ev)
                if fill is not None:
                    results[oi] = (t, fill.fill_price, fill.commission, fill.slippage)
                oi += 1
            for fill in h.process_pending():
                results[int(fill.order_id)] = (t, fill.fill_price, fill.commission, fill.slippage)
        return results

    def test_matches_python_handler(self, rng):
        n_ticks, n_orders = 500, 60
        times = np.arange(n_ticks, dtype=float)
        prices = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.003, n_ticks)))
        submit = np.sort(rng.uniform(0, n_ticks * 0.8, n_orders))
        sides = rng.choice([1.0, -1.0], n_orders)
        types = rng.choice([0.0, 1.0, 2.0], n_orders, p=[0.4, 0.3, 0.3])
        limits = prices[0] * (1 + rng.normal(0, 0.01, n_orders))
        stops = prices[0] * (1 + rng.normal(0, 0.01, n_orders))
        qty = rng.integers(1, 500, n_orders).astype(float)

        n_filled, fills = native.simulate_fills(
            times, prices, submit, sides, types, limits, stops, qty,
            slippage_pct=5e-4, market_impact_coeff=0.1, adv=1e6)
        py = self._python_fills(
            list(zip(times, prices)),
            list(zip(submit, sides, types, limits, stops, qty)),
            5e-4, 0.1, 1e6)

        assert n_filled == len(py)
        for k in range(len(submit)):
            if k in py:
                np.testing.assert_allclose(fills[k], py[k], rtol=1e-12,
                                           err_msg=f"order {k}")
            else:
                assert np.isnan(fills[k]).all(), f"order {k} filled natively only"

    def test_limit_buy_waits_for_price(self):
        times = np.array([0.0, 1.0, 2.0])
        prices = np.array([100.0, 101.0, 98.0])
        n, fills = native.simulate_fills(
            times, prices, [0.0], [1.0], [1.0], [99.0], [0.0], [10.0],
            slippage_pct=0.0, market_impact_coeff=0.0)
        assert n == 1
        assert fills[0][0] == 2.0 and fills[0][1] == 98.0

    def test_throughput(self, rng):
        """The point of the native engine: millions of fills/sec."""
        import time as _time

        n_ticks, n_orders = 200_000, 100_000
        times = np.arange(n_ticks, dtype=float)
        prices = 100.0 * np.exp(np.cumsum(rng.normal(0, 0.001, n_ticks)))
        submit = np.sort(rng.uniform(0, n_ticks - 1.0, n_orders))
        sides = rng.choice([1.0, -1.0], n_orders)
        types = np.zeros(n_orders)  # market orders: one fill each
        z = np.zeros(n_orders)
        qty = np.full(n_orders, 100.0)
        t0 = _time.perf_counter()
        n, _ = native.simulate_fills(times, prices, submit, sides, types, z, z, qty)
        dt = _time.perf_counter() - t0
        assert n == n_orders
        assert n / dt > 1e5, f"only {n/dt:.0f} fills/s"


class TestBSImpliedVolOracle:
    def test_matches_jax_newton(self):
        import jax.numpy as jnp

        from pde_tpu.models import black_scholes as bs

        S0, r, q = 100.0, 0.05, 0.02
        K = np.linspace(80.0, 120.0, 17)
        T = np.full(17, 0.75)
        ic = (np.arange(17) % 2).astype(float)
        true_vol = np.linspace(0.15, 0.35, 17)
        prices = np.asarray(bs.price(S0, jnp.asarray(K), r, q, jnp.asarray(T),
                                     jnp.asarray(true_vol), jnp.asarray(ic) > 0.5))
        native_iv = native.bs_implied_vol(prices, S0, K, r, q, T, ic)
        np.testing.assert_allclose(native_iv, true_vol, atol=1e-7)
        jax_iv = np.asarray(bs.implied_vol(jnp.asarray(prices), S0, jnp.asarray(K),
                                           r, q, jnp.asarray(T),
                                           jnp.asarray(ic) > 0.5))
        np.testing.assert_allclose(native_iv, jax_iv, atol=1e-6)
