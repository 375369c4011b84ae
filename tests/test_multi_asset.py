"""Multi-asset options: baskets, spreads, exchanges, two-asset rainbows.

Coverage extension beyond the reference (single-asset throughout); the
validation strategy mirrors SURVEY.md section 4's oracle pattern — every MC
path is witnessed by an exact closed form or a deterministic quadrature,
and every approximation is bounded against the quadrature oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import black_scholes as bs
from pde_tpu.models import multi_asset as ma


SPOT1, SPOT2 = 100.0, 96.0
VOL1, VOL2 = 0.25, 0.35
RHO = 0.55
RATE, Q1, Q2 = 0.03, 0.01, 0.02
T = 0.9


# ---------------------------------------------------------------------------
# bivariate normal CDF
# ---------------------------------------------------------------------------


class TestBivariateNormCdf:
    def test_zero_corr_factorizes(self):
        from pde_tpu.utils.stats import norm_cdf

        h = jnp.array([-1.3, 0.0, 0.7, 2.1])
        k = jnp.array([0.4, -0.9, 1.5, -2.0])
        got = ma.bivariate_norm_cdf(h, k, 0.0)
        np.testing.assert_allclose(got, norm_cdf(h) * norm_cdf(k),
                                   rtol=0, atol=1e-12)

    def test_against_scipy(self):
        mvn = pytest.importorskip("scipy.stats").multivariate_normal
        for rho in (-0.95, -0.5, 0.0, 0.3, 0.8, 0.95):
            cov = [[1.0, rho], [rho, 1.0]]
            for h, k in [(-1.0, 0.5), (0.0, 0.0), (1.7, -0.6), (2.5, 2.5)]:
                want = mvn(mean=[0.0, 0.0], cov=cov).cdf([h, k])
                got = float(ma.bivariate_norm_cdf(h, k, rho))
                assert abs(got - want) < 5e-8, (h, k, rho)

    def test_degenerate_corr_limits(self):
        from pde_tpu.utils.stats import norm_cdf

        h, k = 0.3, 1.1
        # rho -> 1: P(X<=h, X<=k) = Phi(min(h, k))
        got = float(ma.bivariate_norm_cdf(h, k, 0.9999999))
        assert abs(got - float(norm_cdf(jnp.minimum(h, k)))) < 1e-4
        # rho -> -1: P(X<=h, -X<=k) = max(Phi(h) - Phi(-k), 0)
        got = float(ma.bivariate_norm_cdf(h, k, -0.9999999))
        want = max(float(norm_cdf(h)) - float(norm_cdf(-k)), 0.0)
        assert abs(got - want) < 1e-4

    def test_symmetry_and_marginals(self):
        got_hk = ma.bivariate_norm_cdf(0.8, -0.2, 0.6)
        got_kh = ma.bivariate_norm_cdf(-0.2, 0.8, 0.6)
        np.testing.assert_allclose(got_hk, got_kh, atol=1e-13)
        # h -> inf recovers the marginal
        from pde_tpu.utils.stats import norm_cdf

        got = ma.bivariate_norm_cdf(30.0, 0.4, 0.6)
        np.testing.assert_allclose(got, norm_cdf(0.4), atol=1e-12)


# ---------------------------------------------------------------------------
# closed forms vs each other and vs MC
# ---------------------------------------------------------------------------


class TestGeometricBasket:
    SPOTS = jnp.array([100.0, 95.0, 110.0, 102.0])
    W = jnp.array([0.4, 0.25, 0.2, 0.15])
    VOLS = jnp.array([0.2, 0.3, 0.25, 0.4])
    CORR = jnp.array([
        [1.0, 0.5, 0.3, 0.2],
        [0.5, 1.0, 0.4, 0.25],
        [0.3, 0.4, 1.0, 0.35],
        [0.2, 0.25, 0.35, 1.0],
    ])

    def test_single_asset_reduces_to_bs(self):
        p = ma.geometric_basket_price(
            jnp.array([100.0]), jnp.array([1.0]), 105.0, T,
            jnp.array([0.25]), jnp.eye(1), rate=RATE, dividends=0.01,
        )
        want = bs.price(100.0, 105.0, RATE, 0.01, T, 0.25, is_call=True)
        np.testing.assert_allclose(p, want, rtol=1e-12)

    def test_mc_on_geometric_payoff_matches_exactly(self):
        """MC with the geometric payoff itself converges to the closed
        form — validates the terminal sampler's drift and correlation."""
        key = jax.random.PRNGKey(7)
        s_t, _ = ma.sample_terminal_gbm(
            key, self.SPOTS, self.VOLS, self.CORR, T, RATE, 0.015,
            n_paths=1 << 18,
        )
        geo = jnp.exp(jnp.log(s_t) @ self.W)
        df = jnp.exp(-RATE * T)
        pay = df * jnp.maximum(geo - 100.0, 0.0)
        half = pay.shape[0] // 2
        paired = 0.5 * (pay[:half] + pay[half:])
        mc = float(jnp.mean(paired))
        se = float(jnp.std(paired) / np.sqrt(half))
        want = float(ma.geometric_basket_price(
            self.SPOTS, self.W, 100.0, T, self.VOLS, self.CORR,
            rate=RATE, dividends=0.015,
        ))
        assert abs(mc - want) < 4.0 * se

    def test_put_call_parity(self):
        c = ma.geometric_basket_price(
            self.SPOTS, self.W, 100.0, T, self.VOLS, self.CORR,
            rate=RATE, is_call=True)
        p = ma.geometric_basket_price(
            self.SPOTS, self.W, 100.0, T, self.VOLS, self.CORR,
            rate=RATE, is_call=False)
        m, s2 = ma._log_basket_moments(
            self.SPOTS, self.W, self.VOLS, self.CORR, RATE, 0.0, T)
        fwd = jnp.exp(m + 0.5 * s2)
        df = jnp.exp(-RATE * T)
        np.testing.assert_allclose(c - p, df * (fwd - 100.0), rtol=1e-10)


class TestBasketMC:
    def test_control_variate_consistent_and_tighter(self):
        key = jax.random.PRNGKey(3)
        args = (TestGeometricBasket.SPOTS, TestGeometricBasket.W,
                jnp.array([90.0, 100.0, 110.0]), T,
                TestGeometricBasket.VOLS, TestGeometricBasket.CORR)
        p_cv, se_cv = ma.price_basket_mc(
            key, *args, rate=RATE, control_variate=True)
        p_raw, se_raw = ma.price_basket_mc(
            key, *args, rate=RATE, control_variate=False)
        # same draws, so the CV estimate must sit inside the raw CI
        np.testing.assert_array_less(
            np.abs(np.asarray(p_cv - p_raw)), 4.0 * np.asarray(se_raw))
        # and materially tighter: >=3x stderr (~10x variance) even at this
        # deliberately low-correlation basket, where the geometric twin is
        # a weak proxy (measured 4.6-7.5x here; near-1 correlations do far
        # better)
        assert np.all(np.asarray(se_cv) * 3.0 < np.asarray(se_raw))

    def test_two_asset_basket_vs_quadrature(self):
        """A 2-asset 'basket' with weights (1, -1) is a spread — price it
        both ways."""
        key = jax.random.PRNGKey(11)
        k = 5.0
        p_mc, se = ma.price_spread_mc(
            key, SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
            rate=RATE, div1=Q1, div2=Q2)
        want = float(ma.spread_price_quad(
            SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
            rate=RATE, div1=Q1, div2=Q2))
        assert abs(float(p_mc) - want) < 4.0 * float(se)
        assert float(se) < 0.05


class TestSpreadAndExchange:
    def test_kirk_reduces_to_margrabe_at_zero_strike(self):
        kirk = ma.kirk_spread_price(
            SPOT1, SPOT2, 0.0, T, VOL1, VOL2, RHO,
            rate=RATE, div1=Q1, div2=Q2)
        marg = ma.margrabe_price(
            SPOT1, SPOT2, T, VOL1, VOL2, RHO, rate=RATE, div1=Q1, div2=Q2)
        np.testing.assert_allclose(kirk, marg, rtol=1e-10)

    def test_quad_matches_margrabe_at_zero_strike(self):
        quad = ma.spread_price_quad(
            SPOT1, SPOT2, 0.0, T, VOL1, VOL2, RHO,
            rate=RATE, div1=Q1, div2=Q2)
        marg = ma.margrabe_price(
            SPOT1, SPOT2, T, VOL1, VOL2, RHO, rate=RATE, div1=Q1, div2=Q2)
        np.testing.assert_allclose(quad, marg, rtol=1e-9)

    def test_kirk_error_bounded_by_quadrature(self):
        fwd_scale = SPOT1
        for k in (-10.0, -3.0, 3.0, 10.0, 20.0):
            kirk = float(ma.kirk_spread_price(
                SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
                rate=RATE, div1=Q1, div2=Q2))
            quad = float(ma.spread_price_quad(
                SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
                rate=RATE, div1=Q1, div2=Q2))
            assert abs(kirk - quad) < 5e-3 * fwd_scale, k

    def test_quad_put_call_parity(self):
        k = 7.0
        c = ma.spread_price_quad(SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
                                 rate=RATE, div1=Q1, div2=Q2, is_call=True)
        p = ma.spread_price_quad(SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
                                 rate=RATE, div1=Q1, div2=Q2, is_call=False)
        f1 = SPOT1 * np.exp((RATE - Q1) * T)
        f2 = SPOT2 * np.exp((RATE - Q2) * T)
        df = np.exp(-RATE * T)
        np.testing.assert_allclose(c - p, df * (f1 - f2 - k), rtol=1e-10)

    def test_negative_strike_always_exercised_limit(self):
        """K << -S2: the option is forward-like, price -> df (F1 - F2 - K)."""
        k = -1e4
        c = float(ma.spread_price_quad(
            SPOT1, SPOT2, k, T, VOL1, VOL2, RHO,
            rate=RATE, div1=Q1, div2=Q2))
        f1 = SPOT1 * np.exp((RATE - Q1) * T)
        f2 = SPOT2 * np.exp((RATE - Q2) * T)
        want = np.exp(-RATE * T) * (f1 - f2 - k)
        np.testing.assert_allclose(c, want, rtol=1e-10)

    def test_margrabe_grad_matches_fd(self):
        g = jax.grad(
            lambda s1: ma.margrabe_price(s1, SPOT2, T, VOL1, VOL2, RHO,
                                         rate=RATE, div1=Q1, div2=Q2)
        )(jnp.asarray(SPOT1))
        eps = 1e-4
        fd = (float(ma.margrabe_price(SPOT1 + eps, SPOT2, T, VOL1, VOL2,
                                      RHO, rate=RATE, div1=Q1, div2=Q2))
              - float(ma.margrabe_price(SPOT1 - eps, SPOT2, T, VOL1, VOL2,
                                        RHO, rate=RATE, div1=Q1, div2=Q2))
              ) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-6)


class TestRainbow:
    def test_max_plus_min_identity(self):
        """call_on_max + call_on_min = vanilla(S1) + vanilla(S2)."""
        for k in (80.0, 100.0, 120.0):
            cmax = float(ma.rainbow_two_asset_price(
                SPOT1, SPOT2, k, T, VOL1, VOL2, RHO, rate=RATE,
                div1=Q1, div2=Q2, kind="call_on_max"))
            cmin = float(ma.rainbow_two_asset_price(
                SPOT1, SPOT2, k, T, VOL1, VOL2, RHO, rate=RATE,
                div1=Q1, div2=Q2, kind="call_on_min"))
            c1 = float(bs.price(SPOT1, k, RATE, Q1, T, VOL1))
            c2 = float(bs.price(SPOT2, k, RATE, Q2, T, VOL2))
            np.testing.assert_allclose(cmax + cmin, c1 + c2, rtol=1e-8)

    @pytest.mark.parametrize("kind", ["call_on_max", "call_on_min",
                                      "put_on_max", "put_on_min"])
    def test_against_mc(self, kind):
        key = jax.random.PRNGKey(17)
        k = 100.0
        exact = float(ma.rainbow_two_asset_price(
            SPOT1, SPOT2, k, T, VOL1, VOL2, RHO, rate=RATE,
            div1=Q1, div2=Q2, kind=kind))
        mc, se = ma.price_rainbow_mc(
            key, SPOT1, SPOT2, k, T, VOL1, VOL2, RHO, rate=RATE,
            div1=Q1, div2=Q2, kind=kind, n_paths=1 << 18)
        assert abs(float(mc) - exact) < 4.0 * float(se), kind
        assert float(se) < 0.2

    def test_identical_assets_degenerate(self):
        """rho -> 1 with identical assets: max = min = the asset."""
        for kind in ("call_on_max", "call_on_min"):
            p = float(ma.rainbow_two_asset_price(
                SPOT1, SPOT1, 100.0, T, VOL1, VOL1, 0.99999,
                rate=RATE, div1=Q1, div2=Q1, kind=kind))
            want = float(bs.price(SPOT1, 100.0, RATE, Q1, T, VOL1))
            assert abs(p - want) < 2e-3 * SPOT1

    def test_vmap_over_strikes(self):
        ks = jnp.array([90.0, 100.0, 110.0])
        f = jax.vmap(lambda k: ma.rainbow_two_asset_price(
            SPOT1, SPOT2, k, T, VOL1, VOL2, RHO, rate=RATE,
            div1=Q1, div2=Q2, kind="call_on_min"))
        out = f(ks)
        assert out.shape == (3,)
        # prices decrease in strike
        assert float(out[0]) > float(out[1]) > float(out[2])


class TestImpliedCorrelation:
    def test_round_trip(self):
        k = 6.0
        for rho_true in (-0.6, 0.0, 0.45, 0.85):
            px = ma.kirk_spread_price(
                SPOT1, SPOT2, k, T, VOL1, VOL2, rho_true,
                rate=RATE, div1=Q1, div2=Q2)
            rho_hat = float(ma.implied_correlation(
                px, SPOT1, SPOT2, k, T, VOL1, VOL2,
                rate=RATE, div1=Q1, div2=Q2))
            assert abs(rho_hat - rho_true) < 1e-6, rho_true

    def test_vmaps_over_quotes(self):
        ks = jnp.array([3.0, 6.0, 9.0])
        px = jax.vmap(lambda k: ma.kirk_spread_price(
            SPOT1, SPOT2, k, T, VOL1, VOL2, 0.4,
            rate=RATE, div1=Q1, div2=Q2))(ks)
        rho = jax.vmap(lambda p, k: ma.implied_correlation(
            p, SPOT1, SPOT2, k, T, VOL1, VOL2,
            rate=RATE, div1=Q1, div2=Q2))(px, ks)
        np.testing.assert_allclose(rho, 0.4, atol=1e-6)
