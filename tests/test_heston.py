"""Heston model tests: analytic identities + C++ reference parity.

Mirrors the reference test strategy (tests/cpp/test_heston.cpp:98-330):
CF identities, put-call parity, intrinsic value at expiry, Greeks signs,
IV round-trip — plus exact golden-value parity at the BASELINE.json
tolerances (1e-8 price, 1e-6 implied vol).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import black_scholes as bs
from pde_tpu.models import heston
from pde_tpu.models.heston import HestonParams

GOLDEN = json.loads((pathlib.Path(__file__).parent / "golden" / "reference_values.json").read_text())

MKT = dict(spot=100.0, rate=0.05, dividend=0.02)


@pytest.fixture(scope="module")
def params():
    return HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)


class TestCharacteristicFunction:
    def test_cf_at_zero_is_one(self, params):
        phi = heston.characteristic_function(params, 0.0 + 0.0j, 1.0, 100.0, 0.05, 0.02)
        assert abs(complex(phi) - 1.0) < 1e-12

    def test_cf_zero_maturity(self, params):
        u = 1.3 + 0.0j
        phi = heston.characteristic_function(params, u, 0.0, 100.0, 0.05, 0.02)
        expected = np.exp(1j * 1.3 * np.log(100.0))
        assert abs(complex(phi) - expected) < 1e-12

    def test_cf_golden_parity(self, params):
        phi = heston.characteristic_function(params, 1.5 - 1.75j, 1.0, 100.0, 0.05, 0.02)
        assert abs(complex(phi).real - GOLDEN["heston_cf_re"]) < 1e-6 * abs(GOLDEN["heston_cf_re"])
        assert abs(complex(phi).imag - GOLDEN["heston_cf_im"]) < 1e-6 * abs(GOLDEN["heston_cf_im"])

    def test_cf_conjugate_symmetry(self, params):
        """phi(-u) = conj(phi(u)) for real u."""
        u = 2.1
        a = complex(heston.characteristic_function(params, u + 0j, 1.0, 100.0, 0.05, 0.02))
        b = complex(heston.characteristic_function(params, -u + 0j, 1.0, 100.0, 0.05, 0.02))
        assert abs(a.conjugate() - b) < 1e-10


class TestPricingParity:
    """Exact parity with the C++ Carr-Madan quadrature (heston.cpp:94-151)."""

    def test_atm_call(self, params):
        p = heston.price_carr_madan(params, 100.0, 1.0, **MKT)
        assert abs(float(p) - GOLDEN["heston_call_atm_T1"]) < 1e-8

    def test_atm_put(self, params):
        p = heston.price_carr_madan(params, 100.0, 1.0, is_call=False, **MKT)
        assert abs(float(p) - GOLDEN["heston_put_atm_T1"]) < 1e-8

    def test_itm_short_maturity(self, params):
        p = heston.price_carr_madan(params, 80.0, 0.25, **MKT)
        assert abs(float(p) - GOLDEN["heston_call_k80_T025"]) < 1e-8

    def test_otm_long_maturity(self, params):
        p = heston.price_carr_madan(params, 120.0, 2.0, **MKT)
        assert abs(float(p) - GOLDEN["heston_call_k120_T2"]) < 1e-8

    def test_no_dividend(self, params):
        p = heston.price_carr_madan(params, 90.0, 0.5, spot=100.0, rate=0.03, dividend=0.0)
        assert abs(float(p) - GOLDEN["heston_call_k90_T05_q0"]) < 1e-8

    def test_strike_sweep_vectorized(self, params):
        """The 100-option vectorized benchmark config, one tensor call."""
        strikes = np.linspace(80.0, 120.0, 100)
        prices = heston.price_options(params, strikes, 1.0, **MKT)
        np.testing.assert_allclose(
            np.asarray(prices), np.array(GOLDEN["heston_strikes_T1"]), atol=1e-8
        )

    def test_feller_violating_params(self):
        p2 = HestonParams(kappa=1.0, theta=0.09, sigma=0.9, rho=-0.5, v0=0.06)
        assert not bool(p2.feller_satisfied())
        p = heston.price_carr_madan(p2, 100.0, 1.0, **MKT)
        assert abs(float(p) - GOLDEN["heston2_call_atm_T1"]) < 1e-8
        p = heston.price_carr_madan(p2, 70.0, 3.0, **MKT)
        assert abs(float(p) - GOLDEN["heston2_call_k70_T3"]) < 1e-8


class TestPricingIdentities:
    def test_put_call_parity(self, params):
        """C - P = S e^{-qT} - K e^{-rT} (test_heston.cpp:197-213)."""
        c = float(heston.price_carr_madan(params, 100.0, 1.0, **MKT))
        p = float(heston.price_carr_madan(params, 100.0, 1.0, is_call=False, **MKT))
        expected = 100.0 * np.exp(-0.02) - 100.0 * np.exp(-0.05)
        assert abs((c - p) - expected) < 0.5

    def test_intrinsic_at_zero_maturity(self, params):
        c = heston.price_carr_madan(params, 90.0, 0.0, **MKT)
        assert abs(float(c) - 10.0) < 1e-6
        p = heston.price_carr_madan(params, 110.0, 0.0, is_call=False, **MKT)
        assert abs(float(p) - 10.0) < 1e-6

    def test_monotone_in_strike(self, params):
        strikes = np.linspace(80.0, 120.0, 41)
        prices = np.asarray(heston.price_options(params, strikes, 1.0, **MKT))
        assert np.all(np.diff(prices) < 0)

    def test_jit_and_vmap_over_params(self, params):
        """Batched pricing over a parameter population (the DE hot path)."""
        pop = HestonParams(
            kappa=jnp.array([1.0, 2.0, 3.0]),
            theta=jnp.array([0.03, 0.04, 0.05]),
            sigma=jnp.array([0.2, 0.3, 0.4]),
            rho=jnp.array([-0.5, -0.7, -0.3]),
            v0=jnp.array([0.03, 0.04, 0.05]),
        )
        strikes = jnp.linspace(80.0, 120.0, 20)

        @jax.jit
        def price_pop(p):
            return jax.vmap(lambda q: heston.price_options(q, strikes, 1.0, **MKT))(p)

        out = price_pop(pop)
        assert out.shape == (3, 20)
        ref = heston.price_options(params, strikes, 1.0, **MKT)
        np.testing.assert_allclose(out[1], ref, atol=1e-10)


class TestGreeks:
    def test_greeks_signs_and_ranges(self, params):
        g = heston.price_with_greeks(params, 100.0, 1.0, **MKT)
        assert 0.0 < float(g["delta"]) < 1.0  # ATM call delta
        assert float(g["gamma"]) > 0.0
        assert float(g["vega"]) > 0.0
        assert float(g["theta"]) < 0.0
        assert float(g["rho"]) > 0.0

    def test_put_delta_negative(self, params):
        g = heston.price_with_greeks(params, 100.0, 1.0, is_call=False, **MKT)
        assert -1.0 < float(g["delta"]) < 0.0


class TestImpliedVol:
    def test_iv_golden_parity(self, params):
        iv = heston.implied_volatility(params, 100.0, 1.0, **MKT)
        assert abs(float(iv) - GOLDEN["heston_iv_atm_T1"]) < 1e-6
        iv = heston.implied_volatility(params, 110.0, 0.5, **MKT)
        assert abs(float(iv) - GOLDEN["heston_iv_k110_T05"]) < 1e-6

    def test_iv_round_trip(self, params):
        """BS(IV) reproduces the Heston price (test_heston.cpp:306-324)."""
        strikes = np.array([85.0, 95.0, 100.0, 105.0, 115.0])
        hp = heston.price_options(params, strikes, 1.0, **MKT)
        iv = heston.implied_volatility(params, strikes, 1.0, **MKT)
        back = bs.price(100.0, strikes, 0.05, 0.02, 1.0, iv, True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(hp), atol=1e-6)


class TestFFTPricer:
    """The FFT path targets the *true* Carr-Madan integral.

    The reference's 1024-point trapezoid zeroes the v=0 term and truncates at
    v=10.24 (heston.cpp:110,126-135), giving ~2% bias vs the exact integral;
    price_carr_madan replicates that bias for parity, price_fft does not.
    Truth fixtures come from scipy adaptive quadrature over [0, 1000]
    (tests/golden/true_values.json).
    """

    def test_fft_matches_true_integral(self, params):
        truth = json.loads(
            (pathlib.Path(__file__).parent / "golden" / "true_values.json").read_text()
        )
        for T in (0.25, 1.0):
            k_grid, calls = heston.price_fft(params, T, **MKT, n_fft=16384, eta=0.1)
            strikes = np.array([85.0, 95.0, 100.0, 110.0, 120.0])
            fft_prices = np.interp(np.log(strikes), np.asarray(k_grid), np.asarray(calls))
            expected = np.array(
                [truth[f"heston_true_call_k{int(k)}_T{T}"] for k in strikes]
            )
            np.testing.assert_allclose(fft_prices, expected, atol=3e-3)

    def test_fft_self_convergence(self, params):
        """Doubling the FFT resolution changes prices below tolerance."""
        k1, c1 = heston.price_fft(params, 1.0, **MKT, n_fft=8192, eta=0.1)
        k2, c2 = heston.price_fft(params, 1.0, **MKT, n_fft=16384, eta=0.05)
        strikes = np.array([90.0, 100.0, 110.0])
        p1 = np.interp(np.log(strikes), np.asarray(k1), np.asarray(c1))
        p2 = np.interp(np.log(strikes), np.asarray(k2), np.asarray(c2))
        np.testing.assert_allclose(p1, p2, atol=5e-3)


class TestValidation:
    def test_invalid_params_raise(self):
        with pytest.raises(ValueError):
            HestonParams(kappa=-1.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04).validate()
        with pytest.raises(ValueError):
            HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-1.5, v0=0.04).validate()

    def test_feller(self, params):
        assert bool(params.feller_satisfied())
        assert abs(float(params.feller_value()) - (2 * 2.0 * 0.04 - 0.09)) < 1e-12


class TestIVSurface:
    def test_surface_grid_shape_and_skew(self, params):
        strikes = np.linspace(85.0, 115.0, 7)
        maturities = np.array([0.25, 0.5, 1.0])
        surf = heston.implied_volatility_surface(
            params, strikes, maturities, **MKT
        )
        assert surf.shape == (3, 7)
        s = np.asarray(surf)
        assert np.all(np.isfinite(s)) and np.all(s > 0)
        # rho = -0.7: downside skew at every maturity
        assert np.all(s[:, 0] > s[:, -1])


class TestGreeksGoldenParity:
    def test_fd_greeks_match_cpp(self, params):
        """Same FD stencils and bump sizes as heston.cpp:169-218."""
        g = heston.price_with_greeks(params, 100.0, 1.0, **MKT)
        assert abs(float(g["delta"]) - GOLDEN["heston_greek_delta"]) < 1e-8
        assert abs(float(g["gamma"]) - GOLDEN["heston_greek_gamma"]) < 1e-8
        assert abs(float(g["vega"]) - GOLDEN["heston_greek_vega"]) < 1e-6
        assert abs(float(g["theta"]) - GOLDEN["heston_greek_theta"]) < 1e-6
        assert abs(float(g["rho"]) - GOLDEN["heston_greek_rho"]) < 1e-6


class TestADGreeks:
    def test_ad_delta_matches_fd_of_accurate_pricer(self, params):
        g = heston.greeks_ad(params, 100.0, 1.0, **MKT)
        eps = 1e-4
        up = float(heston.price_accurate(params, 100.0, 1.0, 100.0 + eps, 0.05, 0.02))
        dn = float(heston.price_accurate(params, 100.0, 1.0, 100.0 - eps, 0.05, 0.02))
        assert abs(float(g["delta"]) - (up - dn) / (2 * eps)) < 1e-6
        assert float(g["gamma"]) > 0
        assert float(g["vega"]) > 0
        assert float(g["theta"]) < 0
        # the reference-parity FD greeks carry the reference quadrature's
        # ~2% price bias into delta (~0.024 here); AD-of-the-converged-pricer
        # is the accurate value, so only loose agreement is expected
        fd = heston.price_with_greeks(params, 100.0, 1.0, **MKT)
        assert abs(float(g["delta"]) - float(fd["delta"])) < 0.05


class TestGroupedPricers:
    """Grouped-CF pricers (CF shared across strikes per unique maturity)
    must match their per-option twins bit-for-bit in semantics: same
    quadrature, same parity/intrinsic handling, padding rows inert."""

    def _surface(self):
        K = np.tile(np.linspace(85.0, 115.0, 12), 9)
        T = np.repeat(np.linspace(0.25, 1.5, 9), 12)
        calls = np.arange(108) % 2 == 0
        return K, T, calls

    def test_carr_madan_grouped_matches(self, params):
        K, T, calls = self._surface()
        ref = heston.price_carr_madan(params, K, T, 100.0, 0.05, 0.02, calls)
        uT, idx = heston.group_maturities(T)
        got = heston.price_carr_madan_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-10)

    def test_gauss_legendre_grouped_matches(self, params):
        K, T, calls = self._surface()
        ref = heston.price_gauss_legendre(params, K, T, 100.0, 0.05, 0.02, calls)
        uT, idx = heston.group_maturities(T)
        got = heston.price_gauss_legendre_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-10)

    def test_corrected_gl_reproduces_reference_grid(self, params):
        """The Euler-Maclaurin-corrected GL rule must reproduce the LITERAL
        reference rectangle sum (including its dropped-endpoint bias), not
        just the truncated integral — that is what makes it a drop-in for
        the calibration objective."""
        K, T, calls = self._surface()
        ref = heston.price_carr_madan(params, K, T, 100.0, 0.05, 0.02, calls)
        got = heston.price_carr_madan_gl(params, K, T, 100.0, 0.05, 0.02, calls)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-7)
        uT, idx = heston.group_maturities(T)
        got_g = heston.price_carr_madan_gl_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref), rtol=0, atol=1e-7)

    def test_corrected_gl_across_param_corners(self):
        strikes = jnp.asarray(np.linspace(60.0, 150.0, 21))
        corners = [
            heston.HestonParams(0.5, 0.09, 0.9, -0.9, 0.01),
            heston.HestonParams(8.0, 0.02, 0.1, 0.5, 0.09),
            heston.HestonParams(1.0, 0.25, 1.5, -0.3, 0.25),
        ]
        for p in corners:
            for T in (0.05, 0.5, 2.0):
                mats = jnp.full(21, T)
                ref = heston.price_carr_madan(p, strikes, mats, 100.0, 0.05, 0.02)
                got = heston.price_carr_madan_gl(p, strikes, mats, 100.0, 0.05, 0.02)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=0, atol=1e-6
                )

    def test_accurate_gl_matches_converged_trapezoid(self, params):
        """Composite-GL converged pricer == 8192-point trapezoid to the
        trapezoid's own error budget (the rule itself self-converges to
        ~5e-6 at extreme corners, tighter than the trapezoid there)."""
        K, T, calls = self._surface()
        ref = heston.price_accurate(params, K, T, 100.0, 0.05, 0.02, calls)
        got = heston.price_accurate_gl(params, K, T, 100.0, 0.05, 0.02, calls)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=5e-6)
        uT, idx = heston.group_maturities(T)
        got_g = heston.price_accurate_gl_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(got), rtol=0, atol=1e-10
        )

    def test_accurate_gl_self_convergence_extreme_corner(self):
        p = heston.HestonParams(1.0, 0.25, 1.5, -0.3, 0.25)
        strikes = jnp.asarray(np.linspace(50.0, 200.0, 16))
        mats = jnp.full(16, 5.0)
        a = heston.price_accurate_gl(p, strikes, mats, 100.0, 0.05, 0.02)
        b = heston.price_accurate_gl(
            p, strikes, mats, 100.0, 0.05, 0.02, n_per_panel=96
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)

    @pytest.mark.slow
    def test_corrected_gl_random_sweep(self):
        """Property sweep: 200 random parameter draws inside the calibration
        bounds x 3 maturities — the corrected-GL rule must track the literal
        reference grid wherever Carr-Madan with alpha=0.75 is VALID, i.e.
        T safely below the 1.75-moment explosion time.  Past explosion the
        reference integrand develops a v=0 boundary layer and its own grid
        value is numerical junk (see moment_explosion_time), so no smooth
        rule can — or should — reproduce it there."""
        rng = np.random.default_rng(7)
        lo = np.array([0.1, 0.01, 0.01, -0.99, 0.01])
        hi = np.array([10.0, 1.0, 2.0, 0.99, 1.0])
        draws = lo + (hi - lo) * rng.random((200, 5))
        strikes = jnp.asarray(np.linspace(70.0, 140.0, 12))
        alpha_moment = 1.0 + 0.75
        worst = 0.0
        n_valid = 0
        for T in (0.1, 0.75, 2.0):
            mats = jnp.full(12, T)
            valid = np.array([
                T < 0.8 * heston.moment_explosion_time(
                    heston.HestonParams(*x), alpha_moment)
                for x in draws
            ])
            n_valid += int(valid.sum())

            def both(x):
                p = heston.HestonParams(x[0], x[1], x[2], x[3], x[4])
                ref = heston.price_carr_madan(p, strikes, mats, 100.0, 0.05, 0.02)
                gl = heston.price_carr_madan_gl(p, strikes, mats, 100.0, 0.05, 0.02)
                return jnp.max(jnp.abs(gl - ref))

            diffs = np.asarray(jax.vmap(both)(jnp.asarray(draws)))
            worst = max(worst, float(diffs[valid].max()))
        assert n_valid > 400  # the gate must not trivialize the sweep
        # 1e-4 headroom: near-explosion draws sit ~1e-5; typical are ~1e-9
        assert worst < 1e-4, f"corrected-GL drifted from reference grid: {worst}"

    def test_moment_explosion_time(self):
        # benign params: 1.75-moment finite for all T
        p = heston.HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
        assert heston.moment_explosion_time(p, 1.75) == float("inf")
        # moments in [0, 1] never explode
        assert heston.moment_explosion_time(p, 0.5) == float("inf")
        # the sweep's failing draw: T=2 sits inside the near-explosion
        # boundary layer (T* = 2.14, so the 0.8*T* validity gate excludes
        # it — the reference integrand is already quasi-singular there)
        bad = heston.HestonParams(1.345, 0.192, 1.601, 0.286, 0.724)
        t_star = heston.moment_explosion_time(bad, 1.75)
        assert 2.0 < t_star < 2.3
        # explosion time shrinks as vol-of-vol grows
        worse = heston.HestonParams(1.345, 0.192, 1.9, 0.286, 0.724)
        assert heston.moment_explosion_time(worse, 1.75) < t_star

    def test_accurate_grouped_and_iv(self, params):
        K, T, calls = self._surface()
        ref = heston.price_accurate(params, K, T, 100.0, 0.05, 0.02, calls)
        uT, idx = heston.group_maturities(T)
        got = heston.price_accurate_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-10)
        iv_ref = heston.implied_volatility(
            params, K, T, 100.0, 0.05, 0.02, calls, accurate=True
        )
        iv_got = heston.implied_volatility_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls, accurate=True
        )
        np.testing.assert_allclose(np.asarray(iv_got), np.asarray(iv_ref), atol=1e-10)

    def test_padding_rows_inert(self, params):
        K, T, calls = self._surface()
        ref = heston.price_carr_madan(params, K, T, 100.0, 0.05, 0.02, calls)
        uT, idx = heston.group_maturities(T, pad_to=16)
        assert len(uT) == 16
        got = heston.price_carr_madan_grouped(
            params, K, idx, uT, 100.0, 0.05, 0.02, calls
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-10)

    def test_pad_to_too_small_raises(self):
        with pytest.raises(ValueError):
            heston.group_maturities(np.array([0.25, 0.5, 1.0]), pad_to=2)

    def test_zero_maturity_intrinsic(self, params):
        uT, idx = heston.group_maturities(np.array([0.0, 0.5]))
        p = heston.price_carr_madan_grouped(
            params, np.array([90.0, 90.0]), idx, uT, 100.0, 0.05, 0.02, True
        )
        assert float(p[0]) == pytest.approx(10.0)
