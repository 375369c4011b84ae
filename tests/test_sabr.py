"""SABR Hagan-formula tests: golden parity + identities (cf. tests/cpp/test_sabr.cpp)."""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import sabr
from pde_tpu.models.sabr import SABRParams

GOLDEN = json.loads((pathlib.Path(__file__).parent / "golden" / "reference_values.json").read_text())


@pytest.fixture(scope="module")
def params():
    return SABRParams(alpha=0.2, beta=0.5, rho=-0.3, nu=0.4)


class TestGoldenParity:
    def test_otm(self, params):
        v = sabr.implied_volatility(105.0, 100.0, 1.0, params)
        assert abs(float(v) - GOLDEN["sabr_vol_k105"]) < 1e-10

    def test_deep_itm(self, params):
        v = sabr.implied_volatility(80.0, 100.0, 1.0, params)
        assert abs(float(v) - GOLDEN["sabr_vol_k80"]) < 1e-10

    def test_atm(self, params):
        v = sabr.implied_volatility(100.0, 100.0, 1.0, params)
        assert abs(float(v) - GOLDEN["sabr_vol_atm"]) < 1e-12
        v2 = sabr.atm_volatility(100.0, 1.0, params)
        assert abs(float(v2) - GOLDEN["sabr_atm_formula"]) < 1e-12

    def test_short_maturity_positive_rho(self):
        p = SABRParams(alpha=0.3, beta=0.5, rho=0.2, nu=0.6)
        v = sabr.implied_volatility(120.0, 100.0, 0.25, p)
        assert abs(float(v) - GOLDEN["sabr_vol_k120_T025"]) < 1e-10

    def test_beta_one(self):
        p = SABRParams(alpha=0.25, beta=1.0, rho=-0.4, nu=0.5)
        v = sabr.implied_volatility(110.0, 100.0, 0.5, p)
        assert abs(float(v) - GOLDEN["sabr_b1_vol_k110"]) < 1e-10

    def test_beta_zero(self):
        p = SABRParams(alpha=15.0, beta=0.0, rho=0.1, nu=0.3)
        v = sabr.implied_volatility(95.0, 100.0, 2.0, p)
        assert abs(float(v) - GOLDEN["sabr_b0_vol_k95"]) < 1e-10


class TestIdentities:
    def test_smile_shape(self, params):
        """Negative rho skews the smile: downside vols above upside vols."""
        strikes = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
        vols = np.asarray(sabr.implied_volatilities(strikes, 100.0, 1.0, params))
        assert vols[0] > vols[2]  # put wing above ATM
        assert np.all(vols > 0)

    def test_smile_continuous_through_atm(self, params):
        """ATM branch joins the full formula smoothly (1e-6 moneyness window)."""
        v_atm = float(sabr.implied_volatility(100.0, 100.0, 1.0, params))
        v_near = float(sabr.implied_volatility(100.0000011, 100.0, 1.0, params))
        assert abs(v_atm - v_near) < 1e-6

    def test_zero_maturity(self, params):
        v = float(sabr.implied_volatility(90.0, 100.0, 0.0, params))
        expected = 0.2 / np.sqrt(np.sqrt(100.0 * 90.0))
        assert abs(v - expected) < 1e-12

    def test_zero_nu_reduces_to_cev(self):
        """nu = 0: vol has no z correction, only the CEV backbone."""
        p = SABRParams(alpha=0.2, beta=0.5, rho=0.0, nu=0.0)
        v = float(sabr.implied_volatility(110.0, 100.0, 1.0, p))
        assert np.isfinite(v) and v > 0

    def test_vectorized_matches_scalar(self, params):
        strikes = np.linspace(80, 120, 17)
        batch = np.asarray(sabr.implied_volatilities(strikes, 100.0, 1.0, params))
        single = np.array(
            [float(sabr.implied_volatility(k, 100.0, 1.0, params)) for k in strikes]
        )
        np.testing.assert_allclose(batch, single, atol=1e-14)


class TestSensitivities:
    @pytest.mark.slow
    def test_ad_matches_finite_difference(self, params):
        """AD sensitivities agree with the reference's FD scheme (sabr.cpp:250-280)."""
        d_alpha, d_rho, d_nu = sabr.volatility_sensitivities(105.0, 100.0, 1.0, params)

        eps = 1e-6

        def vol(a, r, n):
            return float(
                sabr.implied_volatility(105.0, 100.0, 1.0, SABRParams(a, 0.5, r, n))
            )

        fd_alpha = (vol(0.2 + eps, -0.3, 0.4) - vol(0.2 - eps, -0.3, 0.4)) / (2 * eps)
        fd_rho = (vol(0.2, -0.3 + eps, 0.4) - vol(0.2, -0.3 - eps, 0.4)) / (2 * eps)
        fd_nu = (vol(0.2, -0.3, 0.4 + eps) - vol(0.2, -0.3, 0.4 - eps)) / (2 * eps)

        assert abs(float(d_alpha) - fd_alpha) < 1e-6
        assert abs(float(d_rho) - fd_rho) < 1e-6
        assert abs(float(d_nu) - fd_nu) < 1e-6

    def test_alpha_sensitivity_positive(self, params):
        d_alpha, _, _ = sabr.volatility_sensitivities(105.0, 100.0, 1.0, params)
        assert float(d_alpha) > 0


class TestValidation:
    def test_invalid_params_raise(self):
        with pytest.raises(ValueError):
            SABRParams(alpha=-0.1, beta=0.5, rho=0.0, nu=0.3).validate()
        with pytest.raises(ValueError):
            SABRParams(alpha=0.2, beta=1.5, rho=0.0, nu=0.3).validate()
        with pytest.raises(ValueError):
            SABRParams(alpha=0.2, beta=0.5, rho=1.0, nu=0.3).validate()


class TestSensitivityGoldenParity:
    def test_ad_matches_cpp_fd(self, params):
        """AD sensitivities agree with the reference's central FD values to
        the FD truncation error (~1e-6, sabr.cpp:250-280)."""
        d_alpha, d_rho, d_nu = sabr.volatility_sensitivities(105.0, 100.0, 1.0, params)
        assert abs(float(d_alpha) - GOLDEN["sabr_sens_dalpha"]) < 1e-5
        assert abs(float(d_rho) - GOLDEN["sabr_sens_drho"]) < 1e-5
        assert abs(float(d_nu) - GOLDEN["sabr_sens_dnu"]) < 1e-5
