"""Tests for grids, stats and linalg utilities (cf. tests/cpp/test_math_utils.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pde_tpu.core import grids
from pde_tpu.utils import linalg, stats


class TestGrids:
    def test_uniform(self):
        g = grids.uniform_grid(0.0, 1.0, 11)
        np.testing.assert_allclose(np.asarray(g), np.linspace(0, 1, 11))

    def test_log_grid_uniform_in_log(self):
        g = np.asarray(grids.log_grid(20.0, 500.0, 100))
        steps = np.diff(np.log(g))
        np.testing.assert_allclose(steps, steps[0], rtol=1e-12)
        assert abs(g[0] - 20.0) < 1e-10 and abs(g[-1] - 500.0) < 1e-9

    def test_uniform_step(self):
        g = grids.log_grid(20.0, 500.0, 100)
        expected = np.log(500.0 / 20.0) / 99
        assert abs(float(grids.uniform_step(g, log_space=True)) - expected) < 1e-14

    def test_find_index_closest(self):
        g = grids.uniform_grid(0.0, 10.0, 11)
        assert int(grids.find_index(g, 3.4)) == 3
        assert int(grids.find_index(g, 3.6)) == 4
        assert int(grids.find_index(g, -5.0)) == 0
        assert int(grids.find_index(g, 50.0)) == 10

    def test_interp_linear(self):
        g = grids.uniform_grid(0.0, 10.0, 11)
        v = g * 2.0
        assert abs(float(grids.interp_linear(g, v, 3.5)) - 7.0) < 1e-12
        assert abs(float(grids.interp_linear(g, v, -1.0)) - 0.0) < 1e-12  # clamped

    def test_interp_bilinear(self):
        x = grids.uniform_grid(0.0, 1.0, 5)
        y = grids.uniform_grid(0.0, 1.0, 5)
        vals = x[:, None] + 2.0 * y[None, :]
        out = grids.interp_bilinear(x, y, vals, 0.3, 0.6)
        assert abs(float(out) - (0.3 + 1.2)) < 1e-12

    def test_invalid_grids_raise(self):
        with pytest.raises(ValueError):
            grids.uniform_grid(1.0, 0.0, 10)
        with pytest.raises(ValueError):
            grids.log_grid(-1.0, 10.0, 10)
        with pytest.raises(ValueError):
            grids.uniform_grid(0.0, 1.0, 2)


class TestStats:
    def test_norm_cdf(self):
        assert abs(float(stats.norm_cdf(0.0)) - 0.5) < 1e-15
        assert abs(float(stats.norm_cdf(1.96)) - 0.9750021048517795) < 1e-12
        assert abs(float(stats.norm_cdf(-1.96) + stats.norm_cdf(1.96)) - 1.0) < 1e-14

    def test_norm_pdf(self):
        assert abs(float(stats.norm_pdf(0.0)) - 0.3989422804014327) < 1e-15

    def test_moments(self):
        x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
        assert float(stats.mean(x)) == 3.0
        assert abs(float(stats.variance(x)) - 2.5) < 1e-14
        assert abs(float(stats.std_dev(x)) - np.sqrt(2.5)) < 1e-14


class TestLinalg:
    @pytest.fixture
    def returns(self, rng):
        cov_true = np.array([[0.04, 0.01], [0.01, 0.09]])
        L = np.linalg.cholesky(cov_true)
        return (rng.standard_normal((5000, 2)) @ L.T).astype(np.float64)

    def test_covariance_estimation(self, returns):
        cov = np.asarray(linalg.compute_covariance(jnp.asarray(returns)))
        np.testing.assert_allclose(cov, np.cov(returns.T), rtol=1e-10)

    def test_correlation(self, returns):
        cov = linalg.compute_covariance(jnp.asarray(returns))
        corr = np.asarray(linalg.covariance_to_correlation(cov))
        assert np.allclose(np.diag(corr), 1.0)
        assert np.all(np.abs(corr) <= 1.0 + 1e-12)

    def test_make_positive_definite(self):
        a = jnp.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
        assert not bool(linalg.is_positive_definite(a))
        fixed = linalg.make_positive_definite(a)
        assert bool(linalg.is_positive_definite(fixed, tol=0.0))

    def test_solve_positive_definite(self):
        a = jnp.array([[4.0, 1.0], [1.0, 3.0]])
        b = jnp.array([1.0, 2.0])
        x = linalg.solve_positive_definite(a, b)
        np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-12)

    def test_safe_invert(self):
        a = jnp.array([[2.0, 0.0], [0.0, 4.0]])
        inv = np.asarray(linalg.safe_invert(a))
        np.testing.assert_allclose(inv, [[0.5, 0.0], [0.0, 0.25]], atol=1e-8)

    def test_condition_number(self):
        a = jnp.diag(jnp.array([10.0, 1.0]))
        assert abs(float(linalg.condition_number(a)) - 10.0) < 1e-10

    def test_ewma_covariance_shape_and_pd(self, returns):
        s = linalg.ewma_covariance(jnp.asarray(returns[:500]))
        assert s.shape == (2, 2)
        assert bool(linalg.is_positive_definite(s))

    def test_cholesky(self):
        a = jnp.array([[4.0, 2.0], [2.0, 5.0]])
        c = np.asarray(linalg.cholesky_decomposition(a))
        np.testing.assert_allclose(c @ c.T, np.asarray(a), atol=1e-12)
