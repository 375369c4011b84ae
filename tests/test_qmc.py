"""Sobol quasi-Monte Carlo: generator properties + RQMC pricing accuracy.

Mirrors the reference's synthetic-round-trip test style
(tests/python/calibration/test_calibration.py) — the reference itself has no
QMC to compare against (its only MC engines are pseudo-random:
backtesting/analysis.py:631-841, risk/var_calculator.py:241-505), so the
oracles here are scipy's Sobol generator and the converged Carr-Madan price.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pde_tpu.core import qmc
from pde_tpu.models import heston, heston_mc

pytestmark = pytest.mark.skipif(
    not qmc.HAVE_DIRECTION_NUMBERS, reason="scipy direction numbers unavailable"
)


class TestSobolGenerator:
    def test_matches_scipy_unscrambled(self):
        from scipy.stats import qmc as sq

        dv = qmc.sobol_direction_numbers(5)
        ours = np.asarray(qmc.sobol_uniform(dv, 32, dtype=jnp.float32))
        ref = sq.Sobol(d=5, scramble=False, bits=32).random(32)
        # we sit at cell centers: off by exactly 2^-25 from scipy's corners
        assert np.abs(ours - ref).max() <= 2.0**-24

    def test_equidistribution_per_dimension(self):
        dv = qmc.sobol_direction_numbers(8)
        u = np.asarray(qmc.sobol_uniform(dv, 256))
        for d in range(8):
            h, _ = np.histogram(u[:, d], bins=16, range=(0.0, 1.0))
            assert (h == 16).all(), f"dim {d} not equidistributed: {h}"

    def test_scrambling_preserves_net_structure(self):
        # Matousek LMS + digital shift maps elementary intervals to
        # elementary intervals, so one-dimensional equidistribution over
        # dyadic bins must survive exactly.
        dv = qmc.sobol_direction_numbers(4)
        dvs = qmc.scramble_direction_numbers(dv, jax.random.PRNGKey(11))
        u = np.asarray(qmc.sobol_uniform(dvs, 256, jax.random.PRNGKey(5)))
        for d in range(4):
            h, _ = np.histogram(u[:, d], bins=16, range=(0.0, 1.0))
            assert (h == 16).all()

    def test_randomizations_differ_and_are_reproducible(self):
        dv = qmc.sobol_direction_numbers(3)
        a = np.asarray(qmc.sobol_uniform(dv, 64, jax.random.PRNGKey(1)))
        a2 = np.asarray(qmc.sobol_uniform(dv, 64, jax.random.PRNGKey(1)))
        b = np.asarray(qmc.sobol_uniform(dv, 64, jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(a, a2)
        assert np.abs(a - b).max() > 0.01

    def test_open_interval(self):
        # ndtri consumers need (0,1) strictly — point 0 of the unshifted
        # sequence is the all-zeros word, the worst case
        dv = qmc.sobol_direction_numbers(2)
        u = np.asarray(qmc.sobol_uniform(dv, 128, dtype=jnp.float32))
        assert u.min() > 0.0 and u.max() < 1.0
        z = np.asarray(qmc.sobol_normal(dv, 128, dtype=jnp.float32))
        assert np.isfinite(z).all()

    def test_gray_code_offset_continuation(self):
        dv = qmc.sobol_direction_numbers(3)
        full = np.asarray(qmc.sobol_uniform(dv, 64))
        tail = np.asarray(qmc.sobol_uniform(dv, 32, index_offset=32))
        np.testing.assert_array_equal(full[32:], tail)


class TestQMCPricing:
    def setup_method(self):
        self.p = heston.HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
        self.S0, self.r, self.q, self.T = 100.0, 0.03, 0.01, 1.0
        self.Ks = jnp.array([90.0, 100.0, 110.0])
        self.ref = np.asarray(
            heston.price_accurate(
                self.p, self.Ks, jnp.full(3, self.T), self.S0, self.r, self.q
            )
        )

    def test_sobol_european_beats_pseudo(self):
        key = jax.random.PRNGKey(0)
        kwargs = dict(
            rate=self.r, dividend=self.q, n_steps=16, n_paths=8192,
            control_variate=True,
        )
        px_mc, _ = heston_mc.price_european_mc(
            self.p, self.Ks, self.T, self.S0, key, antithetic=True, **kwargs
        )
        px_q, se_q = heston_mc.price_european_mc(
            self.p, self.Ks, self.T, self.S0, key,
            antithetic=False, sampler="sobol", **kwargs
        )
        err_mc = np.abs(np.asarray(px_mc) - self.ref).max()
        err_q = np.abs(np.asarray(px_q) - self.ref).max()
        # discretization bias (16 steps) is shared; the sampling error should
        # collapse under QMC.  Loose factor so the test is seed-robust.
        assert err_q < max(err_mc, 0.05) * 1.5
        assert err_q < 0.12
        assert np.asarray(se_q).max() < 0.05

    def test_sobol_asian_sane(self):
        px, se = heston_mc.price_asian_mc(
            self.p, 100.0, self.T, self.S0, jax.random.PRNGKey(3),
            rate=self.r, dividend=self.q, n_steps=16, n_paths=8192,
            antithetic=False, sampler="sobol",
        )
        px, se = float(px), float(se)
        # Asian < European for the same strike; positive, finite stderr
        assert 0.0 < px < float(self.ref[1])
        assert 0.0 < se < 0.2

    def test_sobol_rejects_antithetic(self):
        with pytest.raises(ValueError, match="antithetic"):
            heston_mc.simulate_qe(
                self.p, self.S0, self.T, jax.random.PRNGKey(0),
                n_steps=4, n_paths=64, antithetic=True, sampler="sobol",
            )

    def test_unknown_sampler_rejected(self):
        with pytest.raises(ValueError, match="sampler"):
            heston_mc.simulate_qe(
                self.p, self.S0, self.T, jax.random.PRNGKey(0),
                n_steps=4, n_paths=64, antithetic=False, sampler="halton",
            )

    def test_replicate_count_must_divide(self):
        with pytest.raises(ValueError, match="divisible"):
            heston_mc.price_european_mc(
                self.p, 100.0, self.T, self.S0, jax.random.PRNGKey(0),
                n_steps=4, n_paths=100, antithetic=False, sampler="sobol",
                n_replicates=8,
            )

    def test_sobol_stored_paths_shape(self):
        s, v = heston_mc.simulate_qe_paths(
            self.p, self.S0, self.T, jax.random.PRNGKey(2),
            n_steps=8, n_paths=256, antithetic=False, sampler="sobol",
        )
        assert s.shape == (8, 256) and v.shape == (8, 256)
        assert bool(jnp.isfinite(s).all()) and bool((v >= 0).all())
