"""Barrier pricing: Reiner-Rubinstein closed forms, the absorbing-boundary
Heston ADI solver, and the Brownian-bridge-corrected QE Monte Carlo — three
independent engines cross-validated against each other.

The reference platform has no barrier engine (its pricing surface is the
vanilla chain, data/options.py:118-455); these tests are the framework's own
consistency net for the exotics extension.
"""

import jax
import jax.numpy as jnp
import pytest

from pde_tpu.models import black_scholes as bs
from pde_tpu.models import heston_mc
from pde_tpu.models.heston import HestonParams
from pde_tpu.solvers.barrier_pde import solve_barrier
from pde_tpu.solvers.heston_adi import HestonPDEParams
from pde_tpu.solvers import heston_adi

ALL_TYPES = ["up-and-out", "up-and-in", "down-and-out", "down-and-in"]


class TestReinerRubinstein:
    S, K, r, q, T, sig = 100.0, 100.0, 0.05, 0.02, 1.0, 0.25

    def test_merton_down_and_out_identity(self):
        # classic closed form for B <= K:
        # DOC = C(S) - (S/B)^(1 - 2(r-q)/sig^2) C(B^2/S)
        B = 90.0
        doc = bs.barrier_price(
            self.S, self.K, B, self.r, self.q, self.T, self.sig,
            "down-and-out", True,
        )
        lam = 1.0 - 2.0 * (self.r - self.q) / self.sig**2
        merton = bs.price(
            self.S, self.K, self.r, self.q, self.T, self.sig, True
        ) - (self.S / B) ** lam * bs.price(
            B * B / self.S, self.K, self.r, self.q, self.T, self.sig, True
        )
        assert abs(float(doc) - float(merton)) < 1e-12

    @pytest.mark.parametrize("is_call", [True, False])
    @pytest.mark.parametrize("bt", ["up-and-out", "down-and-out"])
    def test_in_out_parity(self, bt, is_call):
        B = 120.0 if bt.startswith("up") else 85.0
        out = bs.barrier_price(
            self.S, self.K, B, self.r, self.q, self.T, self.sig, bt, is_call
        )
        inn = bs.barrier_price(
            self.S, self.K, B, self.r, self.q, self.T, self.sig,
            bt.replace("out", "in"), is_call,
        )
        vanilla = bs.price(
            self.S, self.K, self.r, self.q, self.T, self.sig, is_call
        )
        assert abs(float(out) + float(inn) - float(vanilla)) < 1e-12
        assert float(out) >= 0.0 and float(inn) >= 0.0

    def test_far_barrier_limits(self):
        # up-and-out with an unreachable barrier degenerates to the vanilla;
        # a barrier just above spot kills the option
        vanilla = bs.price(self.S, self.K, self.r, self.q, self.T, self.sig, True)
        far = bs.barrier_price(
            self.S, self.K, 1e6, self.r, self.q, self.T, self.sig,
            "up-and-out", True,
        )
        near = bs.barrier_price(
            self.S, self.K, self.S + 1e-2, self.r, self.q, self.T, self.sig,
            "up-and-out", True,
        )
        assert abs(float(far) - float(vanilla)) < 1e-9
        assert float(near) < 1e-3

    def test_already_knocked(self):
        out = bs.barrier_price(
            self.S, self.K, 95.0, self.r, self.q, self.T, self.sig,
            "up-and-out", True,
        )
        inn = bs.barrier_price(
            self.S, self.K, 95.0, self.r, self.q, self.T, self.sig,
            "up-and-in", True,
        )
        vanilla = bs.price(self.S, self.K, self.r, self.q, self.T, self.sig, True)
        assert float(out) == 0.0
        assert abs(float(inn) - float(vanilla)) < 1e-12

    def test_broadcasts(self):
        Bv = jnp.array([110.0, 120.0, 130.0])
        px = bs.barrier_price(
            self.S, self.K, Bv, self.r, self.q, self.T, self.sig,
            "up-and-out", True,
        )
        assert px.shape == (3,)
        # a farther knock-out barrier is worth more
        assert bool(jnp.all(jnp.diff(px) > 0))


class TestBarrierPDE:
    """BS small-vol-of-vol limit: Heston(sigma->0, v pinned at v0) must
    reproduce the Reiner-Rubinstein price for every barrier type."""

    V0 = 0.0625  # 25% vol

    def _params(self, **kw):
        base = dict(
            kappa=5.0, theta=self.V0, sigma=0.01, rho=0.0, v0=self.V0,
            r=0.05, q=0.02, T=1.0, K=100.0, is_call=True,
            n_spot=150, n_vol=50, n_time=150, v_max=0.5,
        )
        base.update(kw)
        return HestonPDEParams(**base)

    @pytest.mark.parametrize("bt", ALL_TYPES)
    def test_bs_limit_matches_analytic(self, bt):
        B = 125.0 if bt.startswith("up") else 85.0
        res = solve_barrier(self._params(), 100.0, B, bt)
        ana = bs.barrier_price(100.0, 100.0, B, 0.05, 0.02, 1.0, 0.25, bt, True)
        assert float(res.price) == pytest.approx(float(ana), rel=2e-2, abs=2e-2)

    def test_knocked_spot(self):
        res = solve_barrier(self._params(), 130.0, 125.0, "up-and-out")
        assert float(res.price) == 0.0
        res_in = solve_barrier(self._params(), 130.0, 125.0, "up-and-in")
        van = heston_adi.solve(self._params(), 130.0)
        assert float(res_in.price) == pytest.approx(float(van.price), rel=1e-12)

    def test_rebate_monotone(self):
        p = self._params()
        no_reb = solve_barrier(p, 100.0, 120.0, "up-and-out", rebate=0.0)
        reb = solve_barrier(p, 100.0, 120.0, "up-and-out", rebate=3.0)
        # a knock-out with a rebate is worth more, by less than the rebate
        assert float(reb.price) > float(no_reb.price)
        assert float(reb.price) < float(no_reb.price) + 3.0

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            solve_barrier(self._params(), 100.0, 120.0, "sideways-and-out")
        with pytest.raises(ValueError):
            solve_barrier(
                self._params(american=True), 100.0, 120.0, "up-and-out"
            )
        with pytest.raises(ValueError):
            solve_barrier(self._params(), 100.0, 120.0, "up-and-in", rebate=1.0)


class TestUpwindRegression:
    def test_vanilla_adi_convection_dominated(self):
        """Small vol-of-vol + fast mean reversion: central differencing of
        the v-convection violated the M-matrix property and produced a
        NEGATIVE ATM call price (-0.94 on a 200x60x200 grid) before the
        per-node upwind blend in heston_adi._a2_diags."""
        v0 = 0.0625
        p = HestonPDEParams(
            kappa=5.0, theta=v0, sigma=0.01, rho=0.0, v0=v0,
            r=0.05, q=0.02, T=1.0, K=100.0, is_call=True,
            n_spot=150, n_vol=50, n_time=150, v_max=0.5,
        )
        got = float(heston_adi.solve(p, 100.0).price)
        want = float(bs.price(100.0, 100.0, 0.05, 0.02, 1.0, 0.25, True))
        assert got == pytest.approx(want, rel=5e-3)


class TestBridgeMC:
    HP = HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)

    def test_survival_field(self):
        key = jax.random.PRNGKey(0)
        plain = heston_mc.simulate_qe(
            self.HP, 100.0, 1.0, key, n_steps=8, n_paths=256
        )
        assert plain.survival is None
        bar = heston_mc.simulate_qe(
            self.HP, 100.0, 1.0, key, n_steps=8, n_paths=256,
            barrier=120.0, barrier_direction="up",
        )
        assert bar.survival is not None
        assert bool(jnp.all((bar.survival >= 0) & (bar.survival <= 1)))
        # a skeleton that crossed the barrier has survival exactly 0
        crossed = bar.s_max >= 120.0
        assert bool(jnp.all(jnp.where(crossed, bar.survival == 0.0, True)))

    def test_bridge_exact_in_bs_limit(self):
        """With vol-of-vol ~0 the Brownian bridge is the EXACT conditional
        law, so the corrected estimator must be unbiased at ANY step count —
        the sharpest implementation check there is."""
        v0 = 0.0625
        hp = HestonParams(kappa=5.0, theta=v0, sigma=0.01, rho=0.0, v0=v0)
        ana = float(
            bs.barrier_price(
                100.0, 100.0, 125.0, 0.05, 0.02, 1.0, 0.25, "up-and-out", True
            )
        )
        corr, se = heston_mc.price_barrier_mc(
            hp, 100.0, 125.0, 1.0, 100.0, jax.random.PRNGKey(1),
            rate=0.05, dividend=0.02, n_steps=8, n_paths=100_000,
            continuity_correction=True,
        )
        assert abs(float(corr) - ana) < max(4.0 * float(se), 0.02)

    def test_corrected_matches_pde(self):
        """Full Heston (vol-of-vol 0.3, rho -0.7): the bridge removes most
        of the discrete-monitoring bias at 32 steps; the residual is the
        stochastic-vol bridge error, which vanishes with n_steps (measured:
        2.137 @ 32, 2.118 @ 64, 2.052 @ 256 vs PDE 2.007)."""
        pde = HestonPDEParams(
            kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04,
            r=0.05, q=0.0, T=1.0, K=100.0, is_call=True,
            n_spot=200, n_vol=60, n_time=200,
        )
        truth = float(solve_barrier(pde, 100.0, 120.0, "up-and-out").price)
        key = jax.random.PRNGKey(7)
        corr, se = heston_mc.price_barrier_mc(
            self.HP, 100.0, 120.0, 1.0, 100.0, key, rate=0.05,
            n_steps=32, n_paths=100_000, continuity_correction=True,
        )
        disc, _ = heston_mc.price_barrier_mc(
            self.HP, 100.0, 120.0, 1.0, 100.0, key, rate=0.05,
            n_steps=32, n_paths=100_000,
        )
        assert abs(float(corr) - truth) < 0.2
        assert abs(float(corr) - truth) < 0.45 * abs(float(disc) - truth)

    def test_in_out_parity_exact(self):
        key = jax.random.PRNGKey(3)
        kw = dict(rate=0.05, n_steps=16, n_paths=20_000,
                  continuity_correction=True)
        pin, _ = heston_mc.price_barrier_mc(
            self.HP, 100.0, 120.0, 1.0, 100.0, key,
            barrier_type="up-and-in", **kw,
        )
        pout, _ = heston_mc.price_barrier_mc(
            self.HP, 100.0, 120.0, 1.0, 100.0, key,
            barrier_type="up-and-out", **kw,
        )
        pv, _ = heston_mc.price_european_mc(
            self.HP, 100.0, 1.0, 100.0, key, rate=0.05,
            n_steps=16, n_paths=20_000, control_variate=False,
        )
        assert float(pin) + float(pout) == pytest.approx(float(pv), abs=1e-9)

    def test_down_barrier_direction(self):
        key = jax.random.PRNGKey(11)
        corr, se = heston_mc.price_barrier_mc(
            self.HP, 100.0, 85.0, 1.0, 100.0, key, rate=0.05,
            barrier_type="down-and-out", n_steps=32, n_paths=50_000,
            continuity_correction=True,
        )
        disc, _ = heston_mc.price_barrier_mc(
            self.HP, 100.0, 85.0, 1.0, 100.0, key, rate=0.05,
            barrier_type="down-and-out", n_steps=32, n_paths=50_000,
        )
        # continuous knock-out is strictly cheaper than discrete
        assert float(corr) < float(disc)
        assert float(corr) > 0.0

    def test_sobol_bridge_composes(self):
        key = jax.random.PRNGKey(5)
        px, se = heston_mc.price_barrier_mc(
            self.HP, 100.0, 120.0, 1.0, 100.0, key, rate=0.05,
            n_steps=16, n_paths=16_384, antithetic=False, sampler="sobol",
            n_replicates=4, continuity_correction=True,
        )
        assert 1.0 < float(px) < 3.5
        assert float(se) < 0.1

    def test_rejects_foreign_simulator(self):
        with pytest.raises(ValueError):
            heston_mc.price_barrier_mc(
                self.HP, 100.0, 120.0, 1.0, 100.0, jax.random.PRNGKey(0),
                simulate_fn=lambda *a, **k: None,
                continuity_correction=True,
            )
