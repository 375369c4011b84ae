"""Golden parity: PDE solvers vs the reference C++ engines.

Fixtures in tests/golden/reference_pde_values.json are captured by
tests/golden/make_golden_pde.cpp, which compiles the READ-ONLY reference
headers (src/cpp/solvers/{black_scholes_pde,heston_pde,hjb_solver}.hpp)
against the Eigen bundled with this image's tensorflow wheel.

Two layers of assertion:

1. **Exact-twin parity** — with ``reference_compat=True`` (BS/HJB) or the
   reference-twin solver (`solvers/heston_adi_ref.py`), this build reproduces
   the reference outputs to float64 round-off, defects included.
2. **Defect documentation** — the *default* solvers deviate from the
   reference exactly where the reference is wrong (boundary discounting,
   wrong-segment readout, ~6% ADI boundary bias), and land closer to the
   semi-analytic truth.  See docs/parity_map.md "Reference defects".
"""

import json
import os

import numpy as np
import pytest

from pde_tpu.solvers import bs_pde, heston_adi, heston_adi_ref, hjb

GOLD_PATH = os.path.join(os.path.dirname(__file__), "golden",
                         "reference_pde_values.json")
with open(GOLD_PATH) as fh:
    GOLD = json.load(fh)


BS_COMPAT = bs_pde.BSPDEParams(
    sigma=0.2, r=0.05, q=0.02, T=1.0, K=100.0, is_call=True,
    reference_compat=True,
)


class TestBSPDEGolden:
    def test_euro_call_price_and_greeks(self):
        r = bs_pde.solve(BS_COMPAT, 100.0)
        assert float(r.price) == pytest.approx(GOLD["bs_pde_euro_call_price"], abs=1e-10)
        assert float(r.delta) == pytest.approx(GOLD["bs_pde_euro_call_delta"], abs=1e-10)
        assert float(r.gamma) == pytest.approx(GOLD["bs_pde_euro_call_gamma"], abs=1e-10)
        assert float(r.theta) == pytest.approx(GOLD["bs_pde_euro_call_theta"], abs=1e-10)

    def test_euro_put_price(self):
        r = bs_pde.solve(BS_COMPAT._replace(is_call=False), 100.0)
        assert float(r.price) == pytest.approx(GOLD["bs_pde_euro_put_price"], abs=1e-10)

    def test_american_put(self):
        r = bs_pde.solve(
            BS_COMPAT._replace(is_call=False, american=True, r=0.08), 100.0)
        assert float(r.price) == pytest.approx(GOLD["bs_pde_amer_put_price"], abs=1e-10)
        assert bool(r.early_exercise_optimal) == bool(GOLD["bs_pde_amer_put_early"])

    def test_off_strike_spots(self):
        p = BS_COMPAT._replace(is_call=False)
        assert float(bs_pde.solve(p, 90.0).price) == pytest.approx(
            GOLD["bs_pde_euro_put_S90"], abs=1e-10)
        assert float(bs_pde.solve(p, 115.0).price) == pytest.approx(
            GOLD["bs_pde_euro_put_S115"], abs=1e-10)

    def test_default_mode_beats_reference_vs_closed_form(self):
        """The corrected boundaries + bracketing readout land nearer the
        closed form than the reference does (defect documentation)."""
        from pde_tpu.models import black_scholes as bs

        truth = float(bs.price(100.0, 100.0, 0.05, 0.02, 1.0, 0.2, True))
        ours = float(bs_pde.solve(BS_COMPAT._replace(reference_compat=False), 100.0).price)
        ref = GOLD["bs_pde_euro_call_price"]
        assert abs(ours - truth) < 0.01
        assert abs(ref - truth) > 0.015  # the reference's readout defect
        assert abs(ours - truth) < abs(ref - truth) / 2


HESTON_REF = heston_adi.HestonPDEParams(
    kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04,
    r=0.05, q=0.0, T=1.0, K=100.0, is_call=True,
)


class TestHestonADIGolden:
    def test_twin_euro_call(self):
        r = heston_adi_ref.solve_reference(HESTON_REF, 100.0)
        assert float(r.price) == pytest.approx(GOLD["heston_pde_euro_call_price"], abs=1e-10)
        assert float(r.delta) == pytest.approx(GOLD["heston_pde_euro_call_delta"], abs=1e-10)
        assert float(r.gamma) == pytest.approx(GOLD["heston_pde_euro_call_gamma"], abs=1e-10)
        assert float(r.vega) == pytest.approx(GOLD["heston_pde_euro_call_vega"], abs=1e-9)

    def test_twin_euro_put(self):
        r = heston_adi_ref.solve_reference(HESTON_REF._replace(is_call=False), 100.0)
        assert float(r.price) == pytest.approx(GOLD["heston_pde_euro_put_price"], abs=1e-10)

    def test_twin_american_put(self):
        r = heston_adi_ref.solve_reference(
            HESTON_REF._replace(is_call=False, american=True), 100.0)
        assert float(r.price) == pytest.approx(GOLD["heston_pde_amer_put_price"], abs=1e-10)

    def test_twin_second_param_set(self):
        p2 = heston_adi.HestonPDEParams(
            kappa=1.5, theta=0.09, sigma=0.5, rho=-0.5, v0=0.06,
            r=0.03, q=0.01, T=0.5, K=110.0, is_call=True)
        r = heston_adi_ref.solve_reference(p2, 100.0)
        assert float(r.price) == pytest.approx(GOLD["heston_pde2_euro_call_price"], abs=1e-10)

    def test_default_solver_beats_reference_vs_semi_analytic(self):
        """Douglas + In 't Hout-Foulon lands ~30x closer to the converged
        Carr-Madan price than the reference scheme (call: -5.9% reference
        bias vs ~+0.2% here; put: +18% reference bias)."""
        from pde_tpu.models import heston as hm

        params = hm.HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)
        truth_call = float(hm.price_accurate(params, 100.0, 1.0, 100.0, 0.05, 0.0, True))
        truth_put = float(hm.price_accurate(params, 100.0, 1.0, 100.0, 0.05, 0.0, False))

        ours = float(heston_adi.solve(HESTON_REF, 100.0).price)
        assert abs(ours - truth_call) / truth_call < 5e-3
        assert abs(GOLD["heston_pde_euro_call_price"] - truth_call) / truth_call > 0.05
        assert abs(GOLD["heston_pde_euro_put_price"] - truth_put) / truth_put > 0.15


class TestHJBGolden:
    def test_all_boundaries(self):
        b = hjb.solve_all_boundaries(hjb.HJBParams(reference_compat=True))
        for field, key in [
            ("entry_long", "hjb_entry_long"), ("entry_short", "hjb_entry_short"),
            ("exit_long", "hjb_exit_long"), ("exit_short", "hjb_exit_short"),
            ("stop_loss_long", "hjb_stop_loss_long"),
            ("stop_loss_short", "hjb_stop_loss_short"),
        ]:
            assert getattr(b, field) == pytest.approx(GOLD[key], abs=1e-12), field

    def test_value_function_probes(self):
        res = hjb.solve(hjb.HJBParams(reference_compat=True))
        assert res.value_at(0.0) == pytest.approx(GOLD["hjb_entry_long_value_at_0"], abs=1e-12)
        assert res.value_at(-0.2) == pytest.approx(GOLD["hjb_entry_long_value_at_m02"], abs=1e-12)

    def test_leung_li_config(self):
        b = hjb.solve_all_boundaries(hjb.HJBParams(
            mu=2.0, sigma=0.15, c_entry=0.005, c_exit=0.005, reference_compat=True))
        assert b.entry_long == pytest.approx(GOLD["hjb2_entry_long"], abs=1e-12)
        assert b.entry_short == pytest.approx(GOLD["hjb2_entry_short"], abs=1e-12)

    def test_compat_off_differs_only_by_boundary_cells(self):
        """Without compat the full band is kept; boundaries may move by at
        most one grid cell on this config."""
        p = hjb.HJBParams()
        dx = (p.x_max - p.x_min) / (p.n_space - 1)
        b = hjb.solve_all_boundaries(p)
        assert abs(b.entry_long - GOLD["hjb_entry_long"]) <= dx + 1e-12
        assert abs(b.entry_short - GOLD["hjb_entry_short"]) <= dx + 1e-12
