"""Communication accounting of the sharded programs (parallel/comm_audit).

The multi-chip scaling claim this framework makes — per-step collective
count independent of mesh size, payload per device shrinking with it — is a
compile-time property, so it is asserted here from optimized HLO on the
8-device virtual mesh.  The reference has no analog (its scaling unit is a
REST/DB-coupled service replica); this is the audit of the XLA-collective
data plane that replaces it (SURVEY.md section 2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.parallel.comm_audit import audit_table, collective_counts


class TestMeshSizeInvariance:
    def test_cheap_programs_counts_invariant(self):
        """Partitioned Thomas and the sharded LM step: identical collective
        instruction counts at 2 and 8 devices (fast compiles)."""
        from jax.sharding import Mesh

        from pde_tpu.parallel.dist_tridiag import dist_tridiagonal_solve
        from pde_tpu.parallel.mesh import make_mesh, sharded_calibration_step

        def thomas_counts(k):
            gm = Mesh(np.asarray(jax.devices()[:k]), ("grid",))
            n = 16 * k
            return collective_counts(
                lambda: dist_tridiagonal_solve(
                    jnp.full((n - 1,), -1.0), jnp.full((n,), 4.0),
                    jnp.full((n - 1,), -1.0),
                    jnp.arange(n, dtype=jnp.float32), gm,
                )
            )

        c2, c8 = thomas_counts(2), thomas_counts(8)
        assert c2 == c8
        # Wang's algorithm: ONE interface all-gather, nothing else
        assert c2["all-gather"] == 1
        assert c2["collective-permute"] == 0
        assert c2["all-to-all"] == 0

        def lm_counts(k):
            cm = make_mesh(k, shape=(1, k))
            lo = jnp.array([0.1, 0.01, 0.01, -0.99, 0.01])
            hi = jnp.array([10.0, 1.0, 2.0, 0.99, 1.0])
            step = sharded_calibration_step(cm, lo, hi)
            U, Q = 1, 8 * k
            return collective_counts(
                step,
                jnp.tile(jnp.array([1.0, 0.09, 0.5, -0.2, 0.09]), (U, 1)),
                jnp.tile(jnp.linspace(90.0, 110.0, Q), (U, 1)),
                jnp.full((U, Q), 0.5), jnp.full((U, Q), 5.0),
                jnp.full((U,), 1e-3), 100.0, 0.05, 0.0,
            )

        l2, l8 = lm_counts(2), lm_counts(8)
        assert l2 == l8
        # quote-axis contractions reduce; no permutes/gathers should appear
        assert l2["all-reduce"] >= 1
        assert l2["collective-permute"] == 0

    @pytest.mark.slow
    def test_full_audit_table_invariant(self):
        """All the sharded programs keep their collective instruction
        counts constant across 2/4/8-device meshes (the PDE marches compile
        a full scan each, hence the slow tier)."""
        table = audit_table(mesh_sizes=(2, 4, 8))
        assert set(table) == {
            "sharded_bs_solve", "sharded_heston_solve",
            "dist_tridiagonal_solve", "sharded_calibration_step",
            "price_american_lsm_sharded", "calibrate_leverage_sharded",
        }
        for prog, by_k in table.items():
            counts = list(by_k.values())
            assert all(c == counts[0] for c in counts[1:]), (prog, by_k)
            total = sum(counts[0].values())
            # a handful of collectives per program, not O(devices)
            assert 1 <= total <= 8, (prog, counts[0])

    def test_lsm_moment_reductions_fuse(self):
        """The LSM backward step issues 6+ logical psums (ITM count, means,
        variances, Gram, rhs, plus the final moment reduction) — XLA must
        fuse them into a handful of all-reduce instructions, and the count
        must not scale with the mesh."""
        from pde_tpu.models.heston import HestonParams
        from pde_tpu.parallel.mc import price_american_lsm_sharded
        from pde_tpu.parallel.mesh import make_mesh

        def counts(k):
            dm = make_mesh(k, axis_names=("dp",), shape=(k,))
            return collective_counts(
                lambda: price_american_lsm_sharded(
                    HestonParams(2.0, 0.04, 0.3, -0.7, 0.04),
                    100.0, 0.5, 100.0, jax.random.PRNGKey(0), dm,
                    rate=0.05, n_steps=4, n_paths=128 * k,
                )[0]
            )

        c2, c8 = counts(2), counts(8)
        assert c2 == c8
        assert c2["collective-permute"] == 0
        assert 1 <= c2["all-reduce"] <= 8, c2


class TestSLVCalibrationComm:
    def test_slv_particle_calibration_counts_invariant(self):
        """The distributed particle method compiles to THREE all-reduce
        instructions total (the per-step bin-statistics psum lives inside
        the scan body and is counted once in HLO; the other two are the
        validation price/stderr moments) — no gathers, no permutes, and
        the counts are mesh-size invariant."""
        from pde_tpu.models.heston import HestonParams
        from pde_tpu.parallel.mc import calibrate_leverage_sharded
        from pde_tpu.parallel.mesh import make_mesh

        def counts(k):
            dm = make_mesh(k, axis_names=("dp",), shape=(k,))
            return collective_counts(
                lambda: calibrate_leverage_sharded(
                    HestonParams(2.0, 0.04, 0.3, -0.7, 0.04),
                    lambda s, t: jnp.full_like(s, 0.2), 100.0, 0.5,
                    jax.random.PRNGKey(1), dm,
                    rate=0.05, n_steps=4, n_paths=128 * k, n_bins=9,
                )[1]
            )

        c2, c8 = counts(2), counts(8)
        assert c2 == c8
        assert c2["all-reduce"] == 3
        assert c2["all-gather"] == 0
        assert c2["collective-permute"] == 0
        assert c2["all-to-all"] == 0
