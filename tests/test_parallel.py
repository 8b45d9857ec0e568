"""Multi-device sharding tests on the 8-device virtual CPU mesh: batched
solves under (dp, sp) shardings produce the same results as single-device,
and the graft-entry dryrun executes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.config import Config
from isdf_tpu.parallel import batch as pb
from isdf_tpu.shapes import make_shape

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def conf():
    return Config(
        integralIntervs=4, sweep_coarse_samples=8, sweep_refine_rounds=3,
        mem_size=4, vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4,
    )


class TestBatchEngine:
    def test_eight_devices_visible(self):
        assert len(jax.devices()) == 8

    def test_sharded_matches_single(self, conf):
        shape = make_shape("Ball", conf)
        sb = pb.make_random_batch(conf, B=8, N=3, n_points=16, dtype=jnp.float64)
        # single-device result
        c1, T1, f1, i1 = pb.batched_solve(shape, conf, sb, max_iters=3)
        # sharded over (dp=4, sp=2)
        mesh = pb.make_mesh(8, sp=2)
        sbs = pb.shard_batch(sb, mesh)
        c2, T2, f2, i2 = pb.batched_solve(shape, conf, sbs, max_iters=3)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6, atol=1e-8)

    def test_batched_cost_grad_finite(self, conf):
        shape = make_shape("Ball", conf)
        sb = pb.make_random_batch(conf, B=4, N=3, n_points=16, dtype=jnp.float64)
        f, g = pb.batched_cost_and_grad(shape, conf, sb)
        assert np.isfinite(np.asarray(f)).all()
        assert np.isfinite(np.asarray(g)).all()


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge

        fn, args = ge.entry()
        f, g, t = jax.jit(fn)(*args)
        assert np.isfinite(float(f))
        assert np.isfinite(np.asarray(g)).all()

    def test_dryrun_multichip(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestChunkedSolve:
    def test_chunked_matches_monolithic(self, conf):
        shape = make_shape("Ball", conf)
        sb = pb.make_random_batch(conf, B=4, N=3, n_points=16, dtype=jnp.float64)
        c1, T1, f1, i1 = pb.batched_solve(shape, conf, sb, max_iters=6)
        c2, T2, f2, i2 = pb.batched_solve_chunked(shape, conf, sb,
                                                  max_iters=6, chunk=2)
        # lockstep scheduling: a chunk boundary resets the per-chunk loop
        # budget, which can reschedule one trial for a scenario mid-search
        # — endpoints agree to solver tolerance, not bitwise
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4,
                                   atol=1e-6)

    def test_audited_solve_fixes_aliased_violation(self, conf):
        """batched_solve_audited (the batched safety-audit twin of
        PlannerManager.plan step 6) must catch and fix a violation the
        solve-time sweep aliases over: the solve scans coarse_n=8 time
        samples, so a point whose SDF dip is narrow in time can be missed;
        the audit scans at 512 and seeds the re-solve's t* warm starts."""
        shape = make_shape("Ball", conf)
        sb = pb.make_random_batch(conf, B=4, N=3, n_points=16,
                                  dtype=jnp.float64)
        # place one obstacle point per scenario directly ON the straight
        # line mid-route — guaranteed violating at iteration 0 — and mask
        # off random points near the endpoints: head/tail are hard
        # constraints, so a point AT the goal is unfixable by any solver
        # (the real pipeline snaps goals to free space before solving,
        # plan/manager.py ESDF goal snapping)
        pts = np.asarray(sb.points).copy()
        goals = np.asarray(sb.tail)[:, :, 0]
        pts[:, 0, :] = 0.55 * goals
        d_goal = np.linalg.norm(pts - goals[:, None, :], axis=-1)
        d_start = np.linalg.norm(pts, axis=-1)
        mask = np.asarray(sb.mask) & (d_goal > 1.2) & (d_start > 1.2)
        sb = sb._replace(points=jnp.asarray(pts), mask=jnp.asarray(mask))
        c, T, f, i, audit = pb.batched_solve_audited(
            shape, conf, sb, max_iters=12, chunk=4, audit_coarse_n=512)
        assert np.isfinite(np.asarray(f)).all()
        assert len(audit["violations_per_round"]) >= 1
        # final audit must certify clearance (margin 0) for every scenario
        assert (audit["min_sdf"] > 0.0).all(), audit
        # and the audit loop must actually have re-solved at least once OR
        # found the first solve clean
        assert audit["violations_per_round"][-1] == 0, audit

    def test_audited_solve_injects_unseen_reserve_voxels(self, conf):
        """A violation on a voxel ABSENT from the solve set must be caught
        and fixed through the reserve pool (VERDICT r4 weak #6): the solve
        set contains only far-away clutter, the straight-line route is
        blocked only by reserve points the solver never saw.  The audit
        must detect the reserve violation, inject the grazing points into
        the extra slots, and the re-solve must clear them."""
        shape = make_shape("Ball", conf)
        sb = pb.make_random_batch(conf, B=2, N=3, n_points=8,
                                  dtype=jnp.float64)
        goals = np.asarray(sb.tail)[:, :, 0]
        # solve set: push every point far off-route (no constraint at all)
        pts = np.asarray(sb.points).copy()
        pts[:, :, :] = goals[:, None, :] + np.array([0.0, 8.0, 8.0])
        sb = sb._replace(points=jnp.asarray(pts))
        # reserve pool: a point ON the route per scenario + far filler
        R = 6
        rsv = np.tile((goals + np.array([0.0, 9.0, 9.0]))[:, None, :],
                      (1, R, 1))
        rsv[:, 0, :] = 0.5 * goals
        rsv = jnp.asarray(rsv)
        c, T, f, i, audit = pb.batched_solve_audited(
            shape, conf, sb, max_iters=12, chunk=4, audit_coarse_n=256,
            reserve_points=rsv, inject_budget=4)
        assert audit["violations_per_round"][0] > 0, (
            "route point must violate the first solve")
        assert audit["violations_per_round"][-1] == 0, audit
        # final min-SDF covers the reserve pool — the unseen voxel is now
        # certified clear
        assert (audit["min_sdf"] > 0.0).all(), audit

    def test_minimize_chunked_rosenbrock(self):
        from isdf_tpu.opt import lbfgs

        def cg(x, aux):
            f = lambda x: jnp.sum(
                100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2
            )
            v, g = jax.value_and_grad(f)(x)
            return v, g, aux

        calls = []
        res = lbfgs.minimize_chunked(
            cg, jnp.zeros(6), None, max_iters=400, chunk=50,
            callback=lambda r: calls.append(float(r.f)),
        )
        assert float(res.f) < 1e-9
        assert len(calls) >= 1
        assert calls == sorted(calls, reverse=True)  # monotone progress


@pytest.mark.slow
class TestMultiHost:
    def test_dryrun_multihost(self):
        """Two jax.distributed CPU processes; scenario axis spans processes
        (SURVEY §2.5 multi-host row; VERDICT r2 item 6)."""
        from __graft_entry__ import dryrun_multihost

        dryrun_multihost(2)
