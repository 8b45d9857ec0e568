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
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-8,
                                   atol=1e-10)

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
