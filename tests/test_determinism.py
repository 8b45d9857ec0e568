"""Jit-determinism tests — the functional replacement for the reference's
thread-safety-by-convention story (SURVEY.md §5: omp critical sections,
volatile flags, backwardthreadsafe).  Two identical solves must agree
bitwise; checkpoint/resume round-trips."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl, timemap
from isdf_tpu.opt import backend, checkpoint
from isdf_tpu.shapes import make_shape


def _setup():
    conf = Config(integralIntervs=8, sweep_coarse_samples=16,
                  sweep_refine_rounds=6, vmax=5.0, omgmax=5.0, thetamax=1.5,
                  safety_hor=0.4)
    shape = make_shape("Ball")
    head = jnp.zeros((3, 3))
    tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([6.0, 0.0, 1.0]))
    q0 = jnp.array([[2.0, 0.0, 0.5], [4.0, 0.0, 0.5]])
    T0 = jnp.full(3, 2.0)
    pts = jnp.array([[3.0, 0.0, 0.5], [2.0, 0.3, 0.4]])
    mask = jnp.array([True, True])
    return conf, shape, head, tail, q0, T0, pts, mask


class TestDeterminism:
    def test_solve_bitwise_reproducible(self):
        conf, shape, head, tail, q0, T0, pts, mask = _setup()
        t1, r1 = backend.optimize(shape, conf, head, tail, q0, T0, pts, mask,
                                  max_iters=25)
        t2, r2 = backend.optimize(shape, conf, head, tail, q0, T0, pts, mask,
                                  max_iters=25)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        np.testing.assert_array_equal(np.asarray(t1.coeffs), np.asarray(t2.coeffs))

    def test_checkpoint_roundtrip(self):
        conf, shape, head, tail, q0, T0, pts, mask = _setup()
        traj, res = backend.optimize(shape, conf, head, tail, q0, T0, pts,
                                     mask, max_iters=10)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "solver.npz")
            checkpoint.save(p, res.x, res.aux, conf)
            x, t_star, fp = checkpoint.load(p)
            np.testing.assert_array_equal(x, np.asarray(res.x))
            np.testing.assert_array_equal(t_star, np.asarray(res.aux))
        # resume: continuing from the checkpoint equals continuing in-process
        x0 = jnp.asarray(x)
        params = fl.FlatParams.from_config(conf)
        w = backend.BackendWeights.from_config(conf)
        cg = backend.make_cost_fn(
            shape, params, w, head, tail, 3, pts, mask,
            integral_res=conf.integralIntervs,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
        f, g, t_new = cg(x0, jnp.asarray(t_star))
        assert np.isfinite(float(f))
