"""Swept-volume SDF tests against geometric oracles.

A Ball robot following a trajectory sweeps a tube around the path: the swept
SDF equals (min distance from query to the path) − radius, computable by
dense sampling.  Also checks warm-start consistency, t* accuracy, and the
envelope-theorem gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.core import minco
from isdf_tpu.core.flatness import FlatParams
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep import sweep_sdf, sweep_sdf_warm, sdf_at_time
from isdf_tpu.sweep.sweep_sdf import sweep_sdf_dot
import pytest

pytestmark = pytest.mark.smoke


def make_traj(key=0, N=4, spread=4.0):
    rng = np.random.default_rng(key)
    q = jnp.array(rng.normal(size=(N - 1, 3)) * spread * 0.3 + np.linspace(1, 4, N - 1)[:, None] * np.array([1.0, 0.3, 0.1]))
    T = jnp.array(rng.uniform(1.0, 2.0, size=N))
    head = jnp.zeros((3, 3))
    tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([5.0, 2.0, 1.0]))
    c = minco.solve(q, T, head, tail)
    return PolyTraj(T, c)


PARAMS = FlatParams()


class TestSweepSDF:
    def setup_method(self):
        self.traj = make_traj()
        self.ball = make_shape("Ball")

    def _oracle(self, pts, n=20001):
        """Dense-sample min over time of ball SDF (rotation-invariant)."""
        ts = jnp.linspace(0.0, self.traj.total_duration, n)
        xs = jax.vmap(self.traj.pos)(ts)
        d = np.linalg.norm(
            np.asarray(pts)[:, None, :] - np.asarray(xs)[None, :, :], axis=-1
        )
        return d.min(axis=1) - 1.0

    def test_matches_dense_oracle(self):
        rng = np.random.default_rng(0)
        pts = jnp.array(rng.normal(size=(32, 3)) * 3.0 + np.array([2.5, 1.0, 0.5]))
        sdf, t_star, grad = sweep_sdf(self.ball, self.traj, PARAMS, pts)
        want = self._oracle(pts)
        np.testing.assert_allclose(np.asarray(sdf), want, atol=2e-4)

    def test_warm_start_matches_cold(self):
        rng = np.random.default_rng(1)
        pts = jnp.array(rng.normal(size=(16, 3)) * 2.0 + np.array([2.5, 1.0, 0.5]))
        sdf_c, t_c, _ = sweep_sdf(self.ball, self.traj, PARAMS, pts)
        # warm start from slightly perturbed t*
        t_seed = t_c + jnp.array(rng.normal(size=16) * 0.05)
        sdf_w, t_w, _ = sweep_sdf_warm(self.ball, self.traj, PARAMS, pts, t_seed)
        np.testing.assert_allclose(np.asarray(sdf_w), np.asarray(sdf_c), atol=5e-5)

    def test_t_star_is_minimum(self):
        rng = np.random.default_rng(2)
        pts = jnp.array(rng.normal(size=(8, 3)) * 2.0 + np.array([2.5, 1.0, 0.5]))
        sdf, t_star, _ = sweep_sdf(self.ball, self.traj, PARAMS, pts)
        # dSDF/dt ≈ 0 at interior minima (or t* at boundary)
        dot = np.asarray(sweep_sdf_dot(self.ball, self.traj, PARAMS, pts, t_star))
        total = float(self.traj.total_duration)
        interior = (np.asarray(t_star) > 1e-3) & (np.asarray(t_star) < total - 1e-3)
        assert np.all(np.abs(dot[interior]) < 5e-2)

    def test_envelope_gradient(self):
        """∂SV/∂p via frozen-t* evaluation matches finite differences of the
        full minimization."""
        p0 = jnp.array([[2.0, 3.0, 0.7]])
        _, t_star, _ = sweep_sdf(self.ball, self.traj, PARAMS, p0)

        def sv_frozen(p):
            return sdf_at_time(self.ball, self.traj, PARAMS, p, t_star)[0]

        g = jax.grad(lambda p: sv_frozen(p))(p0)[0]
        eps = 1e-4
        for ax in range(3):
            pp = p0.at[0, ax].add(eps)
            pm = p0.at[0, ax].add(-eps)
            fp = float(sweep_sdf(self.ball, self.traj, PARAMS, pp)[0][0])
            fm = float(sweep_sdf(self.ball, self.traj, PARAMS, pm)[0][0])
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(float(g[ax]), fd, atol=1e-3)

    def test_nonspherical_shape_runs(self):
        shape = make_shape("CappedCone")
        rng = np.random.default_rng(3)
        pts = jnp.array(rng.normal(size=(8, 3)) * 2.0 + np.array([2.5, 1.0, 0.5]))
        sdf, t_star, grad = sweep_sdf(shape, self.traj, PARAMS, pts)
        assert np.all(np.isfinite(np.asarray(sdf)))
        assert np.all(np.isfinite(np.asarray(grad)))
        # swept SDF must lower-bound any single-time SDF
        d0 = np.asarray(sdf_at_time(shape, self.traj, PARAMS, pts, jnp.full(8, 1.0)))
        assert np.all(np.asarray(sdf) <= d0 + 1e-5)
