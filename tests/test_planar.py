"""SE(2) planar planning mode: the trajectory's 3rd MINCO dimension is the
yaw ψ, poses are ((x, y, z_ref), Rz(ψ)) — the paper's 2-D experiment setup
(circle robot with decoupled rotation; polygon with yaw optimization)."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.core import minco, timemap
from isdf_tpu.core.flatness import PlanarPose, pose_of
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.opt import backend
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep import sweep_sdf, sdf_at_time
import pytest

pytestmark = pytest.mark.demo


class TestPlanarPose:
    def test_pose_of_rotation(self):
        p = PlanarPose(z_ref=1.0)
        pos = jnp.array([2.0, 3.0, np.pi / 2])  # x, y, ψ
        pos3, R = pose_of(pos, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), p)
        np.testing.assert_allclose(np.asarray(pos3), [2.0, 3.0, 1.0], atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(R), [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
        )

    def test_sweep_with_planar_rotation(self):
        """A bar spinning in place sweeps a disk: the swept SDF at radius r
        from the center must be ≈ r − half-length."""
        conf = Config(box_x=2.0, box_y=0.2, box_z=0.2)
        shape = make_shape("Box", conf)
        p = PlanarPose(z_ref=0.0)
        # trajectory: stay at origin, ψ goes 0 → 2π
        q = jnp.array([[0.0, 0.0, np.pi]])
        T = jnp.array([2.0, 2.0])
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([0.0, 0.0, 2 * np.pi]))
        traj = PolyTraj(T, minco.solve(q, T, head, tail))
        pts = jnp.array(
            [[1.5, 0.0, 0.0], [0.0, 1.5, 0.0], [-1.0, 1.0, 0.0],
             [2.5, 0.0, 0.0], [0.0, -3.0, 0.0]]
        )
        sdf = np.asarray(sweep_sdf(shape, traj, p, pts)[0])
        # inside the swept disk (r < 2): the bar passes through the point,
        # min SDF = −(bar half-width) = −0.2; outside: positive, ≈ r − 2
        np.testing.assert_allclose(sdf[:3], -0.2, atol=0.05)
        np.testing.assert_allclose(sdf[3], 0.5, atol=0.1)
        np.testing.assert_allclose(sdf[4], 1.0, atol=0.1)

    def test_planar_backend_rotates_through_slit(self):
        """A long bar must rotate (yaw) to slide through a narrow corridor
        gap — ψ is optimized jointly with (x, y)."""
        conf = Config(
            box_x=0.2, box_y=1.4, box_z=0.2,
            integralIntervs=16, sweep_coarse_samples=48, sweep_refine_rounds=8,
            vmax=5.0, omgmax=3.0, thetamax=1e3, safety_hor=0.3,
            weight_p=8000.0,
        )
        shape = make_shape("Box", conf)
        p = PlanarPose(z_ref=0.0)
        # obstacle points: two wall segments at x=3 with a gap y∈(−1, 1)
        ys = np.concatenate([np.arange(1.0, 3.0, 0.25), -np.arange(1.0, 3.0, 0.25)])
        pts = jnp.asarray(np.stack([np.full_like(ys, 3.0), ys, np.zeros_like(ys)], -1))
        mask = jnp.ones(len(ys), bool)
        # straight line through the gap, bar initially aligned with x
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([6.0, 0.0, 0.0]))
        # warm start with a slight yaw to break the symmetric saddle (the
        # SE(3) front end provides rotated waypoints in the full pipeline)
        q0 = jnp.array([[2.0, 0.0, 0.3], [4.0, 0.0, 0.3]])
        T0 = jnp.full(3, 2.0)
        traj, res = backend.optimize(
            shape, conf, head, tail, q0, T0, pts, mask,
            max_iters=80, params=p,
        )
        sdf, _, _ = sweep_sdf(shape, traj, p, pts)
        assert float(jnp.min(sdf)) > 0.0
        # the bar is 2.8 long in y and the gap 2 wide: crossing requires yaw ≠ 0
        ts = jnp.linspace(0.0, traj.total_duration, 300)
        pos = np.asarray(jax.vmap(traj.pos)(ts))
        near = np.abs(pos[:, 0] - 3.0) < 0.5
        assert near.any()
        yaw_near = np.abs(np.mod(pos[near, 2] + np.pi, 2 * np.pi) - np.pi)
        assert yaw_near.max() > 0.3, yaw_near.max()
