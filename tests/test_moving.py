"""Moving obstacles (ref moving_obstacles.cpp) + closed-loop replanning."""

import numpy as np
import jax
import jax.numpy as jnp

from isdf_tpu.config import Config
from isdf_tpu.plan import PlannerManager, fly_closed_loop
from isdf_tpu.world import MovingObstacle, predict_traj, compose_map
from isdf_tpu.world.maps_gen import gene_wall
import pytest

pytestmark = pytest.mark.slow


class TestMovingObstacle:
    def test_velocity_decays_and_caps(self):
        ob = MovingObstacle(pos=np.array([0.0, 0.0]))
        for _ in range(200):
            ob.update(0.1, acc=50.0, yaw_rate=0.0)
        from isdf_tpu.world.moving import MAX_VEL
        assert np.linalg.norm(ob.vel) <= MAX_VEL + 1e-9

    def test_predict_matches_replayed_update(self):
        ob = MovingObstacle(pos=np.array([1.0, 2.0]),
                            vel=np.array([0.5, -0.2]), yaw=0.3)
        p_pred, v_pred = ob.predict(acc=1.0, yaw_rate=0.2, t_ahead=1.0,
                                    step=0.1)
        twin = MovingObstacle(pos=ob.pos.copy(), vel=ob.vel.copy(),
                              yaw=ob.yaw)
        for _ in range(10):
            twin.update(0.1, acc=1.0, yaw_rate=0.2)
        np.testing.assert_allclose(p_pred, twin.pos, atol=1e-9)
        np.testing.assert_allclose(v_pred, twin.vel, atol=1e-9)

    def test_predict_traj_interpolates_prediction(self):
        ob = MovingObstacle(pos=np.array([0.0, 0.0]),
                            vel=np.array([1.0, 0.0]))
        traj = predict_traj(ob, acc=0.5, yaw_rate=0.0, z=1.5)
        assert float(traj.total_duration) == 5.0
        p0 = np.asarray(traj.pos(jnp.asarray(0.0)))
        np.testing.assert_allclose(p0, [0.0, 0.0, 1.5], atol=1e-6)
        # midpoint waypoint should match the dynamics prediction
        p_mid, _ = ob.predict(0.5, 0.0, 2.5)
        p_traj = np.asarray(traj.pos(jnp.asarray(2.5)))
        np.testing.assert_allclose(p_traj[:2], p_mid, atol=1e-6)

    def test_points_cylinder(self):
        ob = MovingObstacle(pos=np.array([3.0, 4.0]), radius=0.5, height=2.0)
        pts = ob.points(res=0.2)
        r = np.linalg.norm(pts[:, :2] - np.array([3.0, 4.0]), axis=1)
        assert r.max() <= 0.5 + 1e-9
        assert pts[:, 2].min() >= 0.0 and pts[:, 2].max() <= 2.0


class TestClosedLoop:
    def test_flies_through_moving_field(self):
        conf = Config(
            mapBound=(0.0, 14.0, 0.0, 10.0, 0.0, 4.0),
            occupancy_resolution=0.5, kernel_size=3, safety_hor=0.3,
            integralIntervs=8, sweep_coarse_samples=16,
            sweep_refine_rounds=6, max_obstacle_points=512,
            vmax=4.0, omgmax=6.0, thetamax=1.2, mem_size=8,
        )
        pm = PlannerManager(conf, shape_name="Ball")
        static = gene_wall(6.0, 0.0, 0.6, 3.5, 3.0, res=0.25)
        obstacles = [MovingObstacle(pos=np.array([8.0, 7.0]), radius=0.4,
                                    height=3.0)]

        def controls(i, t, rng):
            return 0.6, 0.4  # deterministic gentle arc

        log = fly_closed_loop(
            pm, static, obstacles,
            start=np.array([1.0, 5.0, 2.0]), goal=np.array([13.0, 5.0, 2.0]),
            obstacle_controls=controls, replan_dt=1.5, max_time=20.0,
            max_iters=12, goal_tol=1.0,
        )
        assert log.reached, (
            f"never reached goal; flew {len(log.times)} ticks, "
            f"last pos {log.positions[-1] if log.positions else None}")
        assert log.min_sdf > -conf.occupancy_resolution, log.min_sdf
        assert len(log.replan_wall_s) >= 2  # actually replanned
