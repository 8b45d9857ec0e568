"""End-to-end slice (SURVEY.md §7.2): map → A* → mid-end → back-end swept-SDF
refine → collision audit, through the PlannerManager API."""

import numpy as np
import jax.numpy as jnp
import pytest

from isdf_tpu.config import Config
from isdf_tpu.plan import PlannerManager, TrajServer
from isdf_tpu.plan.traj_server import sample_horizon
from isdf_tpu.world import maps_gen

pytestmark = pytest.mark.demo


@pytest.fixture(scope="module")
def planned():
    conf = Config(
        mapBound=(0.0, 12.0, 0.0, 12.0, 0.0, 6.0),
        occupancy_resolution=0.5,
        kernel_size=5,
        kernel_max_roll=0.0, kernel_max_pitch=0.0, kernel_ang_res=9.0,
        integralIntervs=16,
        sweep_coarse_samples=32, sweep_refine_rounds=10,
        max_obstacle_points=512,
        inittime=2.0,
        vmax=5.0, omgmax=5.0, thetamax=1.5,
        safety_hor=0.3,
        traj_parlength=2.0,
    )
    # a wall at x∈[5,6) with a 3×3 m window at y∈[4,7), z∈[1,4)
    wall = np.concatenate(
        [
            maps_gen.gene_wall(5.0, 0.0, 1.0, 4.0, 6.0, res=0.25),
            maps_gen.gene_wall(5.0, 7.0, 1.0, 5.0, 6.0, res=0.25),
            maps_gen.gene_wall(5.0, 4.0, 1.0, 3.0, 1.0, res=0.25),
            maps_gen.gene_wall(5.0, 4.0, 1.0, 3.0, 2.0, oz=4.0, res=0.25),
        ]
    )
    pm = PlannerManager(conf, shape_name="Ball")
    pm.set_map_points(wall)
    start = np.array([1.0, 5.0, 3.0])
    goal = np.array([10.5, 5.0, 3.0])
    res = pm.plan(start, goal, max_iters=60)
    return pm, res, start, goal


class TestEndToEnd:
    def test_plan_succeeds(self, planned):
        pm, res, start, goal = planned
        assert res.success
        assert res.metrics["parallel_points_num"] > 0

    def test_endpoints(self, planned):
        pm, res, start, goal = planned
        jp = np.asarray(res.traj.junction_positions())
        np.testing.assert_allclose(jp[0], start, atol=pm.conf.occupancy_resolution)
        np.testing.assert_allclose(jp[-1], goal, atol=pm.conf.occupancy_resolution)

    def test_no_collision(self, planned):
        pm, res, *_ = planned
        min_sdf = pm.audit_collision(res.traj)
        assert min_sdf > 0.0, f"swept volume intersects obstacles: {min_sdf}"

    def test_passes_window(self, planned):
        pm, res, *_ = planned
        import jax

        ts = jnp.linspace(0.0, res.traj.total_duration, 200)
        pos = np.asarray(jax.vmap(res.traj.pos)(ts))
        at_wall = pos[(pos[:, 0] > 5.0) & (pos[:, 0] < 6.0)]
        assert len(at_wall) > 0
        assert np.all(at_wall[:, 1] > 3.5) and np.all(at_wall[:, 1] < 7.5)
        assert np.all(at_wall[:, 2] > 0.5) and np.all(at_wall[:, 2] < 4.5)

    def test_traj_server(self, planned):
        pm, res, start, goal = planned
        srv = TrajServer()
        t0 = 1000.0
        srv.set_trajectory(res.traj, stamp=t0)
        srv.last_heartbeat = t0
        cmd = srv.command(now=t0 + 0.5)
        assert cmd is not None
        assert np.isfinite(np.asarray(cmd.position)).all()
        # horizon sampling: 100 ticks = 1 s
        cmds = sample_horizon(res.traj, jnp.asarray(0.0), 100)
        assert cmds.position.shape == (100, 3)
        np.testing.assert_allclose(
            np.asarray(cmds.position[0]), np.asarray(res.traj.pos(0.0)), atol=1e-9
        )
        # watchdog: stale heartbeat freezes velocity
        srv.heartbeat()
        srv.last_heartbeat = t0  # simulate stale
        frozen = srv.command(now=t0 + 2.0)
        np.testing.assert_allclose(np.asarray(frozen.velocity), 0.0, atol=1e-12)


class TestSnapClearance:
    def test_snap_prefers_deep_pocket(self):
        """snap_feasible tie-breaks near-equidistant free candidates by ESDF
        clearance: a click inside a wall stub next to both a 1-voxel slot
        and open space must snap into the open side (the planner-side ESDF
        consumer — ref GridMap3D ESDF, Gridmap3D.cpp:361-533)."""
        conf = Config(
            mapBound=(0.0, 8.0, 0.0, 8.0, 0.0, 4.0),
            occupancy_resolution=0.5, kernel_size=3,
        )
        # a solid block x∈[3,5), plus a second wall at x∈[1.5,2) leaving a
        # narrow 1-voxel-wide slot between them on the low-x side; high-x
        # side of the block is fully open
        pts = np.concatenate([
            maps_gen.gene_wall(3.0, 0.0, 2.0, 8.0, 4.0, res=0.25),
            maps_gen.gene_wall(1.5, 0.0, 0.5, 8.0, 4.0, res=0.25),
        ])
        pm = PlannerManager(conf, shape_name="Point")
        pm.set_map_points(pts, use_pose_kernels=False)
        # click just inside the block's low-x face: the nearest free voxels
        # on both sides are near-equidistant; clearance must pick high-x
        # x=4.0 is equidistant between the slot and the open side; the plain
        # first-argmin would land in the slot (lexicographic low-x first)
        click = np.array([4.0, 4.0, 2.0])
        snapped = pm.snap_feasible(click, max_radius_vox=8)
        assert snapped[0] > 5.0, snapped


class TestYawContinuity:
    def test_sample_horizon_carries_last_yaw(self):
        """Replanning must seed the rate-limited yaw chain with the
        previously-served yaw — no command discontinuity at horizon
        boundaries (ref traj_server.cpp:85-144; VERDICT r2 weak #9)."""
        import jax.numpy as jnp
        from isdf_tpu.core import minco
        from isdf_tpu.plan.traj_server import sample_horizon, _YAW_DOT_MAX

        # a trajectory moving in -x: velocity-aligned yaw is pi
        q = jnp.array([[ -2.0, 0.0, 1.0], [-4.0, 0.0, 1.0]])
        T = jnp.array([1.5, 1.5, 1.5])
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([-6.0, 0.0, 1.0]))
        traj = minco.trajectory(q, T, head, tail)

        rate = 100.0
        h1 = sample_horizon(traj, jnp.asarray(0.0), 50, rate=rate)
        # continuing horizon, seeded with the served yaw
        h2 = sample_horizon(traj, jnp.asarray(0.5), 50, rate=rate,
                            last_yaw=float(h1.yaw[-1]))
        yaws = np.concatenate([np.asarray(h1.yaw), np.asarray(h2.yaw)])
        steps = np.abs(np.diff(yaws))
        steps = np.minimum(steps, 2 * np.pi - steps)  # wrap-safe
        assert steps.max() <= float(_YAW_DOT_MAX) / rate + 1e-9
        # default seed (yaw 0) across the same boundary would jump toward pi
        h2_bad = sample_horizon(traj, jnp.asarray(0.5), 50, rate=rate)
        jump = abs(float(h2_bad.yaw[0]) - float(h1.yaw[-1]))
        assert jump > 10 * float(_YAW_DOT_MAX) / rate
