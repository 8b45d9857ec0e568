"""Moving obstacles + trajectory prediction — the ``moving_obstacles``
node equivalent (ref src/common/moving_obstacles/src/moving_obstacles.cpp).

The reference animates planar obstacles with decayed-velocity dynamics
(dyn_update: vel += a·dt, vel *= 0.9, ‖vel‖ ≤ MAX_VEL, cpp:44-55), predicts
their motion a fixed horizon ahead by replaying the same dynamics
(predict, cpp:75-86), and fits a MINCO minimum-jerk trajectory through the
predicted waypoints (predict_traj, cpp:92-117) for consumers.

Here the dynamics stay host-side NumPy (they are the scenario generator,
not the compute path); the predictor reuses the engine's own MINCO solve so
predicted obstacle trajectories are first-class ``PolyTraj`` objects that
the swept-volume machinery can consume directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np


MAX_VEL = 3.0          # ref moving_obstacles.cpp MAX_VEL
VEL_DECAY = 0.9        # ref cpp:48 "gradually stop like a real obstacle"
PRED_TIME = 5.0        # ref cpp:95
SEG_NUM = 10           # ref cpp:96


def _dyn_update(dt: float, acc: float, yaw_rate: float,
                yaw: float, pos: np.ndarray, vel: np.ndarray):
    """One dynamics step (ref dyn_update cpp:44-55)."""
    yaw = yaw + yaw_rate * dt
    acc_vec = acc * np.array([np.cos(yaw), np.sin(yaw)])
    vel = (vel + acc_vec * dt) * VEL_DECAY
    n = np.linalg.norm(vel)
    if n > MAX_VEL:
        vel = vel * (MAX_VEL / n)
    pos = pos + vel * dt + 0.5 * acc_vec * dt * dt
    return yaw, pos, vel


@dataclass
class MovingObstacle:
    """A planar obstacle rendered as a vertical cylinder point cloud."""

    pos: np.ndarray                  # (2,)
    vel: np.ndarray = field(default_factory=lambda: np.zeros(2))
    yaw: float = 0.0
    radius: float = 0.5
    height: float = 3.0

    def update(self, dt: float, acc: float, yaw_rate: float):
        self.yaw, self.pos, self.vel = _dyn_update(
            dt, acc, yaw_rate, self.yaw, self.pos.copy(), self.vel.copy()
        )

    def predict(self, acc: float, yaw_rate: float, t_ahead: float,
                step: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
        """(pos, vel) t_ahead seconds ahead under constant controls
        (ref predict cpp:75-86, STEP=0.1 replay)."""
        yaw, pos, vel = self.yaw, self.pos.copy(), self.vel.copy()
        t = 0.0
        while t < t_ahead - 1e-9:
            h = min(step, t_ahead - t)
            yaw, pos, vel = _dyn_update(h, acc, yaw_rate, yaw, pos, vel)
            t += h
        return pos, vel

    def points(self, res: float = 0.15, rng=None) -> np.ndarray:
        """Cylinder surface+interior point cloud at the current pose."""
        rs = np.arange(res / 2, self.radius + 1e-9, res)
        pts = []
        for r in rs:
            n = max(int(2 * np.pi * r / res), 1)
            a = np.linspace(0, 2 * np.pi, n, endpoint=False)
            ring = np.stack([r * np.cos(a), r * np.sin(a)], axis=1)
            pts.append(ring)
        disk = np.concatenate(pts, axis=0) + self.pos[None, :]
        zs = np.arange(res / 2, self.height, res)
        cloud = np.concatenate(
            [np.concatenate([disk, np.full((len(disk), 1), z)], axis=1)
             for z in zs], axis=0)
        if rng is not None:
            cloud = cloud + rng.normal(scale=0.01, size=cloud.shape)
        return cloud


def predict_traj(obs: MovingObstacle, acc: float, yaw_rate: float, z: float,
                 pred_time: float = PRED_TIME, seg_num: int = SEG_NUM):
    """MINCO minimum-jerk fit through the predicted motion
    (ref predict_traj cpp:92-117) → PolyTraj."""
    import jax.numpy as jnp

    from isdf_tpu.core import minco
    from isdf_tpu.core.poly import PolyTraj

    dt = pred_time / seg_num
    inner = []
    for i in range(1, seg_num):
        p, _ = obs.predict(acc, yaw_rate, dt * i)
        inner.append([p[0], p[1], z])
    p_end, v_end = obs.predict(acc, yaw_rate, pred_time)

    head = jnp.zeros((3, 3))
    head = head.at[:, 0].set(jnp.asarray([obs.pos[0], obs.pos[1], z]))
    head = head.at[:, 1].set(jnp.asarray([obs.vel[0], obs.vel[1], 0.0]))
    tail = jnp.zeros((3, 3))
    tail = tail.at[:, 0].set(jnp.asarray([p_end[0], p_end[1], z]))
    tail = tail.at[:, 1].set(jnp.asarray([v_end[0], v_end[1], 0.0]))

    q = jnp.asarray(np.asarray(inner))
    T = jnp.full((seg_num,), dt)
    coeffs = minco.solve(q, T, head, tail)
    return PolyTraj(T, coeffs)


def compose_map(static_points: np.ndarray, obstacles, res: float = 0.15,
                rng=None) -> np.ndarray:
    """Static map points + every obstacle's current point cloud."""
    clouds = [static_points] + [o.points(res=res, rng=rng) for o in obstacles]
    return np.concatenate(clouds, axis=0)
