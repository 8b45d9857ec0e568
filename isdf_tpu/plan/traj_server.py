"""Trajectory serving: 100 Hz position-command sampling.

Re-design of the reference's ``traj_server`` node
(ref src/plan_manager/src/traj_server.cpp:85-144 yaw planning,
173-319 cmdCallback, 332 100 Hz timer, 186-192 heartbeat watchdog):
samples pos/vel/acc/jerk plus a velocity-aligned yaw with rate limiting from
the current trajectory; past the end it holds the final position (hover).
The sampler is a pure jit-able function — an entire command horizon is one
vmapped call (the reference samples one tick per callback).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.core import flatness as fl


class PositionCommand(NamedTuple):
    position: jax.Array      # (..., 3)
    velocity: jax.Array
    acceleration: jax.Array
    jerk: jax.Array
    yaw: jax.Array
    yaw_dot: jax.Array


# ref traj_server.cpp:85-144: yaw tracks velocity direction with rate limit
_YAW_DOT_MAX = jnp.pi / 2  # rad/s (ref YAW_DOT_MAX_PER_SEC)


def sample_command(traj, t, last_yaw, dt):
    """One command tick; t clipped to the trajectory (hover at the end)."""
    total = traj.total_duration
    tc = jnp.clip(t, 0.0, total)
    pos, vel, acc, jer = traj.pvaj(tc)
    ended = t >= total
    vel = jnp.where(ended, 0.0, vel)
    acc = jnp.where(ended, 0.0, acc)
    jer = jnp.where(ended, 0.0, jer)

    speed = jnp.linalg.norm(vel[:2])
    yaw_des = jnp.where(speed > 0.1, jnp.arctan2(vel[1], vel[0]), last_yaw)
    dy = jnp.arctan2(jnp.sin(yaw_des - last_yaw), jnp.cos(yaw_des - last_yaw))
    max_d = _YAW_DOT_MAX * dt
    step = jnp.clip(dy, -max_d, max_d)
    yaw = last_yaw + step
    yaw_dot = step / dt
    return PositionCommand(pos, vel, acc, jer, yaw, yaw_dot)


from functools import partial


@partial(jax.jit, static_argnames=("n", "rate"))
def sample_horizon(traj, t0, n, rate=100.0, last_yaw=0.0):
    """Sample a whole command horizon [t0, t0 + n/rate) in one scan.

    ``last_yaw`` seeds the rate-limited yaw chain: callers replanning in a
    closed loop must pass the previously-served yaw so commands stay
    continuous across horizon boundaries (the discontinuity the reference's
    rate limiter exists to prevent, ref traj_server.cpp:85-144)."""
    dt = 1.0 / rate
    ts = t0 + jnp.arange(n) * dt

    def step(last_yaw, t):
        cmd = sample_command(traj, t, last_yaw, dt)
        return cmd.yaw, cmd

    _, cmds = jax.lax.scan(step, jnp.asarray(last_yaw, ts.dtype), ts)
    return cmds


class TrajServer:
    """Stateful host-side server with the heartbeat watchdog."""

    def __init__(self, rate: float = 100.0, heartbeat_timeout: float = 0.5):
        self.rate = rate
        self.heartbeat_timeout = heartbeat_timeout
        self.traj = None
        self.traj_stamp = 0.0
        self.last_heartbeat = 0.0
        self.last_yaw = 0.0
        self._frozen_cmd: Optional[PositionCommand] = None

    def set_trajectory(self, traj, stamp: Optional[float] = None):
        self.traj = traj
        self.traj_stamp = time.time() if stamp is None else stamp
        self._frozen_cmd = None

    def heartbeat(self):
        self.last_heartbeat = time.time()

    def command(self, now: Optional[float] = None) -> Optional[PositionCommand]:
        if self.traj is None:
            return None
        now = time.time() if now is None else now
        if (
            self.last_heartbeat
            and now - self.last_heartbeat > self.heartbeat_timeout
        ):
            # watchdog: freeze at last position (ref traj_server.cpp:186-192)
            if self._frozen_cmd is None:
                self._frozen_cmd = self._sample(now)._replace(
                    velocity=jnp.zeros(3), acceleration=jnp.zeros(3),
                    jerk=jnp.zeros(3), yaw_dot=jnp.asarray(0.0),
                )
            return self._frozen_cmd
        cmd = self._sample(now)
        self.last_yaw = float(cmd.yaw)
        return cmd

    def _sample(self, now: float) -> PositionCommand:
        t = jnp.asarray(now - self.traj_stamp)
        return sample_command(
            self.traj, t, jnp.asarray(self.last_yaw), 1.0 / self.rate
        )
