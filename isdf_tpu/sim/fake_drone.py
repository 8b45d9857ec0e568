"""Kinematic "fake drone": position commands echoed as odometry.

(ref src/uav_simulator/fake_drone/src/poscmd_2_odom.cpp:16-60 — the demo
pipeline's closed-loop stand-in for the dynamics sim: odom pose = command
pose, orientation = yaw about z.)"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Odometry(NamedTuple):
    position: jnp.ndarray
    velocity: jnp.ndarray
    quat_wxyz: jnp.ndarray


def cmd_to_odom(cmd) -> Odometry:
    """PositionCommand → Odometry (pure kinematic echo)."""
    half = 0.5 * cmd.yaw
    quat = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)],
        axis=-1,
    )
    return Odometry(position=cmd.position, velocity=cmd.velocity, quat_wxyz=quat)
