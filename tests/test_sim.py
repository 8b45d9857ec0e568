"""Simulator tests: hover equilibrium, closed-loop geometric control tracking
a planned trajectory, kinematic fake drone, mockamap generator."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.sim import (
    QuadrotorParams, QuadState, quad_step, rollout,
    SO3ControlGains, so3_control, cmd_to_odom,
)
from isdf_tpu.sim.quadrotor import force_moments_to_rpm
from isdf_tpu.world.maps_gen import mockamap
import pytest

pytestmark = pytest.mark.smoke


class TestQuadrotor:
    def test_hover_equilibrium(self):
        p = QuadrotorParams()
        s = QuadState.hover(p)
        rpm = s.motor_rpm
        for _ in range(50):
            s = quad_step(s, rpm, p, dt=0.01)
        # slight drag-free drift only; stays near origin, attitude level
        assert float(jnp.linalg.norm(s.pos)) < 0.05
        np.testing.assert_allclose(np.asarray(s.R), np.eye(3), atol=1e-6)

    def test_free_fall_without_thrust(self):
        p = QuadrotorParams(drag=0.0)
        s = QuadState.hover(p)._replace(motor_rpm=jnp.full(4, p.motor_rpm_min))
        s2, _ = rollout(s, jnp.full((100, 4), p.motor_rpm_min), p, dt=0.01)
        assert float(s2.pos[2]) < -3.0  # fell ~4.9m minus minor min-thrust

    def test_mixer_roundtrip(self):
        p = QuadrotorParams()
        thrust, M = 12.0, jnp.array([0.02, -0.01, 0.005])
        rpm = force_moments_to_rpm(thrust, M, p)
        rpm_sq = rpm**2
        np.testing.assert_allclose(float(p.kf * rpm_sq.sum()), thrust, rtol=1e-6)


class TestClosedLoop:
    def test_hover_hold_under_controller(self):
        p = QuadrotorParams()
        s = QuadState.hover(p, pos=jnp.array([0.0, 0.0, 1.0]))
        target = jnp.array([0.0, 0.0, 1.5])

        def ctrl_step(s, _):
            thrust, M = so3_control(
                s.pos, s.vel, s.R, s.omega,
                target, jnp.zeros(3), jnp.zeros(3), 0.0,
                p.mass, p.g, inertia=p.inertia,
            )
            rpm = force_moments_to_rpm(thrust, M, p)
            s2 = quad_step(s, rpm, p, dt=0.005)
            return s2, s2.pos

        s_fin, traj = jax.lax.scan(ctrl_step, s, None, length=1600)
        err = float(jnp.linalg.norm(s_fin.pos - target))
        assert err < 0.1, err

    def test_fake_drone_echo(self):
        from isdf_tpu.plan.traj_server import PositionCommand

        cmd = PositionCommand(
            position=jnp.array([1.0, 2.0, 3.0]), velocity=jnp.ones(3),
            acceleration=jnp.zeros(3), jerk=jnp.zeros(3),
            yaw=jnp.asarray(np.pi / 2), yaw_dot=jnp.asarray(0.0),
        )
        odom = cmd_to_odom(cmd)
        np.testing.assert_allclose(np.asarray(odom.position), [1, 2, 3])
        np.testing.assert_allclose(
            np.asarray(odom.quat_wxyz),
            [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-7,
        )


class TestMockamap:
    def test_reproducible_and_fillrate(self):
        a = mockamap(size=(20, 20, 8), seed=3)
        b = mockamap(size=(20, 20, 8), seed=3)
        np.testing.assert_array_equal(a, b)
        frac = len(a) / (20 * 20 * 8)
        assert 0.08 < frac < 0.16
