"""SO(3) quadrotor rigid-body dynamics simulator, jit/vmap-able.

Re-derivation of the reference's ``so3_quadrotor_simulator``
(ref src/uav_simulator/so3_quadrotor_simulator/src/dynamics/Quadrotor.cpp:
state = (pos, vel, R, ω, motor rpm); per-motor first-order lag with time
constant 1/30 s; thrust = k_f Σ rpm², X-configuration moments, external
drag) — the Boost.odeint integration becomes an RK4 ``lax.scan``, and the
whole rollout batches over fleets with vmap.

Parameter defaults follow Quadrotor.cpp:20-35.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuadrotorParams(NamedTuple):
    mass: float = 0.98
    g: float = 9.81
    arm_length: float = 0.26
    kf: float = 8.98132e-9
    km: float = 0.07 * (3 * 0.099) * 8.98132e-9   # (Cq/Ct)·D·kf, prop r=0.099
    motor_tau: float = 1.0 / 30.0
    inertia: tuple = (2.64e-3, 2.64e-3, 4.96e-3)  # Quadrotor.cpp J diag
    drag: float = 0.10                            # linear air drag coeff
    motor_rpm_min: float = 1200.0
    motor_rpm_max: float = 35000.0


class QuadState(NamedTuple):
    pos: jax.Array       # (3,)
    vel: jax.Array       # (3,)
    R: jax.Array         # (3, 3)
    omega: jax.Array     # (3,) body rates
    motor_rpm: jax.Array # (4,)

    @staticmethod
    def hover(p: QuadrotorParams, pos=None):
        pos = jnp.zeros(3) if pos is None else jnp.asarray(pos)
        rpm = jnp.sqrt(p.mass * p.g / (4 * p.kf))
        return QuadState(
            pos=pos, vel=jnp.zeros(3), R=jnp.eye(3), omega=jnp.zeros(3),
            motor_rpm=jnp.full(4, rpm),
        )


def _deriv(s: QuadState, rpm_cmd, p: QuadrotorParams):
    rpm_sq = s.motor_rpm**2
    thrust = p.kf * jnp.sum(rpm_sq)
    # X-configuration moments (Quadrotor.cpp:155-158)
    mx = p.kf * (rpm_sq[2] - rpm_sq[3]) * p.arm_length
    my = p.kf * (rpm_sq[1] - rpm_sq[0]) * p.arm_length
    mz = p.km * (rpm_sq[0] + rpm_sq[1] - rpm_sq[2] - rpm_sq[3])
    M = jnp.array([mx, my, mz])

    e3 = jnp.array([0.0, 0.0, 1.0])
    force = thrust * s.R @ e3 - p.mass * p.g * e3 - p.drag * s.vel
    acc = force / p.mass

    J = jnp.diag(jnp.asarray(p.inertia))
    omega_dot = jnp.linalg.solve(J, M - jnp.cross(s.omega, J @ s.omega))

    wx, wy, wz = s.omega
    omega_hat = jnp.array([[0, -wz, wy], [wz, 0, -wx], [-wy, wx, 0]])
    R_dot = s.R @ omega_hat

    rpm_dot = (rpm_cmd - s.motor_rpm) / p.motor_tau
    return QuadState(s.vel, acc, R_dot, omega_dot, rpm_dot)


def _axpy(s: QuadState, d: QuadState, h):
    return QuadState(*(a + h * b for a, b in zip(s, d)))


@partial(jax.jit, static_argnames=())
def step(s: QuadState, rpm_cmd, p: QuadrotorParams, dt: float = 0.01):
    """One RK4 step + rotation re-orthonormalization + motor limits."""
    rpm_cmd = jnp.clip(rpm_cmd, p.motor_rpm_min, p.motor_rpm_max)
    k1 = _deriv(s, rpm_cmd, p)
    k2 = _deriv(_axpy(s, k1, dt / 2), rpm_cmd, p)
    k3 = _deriv(_axpy(s, k2, dt / 2), rpm_cmd, p)
    k4 = _deriv(_axpy(s, k3, dt), rpm_cmd, p)
    out = QuadState(
        *(
            a + dt / 6 * (b1 + 2 * b2 + 2 * b3 + b4)
            for a, b1, b2, b3, b4 in zip(s, k1, k2, k3, k4)
        )
    )
    # project R back to SO(3) (odeint drifts; reference renormalizes too)
    u, _, vt = jnp.linalg.svd(out.R)
    R = u @ vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return out._replace(
        R=R, motor_rpm=jnp.clip(out.motor_rpm, p.motor_rpm_min, p.motor_rpm_max)
    )


def rollout(s0: QuadState, rpm_cmds, p: QuadrotorParams, dt: float = 0.01):
    """Integrate a whole command sequence (T, 4) → trajectory of states."""

    def f(s, cmd):
        s2 = step(s, cmd, p, dt)
        return s2, s2

    return jax.lax.scan(f, s0, rpm_cmds)


def force_moments_to_rpm(thrust, M, p: QuadrotorParams):
    """Invert the mixer: desired total thrust + moments → motor rpm commands
    (the so3_control → simulator interface)."""
    L, kf, km = p.arm_length, p.kf, p.km
    # thrust = kf Σ w², mx = kf L (w2²−w3²), my = kf L (w1²−w0²),
    # mz = km (w0²+w1²−w2²−w3²)
    A = jnp.array(
        [
            [kf, kf, kf, kf],
            [0.0, 0.0, kf * L, -kf * L],
            [-kf * L, kf * L, 0.0, 0.0],
            [km, km, -km, -km],
        ]
    )
    b = jnp.concatenate([jnp.atleast_1d(thrust), M])
    w_sq = jnp.linalg.solve(A, b)
    return jnp.sqrt(jnp.clip(w_sq, p.motor_rpm_min**2, p.motor_rpm_max**2))
