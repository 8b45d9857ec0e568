"""Quadrotor differential-flatness map with drag, in JAX.

Re-derivation of the reference's ``flatness::FlatnessMap``
(ref: src/utils/include/utils/flatness.hpp:33-228): maps (vel, acc, jerk) →
(tilt quaternion, body rate ω, thrust).  The physical model: drag-augmented
net force  zu = a + (dh/m)(1 + cp‖v‖_ε) v + g e₃  defines the body z-axis
z = zu/‖zu‖; the tilt-only quaternion is the minimal rotation taking e₃ → z;
ω follows from ż projected through the unit-normalization Jacobian.

The reference's 170-line hand-written reverse pass
(flatness.hpp:230-406 ``backwardthreadsafe``) does not exist here —
``jax.grad``/``jax.vjp`` of :func:`forward` replaces it exactly.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from isdf_tpu.core.so3 import quat_to_rot, hat


class FlatParams(NamedTuple):
    mass: float = 0.61
    grav: float = 9.8
    dh: float = 0.10          # horizontal drag coeff
    dv: float = 0.10          # vertical drag coeff
    cp: float = 0.01          # parasitic drag coeff
    veps: float = 1.0e-4      # speed smoothing

    @classmethod
    def from_config(cls, conf):
        return cls(
            mass=conf.vehicleMass,
            grav=conf.gravAcc,
            dh=conf.horizDrag,
            dv=conf.vertDrag,
            cp=conf.parasDrag,
            veps=conf.speedEps,
        )


def _zu(vel, acc, p: FlatParams):
    """Drag-augmented specific force direction (un-normalized body z)."""
    cp_term = jnp.sqrt(jnp.sum(vel * vel, axis=-1, keepdims=True) + p.veps)
    w_term = 1.0 + p.cp * cp_term
    w = w_term * vel
    g3 = jnp.zeros_like(vel).at[..., 2].set(p.grav)
    zu = acc + (p.dh / p.mass) * w + g3
    return zu, w, w_term, cp_term


def tilt_quat(vel, acc, p: FlatParams):
    """Tilt-only quaternion (w,x,y,z) with zero yaw (flatness.hpp:53-86)."""
    zu, _, _, _ = _zu(vel, acc, p)
    z = zu / jnp.linalg.norm(zu, axis=-1, keepdims=True)
    tilt_den = jnp.sqrt(2.0 * (1.0 + z[..., 2]))
    return jnp.stack(
        [
            0.5 * tilt_den,
            -z[..., 1] / tilt_den,
            z[..., 0] / tilt_den,
            jnp.zeros_like(tilt_den),
        ],
        axis=-1,
    )


def forward(vel, acc, jer, p: FlatParams):
    """(v, a, j) → (quat, ω) with zero yaw (flatness.hpp:88-148).

    Returns:
      quat: (..., 4) tilt quaternion (w,x,y,z)
      omg:  (..., 3) body rates
    """
    zu, w, w_term, cp_term = _zu(vel, acc, p)
    zu_sqr_norm = jnp.sum(zu * zu, axis=-1, keepdims=True)
    zu_norm = jnp.sqrt(zu_sqr_norm)
    z = zu / zu_norm

    tilt_den = jnp.sqrt(2.0 * (1.0 + z[..., 2]))
    quat = jnp.stack(
        [
            0.5 * tilt_den,
            -z[..., 1] / tilt_den,
            z[..., 0] / tilt_den,
            jnp.zeros_like(tilt_den),
        ],
        axis=-1,
    )

    # ż via the normalization Jacobian  (I − z zᵀ)/‖zu‖  applied to żu.
    v_dot_a = jnp.sum(vel * acc, axis=-1, keepdims=True)
    dw_term = p.cp * v_dot_a / cp_term
    dw = w_term * acc + dw_term * vel
    dzu = jer + (p.dh / p.mass) * dw
    ng = (jnp.eye(3, dtype=zu.dtype) - z[..., :, None] * z[..., None, :]) / zu_norm[
        ..., None
    ]
    dz = jnp.einsum("...ij,...j->...i", ng, dzu)

    omg_den = z[..., 2] + 1.0
    omg_term = dz[..., 2] / omg_den
    omg = jnp.stack(
        [
            -dz[..., 1] + z[..., 1] * omg_term,
            dz[..., 0] - z[..., 0] * omg_term,
            (z[..., 1] * dz[..., 0] - z[..., 0] * dz[..., 1]) / omg_den,
        ],
        axis=-1,
    )
    return quat, omg


def forward_full(vel, acc, jer, psi, dpsi, p: FlatParams):
    """Full map with yaw: (v, a, j, ψ, ψ̇) → (thrust, quat, ω).

    (flatness.hpp:150-228 ``forward``)."""
    zu, w, w_term, cp_term = _zu(vel, acc, p)
    zu_norm = jnp.linalg.norm(zu, axis=-1, keepdims=True)
    z = zu / zu_norm

    g3 = jnp.zeros_like(vel).at[..., 2].set(p.grav)
    f_term = p.mass * (acc + g3) + p.dv * w
    thr = jnp.sum(z * f_term, axis=-1)

    tilt_den = jnp.sqrt(2.0 * (1.0 + z[..., 2]))
    tilt = jnp.stack(
        [0.5 * tilt_den, -z[..., 1] / tilt_den, z[..., 0] / tilt_den], axis=-1
    )
    ch, sh = jnp.cos(0.5 * psi), jnp.sin(0.5 * psi)
    quat = jnp.stack(
        [
            tilt[..., 0] * ch,
            tilt[..., 1] * ch + tilt[..., 2] * sh,
            tilt[..., 2] * ch - tilt[..., 1] * sh,
            tilt[..., 0] * sh,
        ],
        axis=-1,
    )

    v_dot_a = jnp.sum(vel * acc, axis=-1, keepdims=True)
    dw_term = p.cp * v_dot_a / cp_term
    dw = w_term * acc + dw_term * vel
    dzu = jer + (p.dh / p.mass) * dw
    ng = (jnp.eye(3, dtype=zu.dtype) - z[..., :, None] * z[..., None, :]) / zu_norm[
        ..., None
    ]
    dz = jnp.einsum("...ij,...j->...i", ng, dzu)

    cps, sps = jnp.cos(psi), jnp.sin(psi)
    omg_den = z[..., 2] + 1.0
    omg_term = dz[..., 2] / omg_den
    omg = jnp.stack(
        [
            dz[..., 0] * sps - dz[..., 1] * cps
            - (z[..., 0] * sps - z[..., 1] * cps) * omg_term,
            dz[..., 0] * cps + dz[..., 1] * sps
            - (z[..., 0] * cps + z[..., 1] * sps) * omg_term,
            (z[..., 1] * dz[..., 0] - z[..., 0] * dz[..., 1]) / omg_den + dpsi,
        ],
        axis=-1,
    )
    return thr, quat, omg


class PlanarPose(NamedTuple):
    """SE(2) "attitude map": the trajectory's 3rd coordinate IS the yaw ψ.

    This is the planar planning mode of the paper's 2-D experiments
    (BASELINE configs: "2D circle robot, rotation decoupled", "2D arbitrary
    polygon with yaw optimization"): MINCO optimizes (x, y, ψ) jointly; the
    robot pose is ((x, y, z_ref), Rz(ψ)).  Passing a PlanarPose instead of
    FlatParams anywhere a pose map is expected switches the whole pipeline
    (sweep, penalties, demos) to SE(2).
    """

    z_ref: float = 0.0


def pose_of(pos, vel, acc, jer, p):
    """(p/v/a/j) → (position ℝ³, attitude R) under either pose map."""
    if isinstance(p, PlanarPose):
        yaw = pos[..., 2]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        R = jnp.stack(
            [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
        ).reshape(yaw.shape + (3, 3))
        pos3 = jnp.stack(
            [pos[..., 0], pos[..., 1], jnp.full_like(c, p.z_ref)], axis=-1
        )
        return pos3, R
    quat = tilt_quat(vel, acc, p)
    return pos, quat_to_rot(quat)


def rates_of(pos, vel, acc, jer, p):
    """(quat, ω) for the dynamic-feasibility penalties under either map.

    Planar: quat = yaw quaternion (no tilt), ω = (0, 0, ψ̇)."""
    if isinstance(p, PlanarPose):
        half = 0.5 * pos[..., 2]
        zeros = jnp.zeros_like(half)
        quat = jnp.stack(
            [jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1
        )
        omg = jnp.stack([zeros, zeros, vel[..., 2]], axis=-1)
        return quat, omg
    return forward(vel, acc, jer, p)


def state_on_traj(traj, t, p: FlatParams):
    """Trajectory state → (pos, vel, R, Ṙ) at time t.

    Ṙ = R ω̂ (ref sw_manager.hpp:307-324 getStateOnTrajStamp)."""
    pos, vel, acc, jer = traj.pvaj(t)
    quat, omg = forward(vel, acc, jer, p)
    R = quat_to_rot(quat)
    return pos, vel, R, R @ hat(omg)


def pose_on_traj(traj, t, p: FlatParams):
    """(pos, R) at time t — the swept-SDF hot path (sw_manager.hpp:332-341)."""
    pos, vel, acc, jer = traj.pvaj(t)
    quat = tilt_quat(vel, acc, p)
    return pos, quat_to_rot(quat)
