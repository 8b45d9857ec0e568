"""Attitude-aware mid-end (ref mid_end.hpp:340-421 costaltitude/WC2 +
addTimeIntPenalty attitude term; rotation collection plan_manager.cpp:232-254).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.so3 import quat_to_rot, rpy_to_rot
from isdf_tpu.opt import midend
from isdf_tpu.plan.manager import _rp_to_rot


pytestmark = pytest.mark.smoke


class TestWC2:
    def test_values(self):
        x = jnp.asarray([-2.0, -1.0, -0.75, -0.5, 0.0, 0.5, 0.75, 1.0, 2.0])
        v = np.asarray(midend.wc2(x))
        np.testing.assert_allclose(
            v, [0.0, 0.0, 0.125, 0.5, 1.0, 0.5, 0.125, 0.0, 0.0], atol=1e-12
        )

    def test_matches_reference_piecewise(self):
        # the reference's WC2 (mid_end.hpp:394-421), value + derivative
        def ref_wc2(x):
            if x < -1:
                return 0.0, 0.0
            if x < -0.5:
                return 2 * (x + 1) ** 2, 4 * (x + 1)
            if x < 0.5:
                return 1 - 2 * x * x, -4 * x
            if x < 1:
                return 2 * (x - 1) ** 2, 4 * (x - 1)
            return 0.0, 0.0

        g = jax.grad(lambda x: midend.wc2(x))
        for x in np.linspace(-1.3, 1.3, 53):
            fv, dv = ref_wc2(float(x))
            assert abs(float(midend.wc2(x)) - fv) < 1e-12, x
            assert abs(float(g(jnp.asarray(x))) - dv) < 1e-9, x


class TestAttitudeCost:
    def test_zero_at_reference(self):
        q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        assert abs(float(midend.attitude_cost(q, jnp.eye(3)))) < 1e-12

    def test_angle_form(self):
        # for R(q) = rotation by θ about any axis vs identity ref:
        # cost = 2(3 − tr R) = 4(1 − cos θ)
        for th in [0.3, 1.0, 2.0]:
            q = jnp.asarray(
                [np.cos(th / 2), np.sin(th / 2), 0.0, 0.0]
            )  # about x
            c = float(midend.attitude_cost(q, jnp.eye(3)))
            assert abs(c - 4 * (1 - np.cos(th))) < 1e-10

    def test_matches_reference_polynomial_modulo_typo(self):
        # the reference's expanded quaternion polynomial (mid_end.hpp:340-348)
        # equals 2(3 − tr(R_refᵀR)) except its c1 term reads (2wx + yz)
        # instead of (2wx + 2yz).  With a DIAGONAL reference (c1 = 0) the
        # two agree exactly.
        def ref_costaltitude(q, Rf):
            w, x, y, z = [float(v) for v in q]
            a0, a1, a2 = Rf[0]
            b0, b1, b2 = Rf[1]
            c0, c1, c2 = Rf[2]
            return (
                2 * a0 * (2 * y * y + 2 * z * z - 1)
                + 2 * b1 * (2 * x * x + 2 * z * z - 1)
                + 2 * c2 * (2 * x * x + 2 * y * y - 1)
                + 2 * a1 * (2 * w * z - 2 * x * y)
                - 2 * a2 * (2 * w * y + 2 * x * z)
                - 2 * b0 * (2 * w * z + 2 * x * y)
                + 2 * b2 * (2 * w * x - 2 * y * z)
                + 2 * c0 * (2 * w * y - 2 * x * z)
                - 2 * c1 * (2 * w * x + y * z)
                + 6
            )

        rng = np.random.default_rng(3)
        for _ in range(5):
            v = rng.normal(size=4)
            q = jnp.asarray(v / np.linalg.norm(v))
            Rf = np.diag([1.0, 1.0, 1.0])
            ours = float(midend.attitude_cost(q, jnp.asarray(Rf)))
            assert abs(ours - ref_costaltitude(q, Rf)) < 1e-9


class TestRpToRot:
    def test_matches_kernel_convention(self):
        rolls = np.asarray([0.3, -0.2, 0.0])
        pitches = np.asarray([-0.1, 0.4, 0.0])
        R = _rp_to_rot(rolls, pitches)
        for i in range(3):
            expect = np.asarray(
                rpy_to_rot(rolls[i], 0.0, 0.0) @ rpy_to_rot(0.0, pitches[i], 0.0)
            )
            np.testing.assert_allclose(R[i], expect, atol=1e-12)


class TestMidEndAttitudeTracking:
    def _setup(self):
        conf = Config(
            integralIntervs=32, rho_mid_end=50.0, weight_pr=1000.0,
            weight_ar=32000.0, smoothingEps=1e-2,
        )
        # straight-line waypoints along x
        N = 4
        Q = np.asarray([[2.5, 0, 1.0], [5.0, 0, 1.0], [7.5, 0, 1.0]])
        head = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray([0.0, 0.0, 1.0]))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray([10.0, 0.0, 1.0]))
        T0 = jnp.full(N, 1.2)
        # attitude reference: 35° roll at the MIDDLE waypoint only
        rot_refs = _rp_to_rot(
            np.asarray([0.0, np.radians(35.0), 0.0]), np.zeros(3)
        )
        return conf, head, tail, Q, T0, rot_refs

    def _tilt_error_at_waypoints(self, conf, traj, rot_refs):
        """attitude_cost at each interior junction vs its reference."""
        params = fl.FlatParams.from_config(conf)
        T = np.asarray(traj.durations)
        t_junc = np.cumsum(T)[:-1]
        pos, vel, acc, jer = jax.vmap(traj.pvaj)(jnp.asarray(t_junc))
        quat, _ = fl.rates_of(pos, vel, acc, jer, params)
        return np.asarray(
            jax.vmap(midend.attitude_cost)(quat, jnp.asarray(rot_refs))
        )

    def test_attitude_penalty_pulls_roll(self):
        conf, head, tail, Q, T0, rot_refs = self._setup()
        t_on, _, _ = midend.get_ori_traj(
            conf, head, tail, jnp.asarray(Q), T0, rot_refs=rot_refs,
            max_iters=300,
        )
        t_off, _, _ = midend.get_ori_traj(
            conf.replace(weight_ar=0.0), head, tail, jnp.asarray(Q), T0,
            max_iters=300,
        )
        err_on = self._tilt_error_at_waypoints(conf, t_on, rot_refs)
        err_off = self._tilt_error_at_waypoints(conf, t_off, rot_refs)
        # middle waypoint wants 35° roll: 4(1−cos 35°) ≈ 0.725
        assert err_off[1] > 0.5, f"straight traj should be flat: {err_off}"
        assert err_on[1] < 0.35 * err_off[1], (
            f"attitude penalty should track the roll ref: on={err_on}, "
            f"off={err_off}"
        )

    def test_identity_refs_vanish_on_slow_trajectory(self):
        # a slow trajectory has near-zero acceleration → tilt ≈ identity →
        # the windowed penalty against identity refs is negligible
        conf, head, tail, Q, T0, _ = self._setup()
        from isdf_tpu.core import minco
        from isdf_tpu.core.poly import PolyTraj

        T = jnp.full(4, 20.0)  # very slow
        coeffs = minco.solve(jnp.asarray(Q), T, head, tail)
        traj = PolyTraj(T, coeffs)
        att = midend.pad_attitude_refs(np.tile(np.eye(3), (3, 1, 1)))
        params = fl.FlatParams.from_config(conf)
        pen = float(midend.attitude_penalty(
            traj, params, att, conf.weight_ar, conf.smoothingEps, 32
        ))
        # compare against the same penalty with a 35°-roll ref (should be
        # orders of magnitude larger)
        att_roll = midend.pad_attitude_refs(_rp_to_rot(
            np.full(3, np.radians(35.0)), np.zeros(3)))
        pen_roll = float(midend.attitude_penalty(
            traj, params, att_roll, conf.weight_ar, conf.smoothingEps, 32
        ))
        assert pen < 1e-2 * pen_roll
        assert pen_roll > 1.0
