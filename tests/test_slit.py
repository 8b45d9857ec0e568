"""Slit-traversal: the SE(3) attitude chain end-to-end on a synthetic
narrow-passage map (the demo5/demo6 mechanism at unit-test scale).

A tall thin plate (2.4 × 0.3 × 0.3 m) must cross a wall whose horizontal
slit blocks the upright pose kernel but admits tilted poses: the SE(3) A*
must emit non-zero (roll, pitch) references, the mid-end attitude penalty
must make the warm-start trajectory tilt through the crossing, and the full
pipeline must come out (near-)collision-free.  Without the attitude penalty
the mid-end warm start crosses upright.

(ref: the demo5/demo6 use case — plan_manager launch demo5/demo6 +
mid_end.hpp:340-421 attitude machinery; rotation collection
plan_manager.cpp:232-254.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.so3 import quat_to_rot
from isdf_tpu.plan.manager import (
    PlannerManager, _rp_to_rot, _resample_by_arclength,
)
from isdf_tpu.search import astar_se3
from isdf_tpu.shapes import make_shape
from isdf_tpu.world import GridMap
from isdf_tpu.opt import midend

pytestmark = pytest.mark.slow


def _slit_world():
    """Wall at x∈[4.9, 5.6] with a horizontal slit: free voxel-center span
    2.25 m in z — blocks the upright kernel (span 2.5) of a 2.4 m plate,
    admits tilted poses."""
    pts = []
    for x in np.arange(4.9, 5.6, 0.2):
        for y in np.arange(0, 8.01, 0.2):
            for z in np.arange(0, 8.01, 0.2):
                if 2.9 < z < 5.55:
                    continue
                pts.append((x, y, z))
    for c in [(0, 0, 0), (10, 8, 8)]:
        pts.append(c)
    return np.asarray(pts)


def _conf(weight_ar=32000.0):
    return Config(
        occupancy_resolution=0.25, kernel_size=13,
        kernel_max_roll=45.0, kernel_max_pitch=45.0, kernel_ang_res=9.0,
        box_x=0.15, box_y=0.15, box_z=1.2, safety_hor=0.2,
        vmax=10.0, omgmax=10.0, thetamax=100.0,
        integralIntervs=16, sweep_coarse_samples=32, sweep_refine_rounds=8,
        max_obstacle_points=2048, weight_ar=weight_ar,
        traj_parlength=1.0, safety_replan_rounds=3,
    )


@pytest.fixture(scope="module")
def slit_pm():
    conf = _conf()
    shape = make_shape("Box", conf)
    pm = PlannerManager(conf, shape=shape)
    pm.set_map(GridMap.from_points(
        _slit_world(), None, conf.occupancy_resolution, 1))
    return pm


def _max_tilt_deg(traj, params, x_window=(4.2, 6.3)):
    """Max body-z tilt angle (deg) while the body center is inside the
    crossing window in x."""
    ts = np.linspace(0, float(traj.total_duration), 400)
    pos, vel, acc, jer = jax.vmap(traj.pvaj)(jnp.asarray(ts))
    quat, _ = fl.rates_of(pos, vel, acc, jer, params)
    bz = np.asarray(jax.vmap(quat_to_rot)(quat))[:, :, 2]   # body z in world
    tilt = np.degrees(np.arccos(np.clip(bz[:, 2], -1, 1)))
    pos = np.asarray(pos)
    m = (pos[:, 0] > x_window[0]) & (pos[:, 0] < x_window[1])
    return float(tilt[m].max()) if m.any() else 0.0


class TestSlitAttitudeChain:
    def test_astar_emits_tilt_refs(self, slit_pm):
        fr = astar_se3(
            slit_pm.gridmap, np.array([2.0, 4.0, 4.0]),
            np.array([8.0, 4.0, 4.0]),
            feasibility=slit_pm.feasibility,
            rolls=np.asarray(slit_pm.pose_kernels.rolls),
            pitches=np.asarray(slit_pm.pose_kernels.pitches),
        )
        assert fr.success
        tilt = np.degrees(np.maximum(np.abs(fr.rolls), np.abs(fr.pitches)))
        mid = np.abs(fr.path[:, 0] - 5.25) < 0.9
        assert tilt[mid].max() >= 18.0, (
            f"A* should need a tilted pose through the slit: {tilt[mid]}"
        )
        # upright pose must be infeasible at every wall voxel
        R, P = slit_pm.feasibility.shape[:2]
        zi, zj = (R - 1) // 2, (P - 1) // 2
        occ = np.asarray(slit_pm.gridmap.occ)
        wall_cols = [i for i in np.where(occ.any(axis=(1, 2)))[0]
                     if 15 <= i <= 25]
        for ix in wall_cols:
            assert slit_pm.feasibility[zi, zj, ix].sum() == 0

    def test_midend_tracks_tilt_refs(self, slit_pm):
        conf = slit_pm.conf
        start, goal = np.array([2.0, 4.0, 4.0]), np.array([8.0, 4.0, 4.0])
        fr = astar_se3(
            slit_pm.gridmap, start, goal, feasibility=slit_pm.feasibility,
            rolls=np.asarray(slit_pm.pose_kernels.rolls),
            pitches=np.asarray(slit_pm.pose_kernels.pitches),
        )
        Q, wr, wp = _resample_by_arclength(fr.path, 8, fr.rolls, fr.pitches)
        # peak-hold must preserve the full A* tilt magnitude
        assert np.degrees(np.maximum(np.abs(wr), np.abs(wp)).max()) >= 18.0
        rot_refs = _rp_to_rot(wr, wp)
        head = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray(start))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray(goal))
        T0 = jnp.full(len(Q) + 1, conf.inittime)
        params = fl.FlatParams.from_config(conf)
        t_att, _, _ = midend.get_ori_traj(
            conf, head, tail, jnp.asarray(Q), T0, rot_refs=rot_refs)
        t_off, _, _ = midend.get_ori_traj(
            conf.replace(weight_ar=0.0), head, tail, jnp.asarray(Q), T0)
        tilt_att = _max_tilt_deg(t_att, params)
        tilt_off = _max_tilt_deg(t_off, params)
        assert tilt_att >= 12.0, f"mid-end should tilt through: {tilt_att}"
        assert tilt_att > tilt_off + 8.0, (
            f"attitude refs should drive the tilt: with={tilt_att}, "
            f"without={tilt_off}"
        )

    def test_full_pipeline_collision_free(self, slit_pm):
        res = slit_pm.plan(
            np.array([2.0, 4.0, 4.0]), np.array([8.0, 4.0, 4.0]),
            max_iters=150,
        )
        assert res.success
        # strictly collision-free by the voxel-center swept-SDF audit —
        # the needle's-eye case is the very scenario the SE(3) machinery
        # exists for, and the reference's stub here (sw_manager.hpp:764-767)
        # sets the bar we must beat (VERDICT r3 #7)
        min_sdf = slit_pm.audit_collision(res.traj)
        assert min_sdf > 0.0, f"collision: {min_sdf}"
