"""SE(2) planar planning pipeline — the paper's 2-D experiments
(BASELINE.json: "2D circle robot, rotation decoupled" and "2D arbitrary
polygon with yaw optimization").

The reference repo ships no 2-D code path (the experiments are paper-only);
this is the TPU-native realization: MINCO optimizes (x, y, ψ) jointly — the
third trajectory coordinate IS the yaw (core/flatness.PlanarPose), the
swept-volume SDF penalty and dynamic penalties all switch with the pose map,
and the front end is a plain 2-D occupancy A* whose path tangent seeds the
yaw references.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.core import timemap
from isdf_tpu.core.flatness import PlanarPose
from isdf_tpu.opt import backend, lbfgs, midend
from isdf_tpu.search import astar_se3
from isdf_tpu.search.astar import subsample_waypoints
from isdf_tpu.sweep import sweep_sdf
from isdf_tpu.world import GridMap


@dataclass
class PlanarResult:
    success: bool
    traj: Any = None               # PolyTraj over (x, y, ψ)
    path: Optional[np.ndarray] = None
    metrics: Dict[str, Any] = field(default_factory=dict)


def _unwrap_angles(a):
    return np.unwrap(np.asarray(a))


def plan_planar(
    conf: Config,
    shape,
    points2d: np.ndarray,
    start_xy,
    goal_xy,
    yaw_opt: bool = True,
    start_yaw: float = 0.0,
    goal_yaw: Optional[float] = None,
    max_iters: Optional[int] = None,
) -> PlanarResult:
    """Full planar plan: 2-D A* → MINCO (x, y, ψ) fit → swept-SDF refine.

    points2d: (M, 2) obstacle points in the plane.
    yaw_opt=False plans a rotation-decoupled robot (ψ pinned to 0 —
    the circle-robot mode); yaw_opt=True seeds ψ from the path tangent and
    optimizes it jointly.
    """
    m: Dict[str, Any] = {}
    params = PlanarPose(z_ref=0.0)

    pts2 = np.asarray(points2d)
    pts3 = np.concatenate([pts2, np.zeros((len(pts2), 1))], axis=1)
    res = conf.occupancy_resolution
    lo = pts2.min(axis=0) - 2.0
    hi = pts2.max(axis=0) + 2.0
    # single-z-layer grid: the 3-D A* cannot leave the plane
    gm = GridMap.from_points(
        pts3,
        (lo[0], hi[0], lo[1], hi[1], -res / 2, res / 2),
        res, conf.sta_threshold,
    )

    s3 = np.array([start_xy[0], start_xy[1], 0.0])
    g3 = np.array([goal_xy[0], goal_xy[1], 0.0])
    t0 = time.perf_counter()
    # body-aware front end: inflate by the footprint the body presents in
    # its BEST orientation (circle: radius; yaw-optimized polygon: minor
    # half-extent) — the planar analogue of the 3-D pose kernels
    b = getattr(shape, "bounds", (0.0, 0.0, 0.0))
    footprint = min(b[0], b[1]) if yaw_opt else max(b[0], b[1])
    infl = int(math.floor(footprint / res))
    gm_search = gm.inflated(infl) if infl > 0 else gm
    fr = astar_se3(gm_search, s3, g3, feasibility=None)
    if not fr.success and infl > 0:  # body barely fits: retry less inflated
        fr = astar_se3(gm.inflated(infl - 1) if infl > 1 else gm, s3, g3,
                       feasibility=None)
    m["front_end_s"] = time.perf_counter() - t0
    if not fr.success:
        return PlanarResult(False, metrics=m)

    idxs = subsample_waypoints(
        fr.path, conf.occupancy_resolution, conf.traj_parlength
    )
    Q_xy = fr.path[idxs][:, :2]
    N = len(Q_xy) + 1
    m["n_pieces"] = N

    # yaw references from the path tangent (the natural "attitude" of a
    # forward-moving polygon); unwrapped so MINCO sees a continuous signal
    if yaw_opt:
        d = np.diff(fr.path[:, :2], axis=0)
        tang = np.arctan2(d[:, 1], d[:, 0])
        tang = np.concatenate([tang, tang[-1:]])
        yaw_ref = _unwrap_angles(tang[idxs])
        goal_psi = float(_unwrap_angles([start_yaw] + list(tang))[-1]) \
            if goal_yaw is None else goal_yaw
    else:
        yaw_ref = np.zeros(len(idxs))
        goal_psi = 0.0

    Q = np.concatenate([Q_xy, yaw_ref[:, None]], axis=1)

    head = jnp.zeros((3, 3)).at[:, 0].set(
        jnp.asarray([s3[0], s3[1], start_yaw])
    )
    tail = jnp.zeros((3, 3)).at[:, 0].set(
        jnp.asarray([g3[0], g3[1], goal_psi])
    )
    T0 = jnp.full(N, conf.inittime)

    # obstacle set: every occupied voxel near the path (2-D maps are small
    # enough to take them all up to the static budget)
    occ_pts = np.asarray(gm.occupied_centers())
    if len(occ_pts) > conf.max_obstacle_points:
        d = np.min(
            np.linalg.norm(
                occ_pts[:, None, :2] - fr.path[None, ::4, :2], axis=-1
            ),
            axis=1,
        )
        occ_pts = occ_pts[np.argsort(d)[: conf.max_obstacle_points]]
    P = conf.max_obstacle_points
    pts_pad = np.zeros((P, 3))
    mask = np.zeros(P, bool)
    pts_pad[: len(occ_pts)] = occ_pts
    mask[: len(occ_pts)] = True
    m["parallel_points_num"] = int(mask.sum())

    # mid end: plain MINCO waypoint fit (x, y, ψ)
    t0 = time.perf_counter()
    ori, opt_x, mid_res = midend.get_ori_traj(
        conf, head, tail, jnp.asarray(Q), T0, params=params
    )
    m["mid_end_s"] = time.perf_counter() - t0

    # back end with the planar pose map
    t0 = time.perf_counter()
    tau, q_ws = backend.unpack(opt_x, N)
    traj, res = backend.optimize(
        shape, conf, head, tail, q_ws, timemap.tau_to_T(tau),
        jnp.asarray(pts_pad), jnp.asarray(mask),
        max_iters=max_iters, params=params,
    )
    m["back_end_s"] = time.perf_counter() - t0
    m["back_end_iters"] = int(res.n_iters)
    m["final_cost"] = float(res.f)
    m["total_duration"] = float(traj.total_duration)

    sdf, _, _ = sweep_sdf(shape, traj, params, jnp.asarray(occ_pts))
    m["min_swept_sdf"] = float(jnp.min(sdf))
    return PlanarResult(True, traj=traj, path=fr.path, metrics=m)


def audit_planar(shape, traj, points2d) -> float:
    """Min swept SDF over the 2-D obstacle points."""
    params = PlanarPose(z_ref=0.0)
    pts3 = np.concatenate(
        [np.asarray(points2d), np.zeros((len(points2d), 1))], axis=1
    )
    sdf, _, _ = sweep_sdf(shape, traj, params, jnp.asarray(pts3))
    return float(jnp.min(sdf))
