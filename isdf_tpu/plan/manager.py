"""Planner orchestration — the ``PlannerManager`` equivalent
(ref src/plan_manager/src/plan_manager.cpp:130 init, 180 generatePath,
202 generateTraj, 397 mapRcvCallBack).

Pipeline per plan request (ref targetRcvCallBack, plan_manager.cpp:434-488):
  1. front end: SE(3) A* over the occupancy grid with pose kernels
  2. waypoint subsample every ~traj_parlength meters (plan_manager.cpp:206)
  3. obstacle gather: occupied voxels in AABBs around waypoints → static
     padded ``parallel_points`` (plan_manager.cpp:232-254)
  4. mid end: MINCO + waypoint attraction fit → warm start opt_x
  5. back end: jit L-BFGS with swept-volume SDF safety penalty
  6. emit trajectory + metrics (cost breakdown, timings, sdf-eval counts)

ROS pub/sub is replaced by plain function calls; the debug topic machinery
(SURVEY.md §5) maps to the metrics dict + observability hooks in
isdf_tpu/utils/obs.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl
from isdf_tpu.opt import backend, midend
from isdf_tpu.search import astar_se3, build_pose_kernels, pose_feasibility
from isdf_tpu.search.astar import subsample_waypoints
from isdf_tpu.shapes import Shape, make_shape
from isdf_tpu.world import GridMap, aabb
from isdf_tpu.utils.obs import Metrics


@dataclass
class PlanResult:
    success: bool
    traj: Any = None                       # PolyTraj
    path: Optional[np.ndarray] = None      # A* path
    rolls: Optional[np.ndarray] = None
    pitches: Optional[np.ndarray] = None
    metrics: Dict[str, Any] = field(default_factory=dict)


def _resample_by_arclength(path: np.ndarray, n: int, *extras) -> tuple:
    """n interior waypoints uniformly spaced along the path's arclength.

    Any `extras` (per-node angle arrays: A* rolls/pitches) are resampled by
    PEAK-HOLD: each waypoint takes the largest-|angle| node value within its
    half-spacing arclength cell.  Linear interpolation would dilute the A*
    pose span (a −45° node midway between two waypoints becomes −22° at
    both), losing exactly the attitude information the narrow-passage
    waypoints exist to carry; peak-hold guarantees every rolled node is
    represented at full strength by its nearest waypoint.
    """
    seg = np.linalg.norm(np.diff(path, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1] if s[-1] > 0 else 1.0
    targets = np.linspace(0.0, total, n + 2)[1:-1]
    out = np.empty((n, 3))
    for ax in range(3):
        out[:, ax] = np.interp(targets, s, path[:, ax])
    h = 0.5 * (targets[1] - targets[0]) if n > 1 else 0.5 * total
    held = []
    for e in extras:
        e = np.asarray(e)
        v = np.empty(n)
        for i, t in enumerate(targets):
            cell = (s >= t - h) & (s <= t + h)
            if cell.any():
                ec = e[cell]
                v[i] = ec[np.argmax(np.abs(ec))]
            else:
                v[i] = np.interp(t, s, e)
        held.append(v)
    return (out,) + tuple(held)


def _rp_to_rot(rolls: np.ndarray, pitches: np.ndarray) -> np.ndarray:
    """Per-waypoint attitude references R = Rx(roll)·Ry(pitch) — the same
    convention as the pose-kernel voxelization (search/pose_kernels.py
    one_pose; ref Shape.hpp:423-440 kernel pose loop)."""
    cr, sr = np.cos(rolls), np.sin(rolls)
    cp, sp = np.cos(pitches), np.sin(pitches)
    n = len(rolls)
    R = np.zeros((n, 3, 3))
    # Rx(r) @ Ry(p)
    R[:, 0, 0] = cp
    R[:, 0, 2] = sp
    R[:, 1, 0] = sr * sp
    R[:, 1, 1] = cr
    R[:, 1, 2] = -sr * cp
    R[:, 2, 0] = -cr * sp
    R[:, 2, 1] = sr
    R[:, 2, 2] = cr * cp
    return R


class PlannerManager:
    def __init__(self, conf: Config, shape: Optional[Shape] = None,
                 shape_name: Optional[str] = None):
        self.conf = conf
        if shape is None:
            shape = make_shape(shape_name or "Ball", conf)
        self.shape = shape
        self.params = fl.FlatParams.from_config(conf)
        self.gridmap: Optional[GridMap] = None
        self.feasibility = None
        self.pose_kernels = None
        self.metrics = Metrics()

    # -- map arrival (ref mapRcvCallBack plan_manager.cpp:397-411) -----------
    def set_map_points(self, points: np.ndarray, use_pose_kernels: bool = True):
        t0 = time.perf_counter()
        gm = GridMap.from_points(
            points, self.conf.mapBound, self.conf.occupancy_resolution,
            self.conf.sta_threshold,
        )
        self.set_map(gm, use_pose_kernels=use_pose_kernels)
        self.metrics.log("map_build_s", time.perf_counter() - t0)

    def set_map(self, gm: GridMap, use_pose_kernels: bool = True):
        self.gridmap = gm
        if use_pose_kernels:
            t0 = time.perf_counter()
            if self.pose_kernels is None:
                # shape-only precompute — reused across map updates
                # (closed-loop replanning rebuilds only the feasibility conv)
                self.pose_kernels = build_pose_kernels(self.shape, self.conf)
            feas = pose_feasibility(gm.occ, self.pose_kernels.kernels)
            self.feasibility = np.asarray(feas)
            self.metrics.log("kernel_build_s", time.perf_counter() - t0)

    def snap_feasible(self, p, max_radius_vox: int = 6) -> np.ndarray:
        """Snap a point to the nearest any-pose-feasible free voxel center
        (within max_radius_vox), so user clicks inside/too close to geometry
        still plan.

        Near-equidistant candidates (within one voxel of the closest) are
        tie-broken by ESDF clearance — the snapped start/goal lands in the
        locally deepest free pocket instead of hugging the wall it was
        snapped away from (the planner-side consumer of GridMap.with_esdf;
        ref GridMap3D ESDF, Gridmap3D.cpp:361-533)."""
        gm = self.gridmap
        occ = np.asarray(gm.occ)
        free = ~occ
        if self.feasibility is not None:
            R, P = self.feasibility.shape[:2]
            free = free & self.feasibility.reshape(R * P, *occ.shape).any(axis=0)
        idx = np.asarray(gm.world_to_index(jnp.asarray(np.asarray(p, dtype=np.float64))))
        if (idx < 0).any() or (idx >= np.array(occ.shape)).any():
            return np.asarray(p, dtype=np.float64)
        if free[tuple(idx)]:
            return np.asarray(p, dtype=np.float64)
        r = max_radius_vox
        lo = np.maximum(idx - r, 0)
        hi = np.minimum(idx + r + 1, occ.shape)
        sub = free[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        cands = np.argwhere(sub) + lo
        if len(cands) == 0:
            return np.asarray(p, dtype=np.float64)
        d = np.linalg.norm(cands - idx, axis=1)
        near = d <= d.min() + 1.0
        cands, d = cands[near], d[near]
        if len(cands) > 1:
            if gm.esdf is None:
                gm = gm.with_esdf()
                self.gridmap = gm
            clr = np.asarray(gm.esdf)[tuple(cands.T)]
            best = cands[np.argmax(clr - 1e-6 * d)]
        else:
            best = cands[0]
        return np.asarray(gm.index_to_world(jnp.asarray(best)))

    # -- full plan (ref targetRcvCallBack) -----------------------------------
    def plan(self, start, goal, max_iters: Optional[int] = None,
             start_vel=None, start_acc=None, monitor=None) -> PlanResult:
        """start_vel/start_acc: initial derivative rows of the head state —
        used by closed-loop replanning so the new trajectory continues the
        current flight smoothly (the reference replans from rest).
        monitor: optional utils.monitor.OptiMonitor streaming per-chunk cost
        breakdowns from the back end (debug_assistant equivalent)."""
        assert self.gridmap is not None, "call set_map first"
        conf = self.conf
        m: Dict[str, Any] = {}

        start = self.snap_feasible(start)
        goal = self.snap_feasible(goal)

        # 1. front end
        t0 = time.perf_counter()
        fr = astar_se3(
            self.gridmap, np.asarray(start), np.asarray(goal),
            feasibility=self.feasibility,
            rolls=None if self.pose_kernels is None else np.asarray(self.pose_kernels.rolls),
            pitches=None if self.pose_kernels is None else np.asarray(self.pose_kernels.pitches),
        )
        m["front_end_s"] = time.perf_counter() - t0
        m["expanded"] = fr.expanded
        if not fr.success:
            return PlanResult(False, metrics=m)

        # 2. subsample waypoints; bucket the count so repeated plans with
        # similar path lengths reuse the same compiled solver executable
        idxs = subsample_waypoints(
            fr.path, conf.occupancy_resolution, conf.traj_parlength
        )
        n_q = len(idxs)
        buckets = [b for b in conf.piece_buckets if b >= n_q]
        if buckets and buckets[0] != n_q:
            Q, wp_rolls, wp_pitches = _resample_by_arclength(
                fr.path, buckets[0], fr.rolls, fr.pitches
            )
        else:
            Q = fr.path[idxs]
            wp_rolls, wp_pitches = fr.rolls[idxs], fr.pitches[idxs]
        N = len(Q) + 1
        m["n_pieces"] = N

        # per-waypoint attitude references from the A* SE(3) poses (ref
        # rot_list collection, plan_manager.cpp:232-254) — fed to the mid-end
        # attitude penalty.  Skipped when pose kernels are off (no attitude
        # information exists) or every pose is trivially zero.
        rot_refs = None
        if (self.pose_kernels is not None and conf.weight_ar > 0.0
                and (np.abs(wp_rolls).max(initial=0.0) > 1e-9
                     or np.abs(wp_pitches).max(initial=0.0) > 1e-9)):
            rot_refs = _rp_to_rot(wp_rolls, wp_pitches)
            m["attitude_refs"] = True

        # 3. obstacle gather
        t0 = time.perf_counter()
        bd = conf.kernel_bd
        pts, mask = aabb.gather_aabb_points(
            self.gridmap, Q, (bd / 3, bd / 3, bd / 3),
            offset=conf.offsetAABBbox, max_points=conf.max_obstacle_points,
        )
        m["aabb_s"] = time.perf_counter() - t0
        m["parallel_points_num"] = int(mask.sum())

        head = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray(np.asarray(start, dtype=np.float64)))
        if start_vel is not None:
            head = head.at[:, 1].set(jnp.asarray(np.asarray(start_vel, dtype=np.float64)))
        if start_acc is not None:
            head = head.at[:, 2].set(jnp.asarray(np.asarray(start_acc, dtype=np.float64)))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray(np.asarray(goal, dtype=np.float64)))
        T0 = jnp.full(N, conf.inittime)

        # 4. mid end
        t0 = time.perf_counter()
        ori_traj, opt_x, mid_res = midend.get_ori_traj(
            conf, head, tail, jnp.asarray(Q), T0, rot_refs=rot_refs,
        )
        m["mid_end_s"] = time.perf_counter() - t0
        m["mid_end_iters"] = int(mid_res.n_iters)

        # 5. back end
        t0 = time.perf_counter()
        tau, q_ws = backend.unpack(opt_x, N)
        from isdf_tpu.core import timemap

        traj, res = backend.optimize(
            self.shape, conf, head, tail, q_ws,
            timemap.tau_to_T(tau),
            jnp.asarray(pts), jnp.asarray(mask),
            max_iters=max_iters, rot_refs=rot_refs, monitor=monitor,
        )
        m["back_end_s"] = time.perf_counter() - t0
        m["back_end_iters"] = int(res.n_iters)
        m["back_end_evals"] = int(res.n_evals)

        # 6. safety re-plan: the optimizer only sees a static obstacle-point
        # budget; the reference sees EVERY AABB voxel (plan_manager.cpp:
        # 246-254, unbounded std::vector).  Audit the swept volume against
        # all nearby voxels; if any violate, inject them into the obstacle
        # set (replacing the lowest-priority = farthest entries) and
        # re-solve warm-started from the current trajectory.  Shapes are
        # static, so the re-solve hits the same compiled executable.
        for rnd in range(conf.safety_replan_rounds):
            viol, viol_t = self._audit_violations(traj)
            if viol is None or len(viol) == 0:
                break
            pts_np = np.asarray(pts).copy()
            mask_np = np.asarray(mask).copy()
            k = min(len(viol), len(pts_np))
            # eviction priority: free (masked-off) padding slots first, then
            # live entries farthest from the waypoint path — the "replace
            # lowest-priority" intent (mirrors world/aabb.py's path-priority
            # truncation when the gather runs over budget)
            d_path = np.min(
                np.linalg.norm(pts_np[:, None, :] - Q[None, :, :], axis=-1),
                axis=1,
            )
            slot_prio = np.where(mask_np, d_path, np.inf)   # evict inf first
            evict = np.argsort(-slot_prio, kind="stable")[:k]
            pts_np[evict] = viol[:k]
            mask_np[evict] = True
            pts, mask = pts_np, mask_np
            # seed every obstacle point's argmin-time warm start from the
            # audit's high-resolution t*: injected violations are visible to
            # the penalty immediately, even when the optimizer's coarser scan
            # would alias over a thin-wall crossing dip
            t_warm_np = np.zeros(len(pts_np), dtype=np.asarray(pts_np).dtype)
            t_warm_np[evict] = viol_t[:k]
            q_ws = traj.junction_positions()[1:-1]
            t0 = time.perf_counter()
            traj, res = backend.optimize(
                self.shape, conf, head, tail, q_ws, traj.durations,
                jnp.asarray(pts), jnp.asarray(mask),
                t_warm0=jnp.asarray(t_warm_np), max_iters=max_iters,
                rot_refs=rot_refs, monitor=monitor,
            )
            m["back_end_s"] += time.perf_counter() - t0
            m["back_end_iters"] += int(res.n_iters)
            m["back_end_evals"] += int(res.n_evals)
            m["safety_replans"] = rnd + 1
            m["injected_violations"] = int(k)

        m["final_cost"] = float(res.f)
        m["total_duration"] = float(traj.total_duration)
        m["cost_trace"] = np.asarray(res.history)
        self.metrics.log_dict(m)
        return PlanResult(
            True, traj=traj, path=fr.path, rolls=fr.rolls,
            pitches=fr.pitches, metrics=m,
        )

    # -- audits --------------------------------------------------------------
    def _audit_sdf(self, traj):
        """Swept SDF at every occupied voxel near the trajectory.

        Returns (points (M,3), sdf (M,), t_star (M,)) np or (None,)*3.

        The coarse time resolution is *duration-adaptive* (dt ≤ 0.1 s,
        bucketed powers of two for executable reuse): a fixed sample count
        aliases over thin-obstacle crossings, whose SDF dip lasts roughly
        (wall + body thickness)/speed seconds regardless of total duration
        (the reference scans at absolute dt ≈ 0.15–0.2 s, choiceTInit
        sw_manager.hpp:367-445).
        """
        from isdf_tpu.sweep import sweep_sdf
        import jax

        total = float(traj.total_duration)
        ts = np.linspace(0, total, 64)
        centers = jax.vmap(traj.pos)(jnp.asarray(ts))
        pts, mask = aabb.gather_aabb_points(
            self.gridmap, np.asarray(centers),
            (self.conf.kernel_bd / 2,) * 3,
            max_points=self.conf.max_obstacle_points,
        )
        if not mask.any():
            return None, None, None
        live = pts[mask]
        need = total / 0.1
        coarse_n = 64
        while coarse_n < need and coarse_n < 2048:
            coarse_n *= 2
        sdf, t_star, _ = sweep_sdf(
            self.shape, traj, self.params, jnp.asarray(live),
            coarse_n=coarse_n,
        )
        return live, np.asarray(sdf), np.asarray(t_star)

    def _audit_violations(self, traj, margin: float = 1e-3):
        """(voxel centers, argmin times) whose swept SDF ≤ margin, worst
        first.  The t* values seed the re-solve's warm starts so the
        optimizer's (coarser) argmin scan cannot alias over the violation.

        When ANY voxel violates, the whole grazing NEIGHBORHOOD (sdf ≤
        safety_hor/2) is returned, worst first: injecting a single deepest
        voxel gives the re-solve one isolated gradient spike it can slide
        around; the surrounding near-contact voxels are what wall off the
        colliding channel."""
        live, sdf, t_star = self._audit_sdf(traj)
        if live is None:
            return None, None
        bad = sdf <= margin
        if not bad.any():
            return live[:0], t_star[:0]
        near = sdf <= max(float(self.conf.safety_hor) * 0.5, margin)
        order = np.argsort(sdf[near], kind="stable")
        return live[near][order], t_star[near][order]

    def audit_collision(self, traj, n_samples: int = 400) -> float:
        """Minimum swept SDF over all occupied voxels near the trajectory —
        a REAL collision check (the reference's isTrajCollide is a stub that
        always returns false, sw_manager.hpp:764-767)."""
        live, sdf, _ = self._audit_sdf(traj)
        if live is None:
            return float("inf")
        return float(sdf.min())
