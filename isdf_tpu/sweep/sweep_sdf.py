"""Swept-volume SDF:  SV(p) = min_t SDF_body(R(t)ᵀ (p − x(t))).

The heart of the engine (SURVEY.md §7.1 item 4).  Re-designs the reference's
``SweptVolumeManager::getSDFofSweptVolume`` pipeline
(ref src/swept_volume/include/swept_volume/sw_manager.hpp:367-530 choiceTInit,
677-747 getSDFofSweptVolume, 1000-1062 gradientDescent): the reference runs,
per obstacle point, a data-dependent rough scan (dt≈0.15-0.2 s) to find
candidate time intervals, then a projected gradient descent with backtracking
(≤300 iters) using the analytic dSDF/dt
(sw_manager.hpp:593-662: grad·(−(Rᵀv + ω̂ p_rel))).

TPU-first re-design — everything fixed-shape, batched over points:
  1. *Shared coarse scan*: trajectory poses (x(t), R(t)) on a uniform time
     grid are computed **once** and shared by all P query points; the P×T SDF
     table is one fused elementwise pass (the reference recomputes poses per
     point per scan step).
  2. *Interval zoom*: K fixed rounds of "sample 8 candidates in a shrinking
     window around the running argmin" replace the data-dependent descent;
     each round multiplies time resolution by ~1/4, so 24 rounds reach 1e-14·T
     — far below float precision — with zero branches.
  3. *Warm start*: the t* of the previous outer-optimizer iteration seeds the
     window (ref ``lastTstar`` back_end_optimizer.hpp:59,576-578); the coarse
     scan is still evaluated and wins if it finds a deeper minimum (new
     obstacle-trajectory topology), which the reference handles with its
     range bookkeeping.
  4. *Envelope theorem*: t* is emitted through ``stop_gradient``; callers
     evaluate SDF(p, t*) differentiably, so ∂SV/∂(coeffs, T, p) is exact at
     the minimum — the same treatment the reference applies implicitly by
     treating t* constant in grad_cost_p_sw (back_end_optimizer.hpp:827).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from isdf_tpu.core import flatness as fl
from isdf_tpu.core.so3 import quat_to_rot


def traj_states(traj, params, ts):
    """Poses (x, R) at times ts (T,) → ((T,3), (T,3,3)).  Batched; `params`
    selects the pose map (FlatParams → quadrotor tilt, PlanarPose → SE(2))."""
    pos, vel, acc, jer = jax.vmap(traj.pvaj)(ts)
    return fl.pose_of(pos, vel, acc, jer, params)


def sdf_at_time(shape, traj, params: fl.FlatParams, p_eva, t):
    """SDF of the body at trajectory time t, world point(s) p_eva.

    Differentiable in everything (traj coeffs/durations, p_eva, t) — this is
    what the penalty evaluates at the frozen t* (envelope theorem).
    """
    pos, vel, acc, jer = traj.pvaj(t)
    pos3, R = fl.pose_of(pos, vel, acc, jer, params)
    p_rel = jnp.einsum("...ji,...j->...i", R, p_eva - pos3)
    return shape.sdf(p_rel)


def _batched_sdf_table(shape, p_eva, xs, Rs):
    """SDF table (P, T) from shared poses: p_rel = Rᵀ(p − x)."""
    diff = p_eva[:, None, :] - xs[None, :, :]          # (P, T, 3)
    p_rel = jnp.einsum("tji,ptj->pti", Rs, diff)       # (P, T, 3)
    return shape.sdf(p_rel)                            # (P, T)


# The Pallas coarse-scan kernel maps the whole padded field into VMEM per
# block; a field larger than this budget would fail to compile.  ~16 MiB
# VMEM per TPU core, minus block/intermediate headroom.  The kernels hold
# the field in bf16 (cast once at rest), so the budget is counted in bf16
# bytes — half the f32 host-side nbytes.
_PALLAS_FIELD_VMEM_BUDGET = 8 * 1024 * 1024


def _field_vmem_bytes(shape) -> int:
    """In-kernel VMEM for the fused grid-zoom kernel: the Z-MAJOR re-padded
    bf16 field (nx→mult-of-16, ny→8, nz→8; see pallas_grid_zoom._zmajor_pad)
    PLUS its 2×-min-pooled coarse twin, both resident per block.  Computed
    from the actual padded shapes — field2d.nbytes//2 under-counted awkward
    dims by up to ~2× and let oversized fields slip past the budget gate."""
    pg = shape.grid
    def _ru(v, m):
        return -(-v // m) * m
    def zbytes(nx, ny, nz):
        return _ru(nz, 8) * _ru(nx, 16) * _ru(ny, 8) * 2   # bf16
    fine = zbytes(pg.nx, pg.ny, pg.nz)
    coarse = zbytes(-(-pg.nx // 2), -(-pg.ny // 2), -(-pg.nz // 2))
    return fine + coarse


def _coarse_table_T(shape, p_eva, xs, Rs):
    """SDF table (T, P) in the lane-optimal transposed layout: components
    stay separate arrays and the point dim is minor (see fast_eval SoA
    docstring)."""
    px = p_eva[:, 0][None, :]                          # (1, P)
    py = p_eva[:, 1][None, :]
    pz = p_eva[:, 2][None, :]
    x3 = tuple(xs[:, i][:, None] for i in range(3))    # (T, 1) each
    R = tuple(Rs[:, i, j][:, None] for i in range(3) for j in range(3))
    from isdf_tpu.sweep.fast_eval import rel_components

    prel = rel_components((px, py, pz), x3, R)         # (T, P) each
    return shape.sdf3_fn()(*prel)                      # (T, P)


def _coarse_seed(shape, p_eva, xs, Rs, ts, use_pallas):
    """argmin-t seed of the coarse scan → (t0 (P,), dmin (P,)).

    Always the XLA table path: grid shapes on TPU dispatch to the fully
    fused kernel (pallas_grid_zoom.grid_sweep_warm_fused) before reaching
    here, so this seed only runs on CPU / for oversized fields / for
    non-8-multiple coarse_n — where the gather table is the safe choice."""
    table = _coarse_table_T(shape, p_eva, xs, Rs)      # (T, P)
    j = jnp.argmin(table, axis=0)
    return ts[j], jnp.min(table, axis=0)


def _plateau_argmin(d, cand, tie_eps: float = 1e-4):
    """Center of the connected near-minimum run, per row.

    When a query point lies inside the body, SDF(t) is constant over a time
    *interval* (plateau); the plain first-index argmin lands on the plateau
    edge, where the frozen-t* gradient picks up the wrong active face of the
    SDF max/min structure (the envelope theorem needs an argmin in the
    plateau interior).  This selects the midpoint of the tie run containing
    the argmin — equals the argmin for strict minima.

    The tie tolerance is *relative* to the SDF magnitude at the minimum
    (floored at tie_eps absolute for near-zero values), so plateau detection
    is scale-invariant across body sizes (e.g. Torus_big, bounds ≈ 3.8 m).
    """
    dmin = jnp.min(d, axis=-1, keepdims=True)
    eps = tie_eps * jnp.maximum(1.0, jnp.abs(dmin))
    tie = d <= dmin + eps
    j = jnp.argmin(d, axis=-1)[..., None]                    # (P, 1)
    k = d.shape[-1]
    idx = jnp.arange(k)
    # connectivity to j: all ties between position i and j
    tie_r = jnp.where(idx[None, :] <= j, True, tie)
    conn_r = jnp.cumprod(tie_r, axis=-1).astype(bool)
    tie_l = jnp.where(idx[None, :] >= j, True, tie)
    conn_l = jnp.flip(
        jnp.cumprod(jnp.flip(tie_l, axis=-1), axis=-1), axis=-1
    ).astype(bool)
    conn = jnp.where(idx[None, :] >= j, conn_r, conn_l)
    wsum = jnp.sum(conn, axis=-1)
    t_center = jnp.sum(jnp.where(conn, cand, 0.0), axis=-1) / wsum
    return t_center


def _plateau_argmin0(d, cand, tie_eps: float = 1e-4):
    """:func:`_plateau_argmin` along axis 0 — for (k, P) arrays in the
    transposed lane-optimal layout (the candidate axis lives in sublanes,
    the point axis in lanes)."""
    dmin = jnp.min(d, axis=0, keepdims=True)
    eps = tie_eps * jnp.maximum(1.0, jnp.abs(dmin))
    tie = d <= dmin + eps
    j = jnp.argmin(d, axis=0)[None, :]                       # (1, P)
    idx = jnp.arange(d.shape[0])[:, None]
    tie_r = jnp.where(idx <= j, True, tie)
    conn_r = jnp.cumprod(tie_r, axis=0).astype(bool)
    tie_l = jnp.where(idx >= j, True, tie)
    conn_l = jnp.flip(
        jnp.cumprod(jnp.flip(tie_l, axis=0), axis=0), axis=0
    ).astype(bool)
    conn = jnp.where(idx >= j, conn_r, conn_l)
    wsum = jnp.sum(conn, axis=0)
    return jnp.sum(jnp.where(conn, cand, 0.0), axis=0) / wsum


def _zoom(shape, traj, params, p_eva, t0, w0, rounds: int, k: int = 8):
    """Fixed-round interval zoom around per-point seeds t0 (P,).

    Each round evaluates k candidates in [t0−w, t0+w] and re-centers on the
    plateau-centered argmin; w shrinks by the candidate spacing factor.
    Returns (t*, sdf*).  Candidate blocks are laid out (k, P) — the point
    dim minor — and evaluated through the component-form SoA chain
    (fast_eval.sdf_at_time_c) for full vector-lane utilization.
    """
    from isdf_tpu.sweep.fast_eval import sdf_at_time_c

    total = traj.total_duration.astype(t0.dtype)
    offs = jnp.linspace(-1.0, 1.0, k).astype(t0.dtype)[:, None]   # (k, 1)
    pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])          # (P,) each

    def body(carry, _):
        t, w = carry
        cand = jnp.clip(t[None, :] + w[None, :] * offs, 0.0, total)
        cand = cand.astype(t0.dtype)
        d = sdf_at_time_c(shape, traj, params, pw, cand)  # (k, P)
        t_new = _plateau_argmin0(d, cand)
        w_new = (w * (2.0 / (k - 1))).astype(t0.dtype)
        return (t_new, w_new), None

    w_init = jnp.broadcast_to(jnp.asarray(w0, t0.dtype), t0.shape)
    (t_star, _), _ = jax.lax.scan(body, (t0, w_init), None, length=rounds)
    # envelope theorem: t* is a constant of the final evaluation, so the
    # returned sdf* is differentiable in (traj, p) through ONE evaluation —
    # callers (opt/backend.swept_penalty) use it directly without a second
    # forward pass (ref back_end_optimizer.hpp:827 treats t* constant).
    t_star = jax.lax.stop_gradient(t_star)
    sdf_star = sdf_at_time_c(shape, traj, params, pw, t_star)
    return t_star, sdf_star


def _fused_ok(shape, params, use_pallas) -> bool:
    """Dispatch to the fully-fused Pallas sweep kernel (pallas_zoom.py):
    analytic (gather-free) component-form shapes on TPU.  Grid-backed
    shapes keep the pallas_grid coarse scan + XLA zoom."""
    if use_pallas is False:
        return False
    try:
        from isdf_tpu.sweep.pallas_zoom import zoom_available
    except ImportError:
        # the intended "Pallas unavailable on this install" case only — a
        # real regression in pallas_zoom must surface, not silently
        # downgrade every TPU sweep to the ~9x-slower XLA path
        return False
    return isinstance(params, (fl.FlatParams, fl.PlanarPose)) and \
        zoom_available(shape, params)


def _grid_fused_ok(shape, params, use_pallas) -> bool:
    """Dispatch the fused grid-zoom Pallas kernel (pallas_grid_zoom.py) for
    grid-backed shapes whose field fits the VMEM budget — measured ~7× the
    XLA gather zoom (BASELINE.md "grid-shape sweep")."""
    if use_pallas is False:
        return False
    import jax as _jax

    return (
        shape.grid is not None
        and _field_vmem_bytes(shape) <= _PALLAS_FIELD_VMEM_BUDGET
        and isinstance(params, (fl.FlatParams, fl.PlanarPose))
        and _jax.default_backend() == "tpu"
    )


def _grid_pooled_ok(shape, params, use_pallas) -> bool:
    """Fields beyond the VMEM budget search t* on a min-pooled field that
    fits and evaluate value/grad on the true field with ONE XLA trilinear
    eval per query — replacing the scalarized-gather full-sweep fallback
    that ran ~0.08M q/s (VERDICT r4 weak #3)."""
    if use_pallas is False:
        return False
    import jax as _jax

    return (
        shape.grid is not None
        and _field_vmem_bytes(shape) > _PALLAS_FIELD_VMEM_BUDGET
        and isinstance(params, (fl.FlatParams, fl.PlanarPose))
        and _jax.default_backend() == "tpu"
    )


def _grid_sweep_pooled(shape, traj, params, p_eva, t_warm, coarse_n,
                       refine_rounds, warm_window):
    """Oversized-field warm sweep: fused-kernel t* search on the pooled
    field (VMEM-resident), differentiable value via the true-field XLA
    trilinear at t* (one eval/query — gathers are only below CPU class
    when the whole 100+-eval sweep runs on them)."""
    from isdf_tpu.sweep.fast_eval import sdf_at_time_c
    from isdf_tpu.sweep.pallas_grid_zoom import (
        grid_sweep_warm_fused, grid_sweep_inputs, pooled_grid)

    pgp = pooled_grid(shape.grid, _PALLAS_FIELD_VMEM_BUDGET)
    dims, dims_c, fieldZ, fieldZc, geo = grid_sweep_inputs(pgp)
    durs = traj.durations
    starts = jnp.cumsum(durs) - durs
    t_star, _, _ = grid_sweep_warm_fused(
        dims, dims_c, params, fieldZ, fieldZc, geo, p_eva, t_warm,
        starts, durs, traj.coeffs, coarse_n=coarse_n, rounds=refine_rounds,
        warm_window=warm_window)
    t_star = jax.lax.stop_gradient(t_star)
    pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])
    sdf_star = sdf_at_time_c(shape, traj, params, pw, t_star)
    grad_prel = _grad_prel(shape, traj, params, p_eva, t_star)
    return sdf_star, t_star, grad_prel


def _grid_sweep_fused(shape, traj, params, p_eva, t_warm, coarse_n,
                      refine_rounds, warm_window):
    """Fully-fused grid warm sweep (pallas_grid_zoom.grid_sweep_warm_fused):
    ONE launch for coarse scan + both zooms + in-kernel epilogue value/grad.

    The differentiable penalty value is the LINEARIZATION of the body SDF
    at the epilogue point — sdf(p_rel) ≈ d* + g*·(p_rel − p_rel*) with
    (d*, g*) kernel constants and p_rel(traj, p, t*) the differentiable
    pose chain.  This is EXACTLY how the reference consumes the sweep
    (sdf_value + gradp_rel pairs chained by hand, back_end_optimizer.hpp:
    619-627 + grad_cost_p_sw) — and since trilinear interpolation is
    piecewise-multilinear, g* IS its true gradient at the point, so the
    first-order semantics match autodiff of the interpolation while
    touching the voxel field zero times outside the kernel."""
    from isdf_tpu.sweep.fast_eval import (
        pvaj_components, pose_components, rel_components)
    from isdf_tpu.sweep.pallas_grid_zoom import (
        grid_sweep_warm_fused, grid_sweep_inputs)

    dims, dims_c, fieldZ, fieldZc, geo = grid_sweep_inputs(shape.grid)
    durs = traj.durations
    starts = jnp.cumsum(durs) - durs
    t_star, d_star, grad_prel = grid_sweep_warm_fused(
        dims, dims_c, params, fieldZ, fieldZc, geo, p_eva, t_warm,
        starts, durs, traj.coeffs, coarse_n=coarse_n, rounds=refine_rounds,
        warm_window=warm_window)
    t_star = jax.lax.stop_gradient(t_star)
    pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])
    pos, vel, acc, _ = pvaj_components(traj, t_star, n_orders=3)
    x3, R = pose_components(pos, vel, acc, params)
    rx, ry, rz = rel_components(pw, x3, R)
    d0 = jax.lax.stop_gradient(d_star)
    g0 = jax.lax.stop_gradient(grad_prel)
    r0 = tuple(jax.lax.stop_gradient(r) for r in (rx, ry, rz))
    sdf_star = (d0 + g0[:, 0] * (rx - r0[0]) + g0[:, 1] * (ry - r0[1])
                + g0[:, 2] * (rz - r0[2]))
    return sdf_star, t_star, grad_prel


def _sweep_fused(shape, traj, params, p_eva, t_warm, coarse_n, refine_rounds,
                 warm_window):
    """Fused-kernel warm sweep: one Pallas launch + one differentiable
    re-evaluation at t* (envelope theorem)."""
    from isdf_tpu.sweep.fast_eval import sdf_at_time_c
    from isdf_tpu.sweep.pallas_zoom import sweep_warm_fused

    total = traj.total_duration
    ts = jnp.linspace(0.0, total, coarse_n)
    xs, Rs = traj_states(traj, params, ts)
    pose = jnp.concatenate([xs, Rs.reshape(-1, 9)], axis=1)
    durs = traj.durations
    starts = jnp.cumsum(durs) - durs
    t_star, _, grad_prel = sweep_warm_fused(
        shape, params, p_eva, t_warm, pose, starts, durs, traj.coeffs,
        coarse_n=coarse_n, rounds=refine_rounds, warm_window=warm_window,
    )
    pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])
    sdf_star = sdf_at_time_c(shape, traj, params, pw, t_star)
    return sdf_star, t_star, grad_prel


@partial(jax.jit,
         static_argnames=("shape", "params", "coarse_n", "refine_rounds",
                          "use_pallas"))
def sweep_sdf(
    shape,
    traj,
    params: fl.FlatParams,
    p_eva,
    coarse_n: int = 128,
    refine_rounds: int = 24,
    use_pallas: Optional[bool] = None,
):
    """Swept-volume SDF for a batch of points (cold start).

    Returns (sdf_star (P,), t_star (P,), grad_prel (P,3)); t_star is
    stop-gradiented.  use_pallas: None = auto (fused Pallas sweep for
    analytic shapes on TPU, Pallas coarse scan for grid shapes on TPU,
    XLA otherwise).
    """
    if _fused_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        # cold start = warm sweep seeded at t=0; the coarse branch provides
        # the global argmin, the warm branch costs one redundant zoom.
        return _sweep_fused(
            shape, traj, params, p_eva, jnp.zeros(p_eva.shape[:1],
                                                  p_eva.dtype),
            coarse_n, refine_rounds, 0.3)
    if _grid_fused_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        # cold path (audits, first solve iteration): the fused kernel
        # supplies t*; the VALUE is re-evaluated f32 through the XLA
        # interpolation — audits must not carry the kernel's bf16 field
        # quantization (PlannerManager._audit_sdf margins are millimetres)
        from isdf_tpu.sweep.fast_eval import sdf_at_time_c

        t_star, _, _ = _grid_sweep_fused(
            shape, traj, params, p_eva,
            jnp.zeros(p_eva.shape[:1], p_eva.dtype),
            coarse_n, refine_rounds, 0.3)
        pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])
        sdf_star = sdf_at_time_c(shape, traj, params, pw, t_star)
        grad_prel = _grad_prel(shape, traj, params, p_eva, t_star)
        return sdf_star, t_star, grad_prel
    if _grid_pooled_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        return _grid_sweep_pooled(
            shape, traj, params, p_eva,
            jnp.zeros(p_eva.shape[:1], p_eva.dtype),
            coarse_n, refine_rounds, 0.3)
    total = traj.total_duration
    ts = jnp.linspace(0.0, total, coarse_n)
    xs, Rs = traj_states(traj, params, ts)
    t0, _ = _coarse_seed(shape, p_eva, xs, Rs, ts, use_pallas)
    w0 = total / (coarse_n - 1)
    t_star, sdf_star = _zoom(shape, traj, params, p_eva, t0, w0, refine_rounds)
    t_star = jax.lax.stop_gradient(t_star)
    grad_prel = _grad_prel(shape, traj, params, p_eva, t_star)
    return sdf_star, t_star, grad_prel


@partial(jax.jit,
         static_argnames=("shape", "params", "coarse_n", "refine_rounds",
                          "warm_window", "use_pallas"))
def sweep_sdf_warm(
    shape,
    traj,
    params: fl.FlatParams,
    p_eva,
    t_warm,
    coarse_n: int = 64,
    refine_rounds: int = 16,
    warm_window: float = 0.3,
    use_pallas: Optional[bool] = None,
):
    """Warm-started swept SDF: zoom around t_warm AND re-scan coarsely; the
    deeper minimum wins (guards against topology changes between outer
    iterations — the reference's candidate-interval logic).

    TPU analytic shapes dispatch to the fully-fused Pallas kernel (coarse
    scan + both zooms + pick + gradient in ONE launch, pallas_zoom.py —
    measured 9.4× the r02 XLA path).  The XLA fallback runs the two
    refinements as two SEQUENTIAL P-point zooms, not one stacked 2P call:
    measured on TPU v5e (BASELINE.md "sweep kernel measurements"), the
    zoom's per-round cost scales with the working set, so stacking halves
    throughput (the r02 regression)."""
    if _fused_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        return _sweep_fused(shape, traj, params, p_eva, t_warm,
                            coarse_n, refine_rounds, warm_window)
    if _grid_fused_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        return _grid_sweep_fused(shape, traj, params, p_eva, t_warm,
                                 coarse_n, refine_rounds, warm_window)
    if _grid_pooled_ok(shape, params, use_pallas) and coarse_n % 8 == 0:
        return _grid_sweep_pooled(shape, traj, params, p_eva, t_warm,
                                  coarse_n, refine_rounds, warm_window)
    total = traj.total_duration
    ts = jnp.linspace(0.0, total, coarse_n)
    xs, Rs = traj_states(traj, params, ts)
    t0_coarse, _ = _coarse_seed(shape, p_eva, xs, Rs, ts, use_pallas)

    tA, dA = _zoom(shape, traj, params, p_eva,
                   jnp.clip(t_warm, 0.0, total), warm_window, refine_rounds)
    tB, dB = _zoom(shape, traj, params, p_eva, t0_coarse,
                   total / (coarse_n - 1), refine_rounds)
    use_a = dA <= dB
    t_star = jax.lax.stop_gradient(jnp.where(use_a, tA, tB))
    sdf_star = jnp.where(use_a, dA, dB)
    grad_prel = _grad_prel(shape, traj, params, p_eva, t_star)
    return sdf_star, t_star, grad_prel


def _grad_prel(shape, traj, params, p_eva, t_star):
    """∂SDF/∂p_rel at the argmin pose (ref getGradPrelAtTimeStamp,
    sw_manager.hpp:566-572)."""
    from isdf_tpu.sweep.fast_eval import (
        pvaj_components, pose_components, rel_components)

    pos, vel, acc, _ = pvaj_components(traj, t_star, n_orders=3)
    x3, R = pose_components(pos, vel, acc, params)
    pw = (p_eva[:, 0], p_eva[:, 1], p_eva[:, 2])
    gx, gy, gz = shape.grad3(*rel_components(pw, x3, R))
    return jnp.stack([gx, gy, gz], axis=-1)


def sweep_sdf_dot(shape, traj, params: fl.FlatParams, p_eva, t):
    """Analytic dSDF/dt at fixed world point — one jvp in t (replaces the
    120-line inlined chain of sw_manager.hpp:593-662)."""
    f = lambda tt: sdf_at_time(shape, traj, params, p_eva, tt)
    _, dot = jax.jvp(f, (t,), (jnp.ones_like(t),))
    return dot
