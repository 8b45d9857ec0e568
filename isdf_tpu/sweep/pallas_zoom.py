"""Pallas TPU kernel: fused swept-SDF interval-zoom refinement.

The zoom (sweep_sdf._zoom) is the sweep engine's hot loop: ``rounds`` times,
evaluate the body SDF at k time candidates per query point and re-center on
the plateau-centered argmin.  The XLA path dispatches each round as a chain
of small elementwise kernels whose fixed costs dominate at the (k, P) sizes
involved (measured ~10× off the VPU roofline, BASELINE.md "sweep kernel
measurements").  This kernel fuses ALL rounds into one program: a block of
query points stays resident in VMEM/vector registers from seed to converged
t*; the piecewise-polynomial evaluation (Horner per piece, coefficients in
SMEM), the flatness tilt pose, the p_rel transform, and the analytic
component-form SDF (shape.sdf3) are traced INLINE into the kernel — the
same single-source primitives as the XLA path (shapes/primitives.py).

Only t* is produced (the argmin time is envelope-theorem non-differentiable
by construction — ref back_end_optimizer.hpp:827 treats it constant);
callers re-evaluate SDF(p, t*) differentiably outside, so autodiff never
needs to traverse the kernel.

Ref for behavior: sw_manager.hpp:1000-1062 gradientDescent (the
data-dependent refinement this fixed-round zoom replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isdf_tpu.core import flatness as fl

P_BLK = 2048  # lanes per block; (k, P_BLK) f32 tiles ≈ 64 KiB in VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _load_coeff_tables(coeff_at, N: int, n_coef: int):
    """Read all polynomial coefficients from SMEM ONCE and fold the
    derivative factorials — hoisted out of the zoom rounds so the scalar
    unit doesn't redo 100+ loads and scalar multiplies per round.

    ``coeff_at(n, k, ax)`` reads one scalar (ref access or array index).
    Returns cd_tab[n][ax][d] = list of Horner coefficients (0-d tracers)."""
    tab = []
    for n in range(N):
        per_ax = []
        for ax in range(3):
            c = [coeff_at(n, kk, ax) for kk in range(n_coef)]
            per_d = []
            for d in range(3):
                if d >= n_coef:
                    per_d.append(None)
                elif d == 0:
                    per_d.append(c)
                else:
                    per_d.append(
                        [c[kk] * _fact_ratio(kk, d)
                         for kk in range(d, n_coef)]
                    )
            per_ax.append(per_d)
        tab.append(per_ax)
    return tab


def _pvaj_rows(starts, durs, cum, cd_tab, t):
    """Component pos/vel/acc at times t (k, B) — Horner per piece, unrolled;
    coefficients pre-loaded by :func:`_load_coeff_tables`."""
    N = len(starts)
    idx = jnp.zeros(t.shape, jnp.int32)
    for n in range(N - 1):
        idx = idx + (t > cum[n]).astype(jnp.int32)

    pos = [None] * 3
    vel = [None] * 3
    acc = [None] * 3
    for n in range(N):
        sel = idx == n
        s = jnp.clip(t - starts[n], 0.0, durs[n])
        for ax in range(3):
            for d, out in enumerate((pos, vel, acc)):
                cd = cd_tab[n][ax][d]
                if cd is None:
                    continue
                h = cd[-1] * jnp.ones_like(s)
                for kk in range(len(cd) - 2, -1, -1):
                    h = h * s + cd[kk]
                term = jnp.where(sel, h, 0.0)
                out[ax] = term if out[ax] is None else out[ax] + term
    return tuple(pos), tuple(vel), tuple(acc)


def _fact_ratio(k: int, d: int) -> float:
    r = 1.0
    for j in range(k, k - d, -1):
        r *= j
    return r


def _plateau_rows(d, cand, k: int, tie_eps: float = 1e-4):
    """Plateau-centered argmin over the (static) candidate rows of (k, B)
    arrays — unrolled twin of sweep_sdf._plateau_argmin0."""
    rows_d = [d[i:i + 1, :] for i in range(k)]
    rows_c = [cand[i:i + 1, :] for i in range(k)]
    dmin = rows_d[0]
    for r in rows_d[1:]:
        dmin = jnp.minimum(dmin, r)
    eps = tie_eps * jnp.maximum(1.0, jnp.abs(dmin))
    tie = [r <= dmin + eps for r in rows_d]
    # first index attaining the min
    j = jnp.zeros_like(dmin)
    found = jnp.zeros_like(dmin, dtype=bool)
    for i in range(k):
        hit = tie[i] & (rows_d[i] <= dmin) & (~found)
        j = jnp.where(hit, float(i), j)
        found = found | hit
    # connectivity to j (ties only count while contiguous with the argmin).
    # Pure logical ops — Mosaic rejects boolean selects with literal arms.
    run = tie[0] | (j > 0.0)
    conn_r = [run]
    for i in range(1, k):
        run = run & (tie[i] | (j >= float(i)))
        conn_r.append(run)
    run = tie[k - 1] | (j < float(k - 1))
    conn_l = [None] * k
    conn_l[k - 1] = run
    for i in range(k - 2, -1, -1):
        run = run & (tie[i] | (j <= float(i)))
        conn_l[i] = run
    wsum = jnp.zeros_like(dmin)
    tsum = jnp.zeros_like(dmin)
    for i in range(k):
        ge = j <= float(i)                 # candidate right of (or at) argmin
        conn_i = (ge & conn_r[i]) | ((~ge) & conn_l[i])
        cf = conn_i.astype(dmin.dtype)
        wsum = wsum + cf
        tsum = tsum + cf * rows_c[i]
    return tsum / wsum, dmin


def _argmin_rows(d, cand, k: int):
    """Pairwise-tournament argmin over candidate rows — no plateau
    handling.  NOT used in the zoom loops: swapping it in for intermediate
    rounds measured +16.6% sweep throughput but broke gradient parity on
    CSG shapes (17% of points pick the wrong side of a min/max seam once
    the window has collapsed past the plateau — the final-round centering
    cannot recover what mid-zoom rounds discarded).  Kept for callers that
    genuinely only need a cheap minimum, with this warning attached."""
    rows = [(d[i:i + 1, :], cand[i:i + 1, :]) for i in range(k)]
    while len(rows) > 1:
        nxt = []
        rest = rows[1:] if len(rows) % 2 else rows
        carry = [] if len(rows) % 2 == 0 else [rows[0]]
        for a, b in zip(rest[::2], rest[1::2]):
            better = b[0] < a[0]
            nxt.append((jnp.minimum(a[0], b[0]),
                        jnp.where(better, b[1], a[1])))
        rows = carry + nxt
    return rows[0][1], rows[0][0]


def _make_kernel(shape, params, rounds: int, k: int, N: int, n_coef: int):
    sdf3 = shape.sdf3_fn()

    def kernel(pts_ref, t0_ref, w0_ref, starts_ref, durs_ref, coeffs_ref,
               tstar_ref):
        dtype = t0_ref.dtype
        blk = t0_ref.shape[1]
        px = pts_ref[0:1, :]
        py = pts_ref[1:2, :]
        pz = pts_ref[2:3, :]
        starts = [starts_ref[n] for n in range(N)]
        durs = [durs_ref[n] for n in range(N)]
        cum = []
        acc_t = None
        for n in range(N):
            acc_t = durs[n] if acc_t is None else acc_t + durs[n]
            cum.append(acc_t)
        total = cum[N - 1]
        cd_tab = _load_coeff_tables(
            lambda n, kk, ax: coeffs_ref[n, kk, ax], N, n_coef)

        ioff = jax.lax.broadcasted_iota(jnp.int32, (k, blk), 0).astype(dtype)
        offs = ioff * (2.0 / (k - 1)) - 1.0

        from isdf_tpu.sweep.fast_eval import pose_components, rel_components

        t = t0_ref[:]                                   # (1, B)
        w = w0_ref[:]
        shrink = 2.0 / (k - 1)
        for _ in range(rounds):
            cand = jnp.clip(t + w * offs, 0.0, total)   # (k, B)
            pos, vel, acc = _pvaj_rows(starts, durs, cum, cd_tab, cand)
            x3, R = pose_components(pos, vel, acc, params)
            prel = rel_components((px, py, pz), x3, R)
            d = sdf3(*prel)                             # (k, B)
            t, _ = _plateau_rows(d, cand, k)
            w = w * shrink
        tstar_ref[:] = t

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("shape", "params", "rounds", "k", "interpret"),
)
def zoom_refine(shape, params, pts, t0, w0, starts, durs, coeffs,
                rounds: int = 12, k: int = 8, interpret: bool = False):
    """Fused zoom: (pts (P,3), t0 (P,), w0 (P,)) → t* (P,).

    ``shape``/``params`` are static (their float fields bake into the traced
    kernel); trajectory data (starts, durs (N,), coeffs (N, n_coef, 3)) are
    runtime inputs read from SMEM.  Inputs are stop-gradiented — only the
    non-differentiable argmin time leaves the kernel.
    """
    pts = jax.lax.stop_gradient(pts)
    t0 = jax.lax.stop_gradient(t0)
    w0 = jax.lax.stop_gradient(w0)
    starts = jax.lax.stop_gradient(starts).astype(jnp.float32)
    durs = jax.lax.stop_gradient(durs).astype(jnp.float32)
    coeffs = jax.lax.stop_gradient(coeffs).astype(jnp.float32)

    dtype = t0.dtype
    P = pts.shape[0]
    N = durs.shape[0]
    n_coef = coeffs.shape[1]
    Pp = _round_up(max(P, P_BLK), P_BLK)
    ptsT = pts.astype(jnp.float32).T                    # (3, P)
    if Pp != P:
        pad = Pp - P
        ptsT = jnp.pad(ptsT, ((0, 0), (0, pad)))
        t0 = jnp.pad(t0.astype(jnp.float32), (0, pad))
        w0 = jnp.pad(w0.astype(jnp.float32), (0, pad), constant_values=1.0)
    else:
        t0 = t0.astype(jnp.float32)
        w0 = w0.astype(jnp.float32)

    kern = _make_kernel(shape, params, rounds, k, N, n_coef)
    out = pl.pallas_call(
        kern,
        grid=(Pp // P_BLK,),
        in_specs=[
            pl.BlockSpec((3, P_BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, n_coef, 3), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, P_BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        interpret=interpret,
    )(ptsT, t0[None, :], w0[None, :], starts, durs, coeffs)
    return out[0, :P].astype(dtype)


def zoom_available(shape, params) -> bool:
    """The fused kernel handles analytic (gather-free) shapes; grid-backed
    shapes keep the XLA/pallas_grid path."""
    return shape.grid is None and jax.default_backend() == "tpu"


# ===========================================================================
# Fully-fused warm sweep: coarse scan + warm zoom + coarse zoom + branch
# pick + ∂SDF/∂p_rel — ONE kernel launch per sweep query batch.
#
# The coarse poses are precomputed by XLA into a tiny (T, 12) table
# [x | R row-major] (the flatness chain at T timestamps is negligible) and
# read from SMEM; everything per-point stays in VMEM.  Callers re-evaluate
# SDF(p, t*) differentiably outside (envelope theorem) — the kernel's SDF
# values only steer the argmin and the A/B branch pick.
# ===========================================================================


def _iota_col_select(at, base: int, col: int, ioff8, n_rows: int):
    """(8, 1) column whose row i holds at(base + i, col) (SMEM scalars)."""
    out = None
    for i in range(n_rows):
        v = at(base + i, col)
        term = jnp.where(ioff8 == i, v, 0.0)
        out = term if out is None else out + term
    return out


def _make_sweep_kernel(shape, params, coarse_n: int, rounds: int, k: int,
                       N: int, n_coef: int, warm_window: float,
                       lead: int = 0):
    """``lead`` leading singleton block dims (1 when scenario-batched: the
    grid's scenario axis selects per-scenario SMEM tables)."""
    sdf3 = shape.sdf3_fn()
    from isdf_tpu.sweep.fast_eval import pose_components, rel_components

    def kernel(pts_ref, twarm_ref, pose_ref, starts_ref, durs_ref,
               coeffs_ref, tstar_ref, dstar_ref, grad_ref):
        dtype = twarm_ref.dtype
        blk = twarm_ref.shape[-1]
        pts2 = pts_ref[...].reshape(3, blk)
        px = pts2[0:1, :]
        py = pts2[1:2, :]
        pz = pts2[2:3, :]
        twarm = twarm_ref[...].reshape(1, blk)
        # index prefixes: leading singleton block dims (scenario-batched
        # launches carry extra leading 1s on each ref)
        zp = (0,) * (pose_ref.ndim - 2)
        zs = (0,) * (starts_ref.ndim - 1)
        zc = (0,) * (coeffs_ref.ndim - 3)
        pose_at = lambda r, c: pose_ref[zp + (r, c)]
        starts = [starts_ref[zs + (n,)] for n in range(N)]
        durs = [durs_ref[zs + (n,)] for n in range(N)]
        cum = []
        acc_t = None
        for n in range(N):
            acc_t = durs[n] if acc_t is None else acc_t + durs[n]
            cum.append(acc_t)
        total = cum[N - 1]
        cd_tab = _load_coeff_tables(
            lambda n, kk, ax: coeffs_ref[zc + (n, kk, ax)], N, n_coef)

        ioff8 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
        ioff = ioff8.astype(dtype)
        offs = jnp.broadcast_to(ioff * (2.0 / (k - 1)) - 1.0, (k, blk))

        # ---- coarse scan over the SMEM pose table --------------------------
        step = total / (coarse_n - 1)
        dmin = None
        tmin = None
        for g in range(coarse_n // k):
            tcol = (ioff + float(g * k)) * step          # (k, 1)
            x3 = tuple(
                _iota_col_select(pose_at, g * k, j, ioff8, k)
                for j in range(3)
            )
            R = tuple(
                _iota_col_select(pose_at, g * k, 3 + j, ioff8, k)
                for j in range(9)
            )
            prel = rel_components((px, py, pz), x3, R)
            d = sdf3(*prel)                              # (k, B)
            tt = jnp.broadcast_to(tcol, d.shape)
            if dmin is None:
                dmin, tmin = d, tt
            else:
                better = d < dmin
                dmin = jnp.where(better, d, dmin)
                tmin = jnp.where(better, tt, tmin)
        # reduce the k sublane rows → (1, B)
        d0 = dmin[0:1, :]
        t0 = tmin[0:1, :]
        for i in range(1, k):
            di = dmin[i:i + 1, :]
            better = di < d0
            t0 = jnp.where(better, tmin[i:i + 1, :], t0)
            d0 = jnp.where(better, di, d0)

        # ---- zoom helper ---------------------------------------------------
        def zoom(t, w):
            for _ in range(rounds):
                cand = jnp.clip(t + w * offs, 0.0, total)
                pos, vel, acc = _pvaj_rows(starts, durs, cum, cd_tab, cand)
                x3, R = pose_components(pos, vel, acc, params)
                prel = rel_components((px, py, pz), x3, R)
                d = sdf3(*prel)
                t, dm = _plateau_rows(d, cand, k)
                w = w * (2.0 / (k - 1))
            return t, dm

        tA, dA = zoom(jnp.clip(twarm, 0.0, total),
                      jnp.full((1, blk), warm_window, dtype))
        tB, dB = zoom(t0, jnp.full((1, blk), step, dtype))

        use_a = dA <= dB
        t_star = jnp.where(use_a, tA, tB)
        d_star = jnp.where(use_a, dA, dB)

        # ---- ∂SDF/∂p_rel at t* (ref getGradPrelAtTimeStamp) ---------------
        pos, vel, acc = _pvaj_rows(starts, durs, cum, cd_tab, t_star)
        x3, R = pose_components(pos, vel, acc, params)
        prel = rel_components((px, py, pz), x3, R)
        gx, gy, gz = jax.grad(
            lambda a, b, c: jnp.sum(sdf3(a, b, c)), argnums=(0, 1, 2)
        )(*prel)

        tstar_ref[...] = t_star.reshape(tstar_ref.shape)
        dstar_ref[...] = d_star.reshape(dstar_ref.shape)
        grad_ref[...] = jnp.concatenate([gx, gy, gz], axis=0).reshape(
            grad_ref.shape)

    return kernel


@functools.lru_cache(maxsize=None)
def _fused_callable(shape, params, coarse_n, rounds, k, warm_window,
                    N, n_coef, interpret, blk=P_BLK):
    """custom_vmap'd pallas invocation for one static configuration.

    Under jax.vmap (the scenario-batched solver) the kernel cannot be
    auto-batched (per-scenario SMEM tables violate block tiling rules), so
    the vmap rule dispatches to a natively scenario-batched launch whose
    grid is (B, point-blocks) and whose index maps select each scenario's
    pose/coefficient tables.
    """

    def _single(ptsT, tw, pose, starts, durs, coeffs):
        Pp = ptsT.shape[-1]
        kern = _make_sweep_kernel(
            shape, params, coarse_n, rounds, k, N, n_coef, warm_window,
            lead=0)
        return pl.pallas_call(
            kern,
            grid=(Pp // blk,),
            in_specs=[
                pl.BlockSpec((3, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((coarse_n, 12), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N, n_coef, 3), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, Pp), jnp.float32),
                jax.ShapeDtypeStruct((1, Pp), jnp.float32),
                jax.ShapeDtypeStruct((3, Pp), jnp.float32),
            ),
            interpret=interpret,
        )(ptsT, tw, pose, starts, durs, coeffs)

    def _batched(ptsT, tw, pose, starts, durs, coeffs):
        B = ptsT.shape[0]
        Pp = ptsT.shape[-1]
        starts = starts.reshape(B, 1, N)
        durs = durs.reshape(B, 1, N)
        kern = _make_sweep_kernel(
            shape, params, coarse_n, rounds, k, N, n_coef, warm_window,
            lead=1)
        return pl.pallas_call(
            kern,
            grid=(B, Pp // blk),
            in_specs=[
                pl.BlockSpec((1, 3, blk), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, blk), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, coarse_n, 12), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, N, n_coef, 3), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, blk), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, blk), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, blk), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                jax.ShapeDtypeStruct((B, 3, Pp), jnp.float32),
            ),
            interpret=interpret,
        )(ptsT, tw, pose, starts, durs, coeffs)

    @jax.custom_batching.custom_vmap
    def call(ptsT, tw, pose, starts, durs, coeffs):
        return _single(ptsT, tw, pose, starts, durs, coeffs)

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        out = _batched(*args)
        return out, (True, True, True)

    return call


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "params", "coarse_n", "rounds", "k", "warm_window",
        "interpret",
    ),
)
def sweep_warm_fused(shape, params, pts, t_warm, pose_table, starts, durs,
                     coeffs, coarse_n: int = 64, rounds: int = 12,
                     k: int = 8, warm_window: float = 0.3,
                     interpret: bool = False):
    """Fused warm sweep → (t* (P,), d* (P,), grad_prel (P, 3)).

    d* is the kernel's non-differentiable SDF at t* (used for branch picks
    and diagnostics); differentiable values must be re-evaluated outside.
    pose_table: (coarse_n, 12) rows [x, y, z, R00..R22] at the uniform
    coarse timestamps (from sweep_sdf.traj_states).  Supports one level of
    jax.vmap (scenario batching) via a native batched launch.
    """
    pts = jax.lax.stop_gradient(pts)
    t_warm = jax.lax.stop_gradient(t_warm)
    pose_table = jax.lax.stop_gradient(pose_table).astype(jnp.float32)
    starts = jax.lax.stop_gradient(starts).astype(jnp.float32)
    durs = jax.lax.stop_gradient(durs).astype(jnp.float32)
    coeffs = jax.lax.stop_gradient(coeffs).astype(jnp.float32)
    assert coarse_n % k == 0, "coarse_n must be a multiple of k"

    dtype = t_warm.dtype
    P = pts.shape[0]
    N = durs.shape[0]
    n_coef = coeffs.shape[1]
    # block size adapts to small point batches (e.g. per-scenario P=512)
    # instead of padding every scenario to the full 2048-lane block
    blk = min(P_BLK, _round_up(P, 128))
    Pp = _round_up(max(P, blk), blk)
    ptsT = pts.astype(jnp.float32).T
    tw = t_warm.astype(jnp.float32)
    if Pp != P:
        pad = Pp - P
        ptsT = jnp.pad(ptsT, ((0, 0), (0, pad)))
        tw = jnp.pad(tw, (0, pad))

    call = _fused_callable(shape, params, coarse_n, rounds, k, warm_window,
                           N, n_coef, interpret, blk)
    t_star, d_star, grad = call(ptsT, tw[None, :], pose_table, starts, durs,
                                coeffs)
    return (
        t_star[0, :P].astype(dtype),
        d_star[0, :P].astype(dtype),
        grad[:, :P].T.astype(dtype),
    )
