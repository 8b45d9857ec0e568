"""Pallas TPU kernel: the fully-fused grid (mesh-robot) warm sweep.

The analytic fused sweep (pallas_zoom.py) cannot serve mesh robots — their
SDF is a baked voxel grid and vectorized gathers don't exist on TPU (the
XLA gather path measured 0.06M queries/s, BASELINE.md "grid-shape sweep").
``grid_sweep_warm_fused`` is the production path: coarse scan (on a
2×-min-pooled twin field) + warm zoom + coarse zoom + f32-weight epilogue
(value + analytic trilinear ∂SDF/∂p_rel) in ONE launch, with trilinear
lookup recast as gather-free two-hot algebra:

  per candidate column-block (queries in lanes):
    wxy (NxP·NyP, B)  (x,y)-pair two-hot weight — outer product of two
                      tents, ONE VPU pass                   (bf16)
    A = fieldZ @ wxy → (NzP, B)  z-slab values              (MXU, bf16)
    d = Σ_z A · wz(z, B)  tiny z pick                       (VPU)

Perf history (each step measured on TPU v5e, BASELINE.md "grid-shape
sweep"): r4 — per-candidate x-slab kernels 0.32M q/s → bf16 0.32M (MXU
was not the bottleneck) → single launch + broadcast-tent pick 0.63M →
Z-major pair contraction 0.99M → pooled coarse 1.16M.  r5 — the kernel is
MXU-bound on the dense two-hot products, so eval count is the cost:
seed-pick single deep zoom (replacing the dual full-depth zoom) 1.71M →
zoom fan-out k=4 (per-round shrink 2/3 instead of 2/7; final window
(2/3)^12 ≈ 0.008·w0 is still far sub-voxel) 2.51M.

The trajectory pose chain runs in the same (k, B) lanes layout as the
analytic kernel (pvaj Horner from SMEM + flatness tilt).  The zoom's bf16
values steer the argmin; the epilogue re-evaluates at t* with f32 weights
and emits the analytic gradient, which callers consume by linearization
(the reference's own (sdf_value, gradp_rel) pattern,
back_end_optimizer.hpp:619-627).

Ref for behavior: sw_manager.hpp:677-747 getSDFofSweptVolume +
1000-1062 gradientDescent + Shape.hpp:481-600 getonlySDFNum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isdf_tpu.sweep.pallas_zoom import (
    _load_coeff_tables, _pvaj_rows, _plateau_rows, _round_up)
from isdf_tpu.sweep.fast_eval import pose_components, rel_components

B_PTS = 256  # query lanes per block


# ===========================================================================
# Fully-fused grid warm sweep: coarse scan + warm zoom + coarse zoom + pick
# + f32-weight epilogue (value + ∂SDF/∂p_rel) — ONE kernel launch, the grid
# twin of pallas_zoom.sweep_warm_fused (round-4 rebuild; VERDICT r3 #3).
#
# Layout: the field is stored Z-MAJOR, (nzp, nxp·nyp) — the MXU contracts
# the two-hot (x, y) PAIR weight wxy (nxp·nyp, B) against it, producing a
# tiny (nzp, B) column of z-slab values per candidate; the z pick is then
# ~3 VPU passes over (nzp, B) — 64× smaller than the (y,z)-pick of the
# r3 kernels, which was the measured bottleneck (the MXU product, not the
# pick, is now the dominant per-eval cost).  wxy itself is built in ONE
# (M, B)-sized pass: outer product of two small tents via 3-D broadcast.
# Everything (coarse + 2·rounds zoom + epilogue) shares one launch; the
# epilogue computes value + analytic trilinear gradient (3 weight builds,
# one concatenated matmul) so no gather-based re-evaluation exists outside.
# ===========================================================================


def _tent(iota_f, g):
    """Trilinear weight row: w(i) = max(0, 1 − |i − g|) — the exact two-hot
    (1−f at i0, f at i0+1) without integer index construction."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - g))


def _make_grid_sweep_kernel(params, coarse_n, rounds, k, N, n_coef,
                            dims, dims_c, warm_window):
    nx, ny, nz, nxp, nyp, nzp = dims
    nxc, nyc, nzc, nxpc, nypc, nzpc = dims_c

    def kernel(pts_ref, twarm_ref, starts_ref, durs_ref, coeffs_ref,
               geo_ref, fieldZ_ref, fieldZc_ref, tstar_ref, dstar_ref,
               grad_ref):
        dtype = twarm_ref.dtype
        blk = twarm_ref.shape[-1]
        pts2 = pts_ref[...].reshape(3, blk)
        px = pts2[0:1, :]
        py = pts2[1:2, :]
        pz = pts2[2:3, :]
        twarm = twarm_ref[...].reshape(1, blk)
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
        ox, oy, oz, inv_res, res = (geo_ref[i] for i in range(5))
        oxc, oyc, ozc, inv_res_c, res_c = (geo_ref[5 + i] for i in range(5))

        # coarse-scan group size decoupled from the zoom fan-out k: the
        # scan wants wide groups (fewer pose-chain evaluations per sample),
        # the zoom wants narrow ones (fewer MXU evals per round)
        kc = 8
        ioff_c = jax.lax.broadcasted_iota(
            jnp.int32, (kc, blk), 0).astype(dtype)
        offs = jax.lax.broadcasted_iota(
            jnp.int32, (k, blk), 0).astype(dtype) * (2.0 / (k - 1)) - 1.0

        def clampg(g, n):
            return jnp.clip(g, 0.0, (n - 1) - 1e-5)

        def over(g, n):
            return jnp.maximum(g - (n - 1), 0.0) + jnp.minimum(g, 0.0)

        def rel_of(cand):
            """p_rel components at candidate rows (rows, blk)."""
            pos, vel, acc = _pvaj_rows(starts, durs, cum, cd_tab, cand)
            x3, R = pose_components(pos, vel, acc, params)
            return rel_components((px, py, pz), x3, R)

        def make_interp(field_ref, d6):
            """Z-major trilinear evaluator for one field resolution."""
            inx, iny, inz, ixp, iyp, izp = d6
            M = ixp * iyp
            x_iota = jax.lax.broadcasted_iota(
                jnp.int32, (ixp, 1, blk), 0).astype(dtype)
            y_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, iyp, blk), 1).astype(dtype)
            z_iota = jax.lax.broadcasted_iota(
                jnp.int32, (izp, blk), 0).astype(dtype)

            def wxy_of(gxc, gyc):
                # outer product of two tents via 3-D broadcast — ONE pass
                # over (M, B)
                wx = _tent(x_iota, gxc.reshape(1, 1, blk))
                wy = _tent(y_iota, gyc.reshape(1, 1, blk))
                return (wx * wy).astype(jnp.bfloat16).reshape(M, blk)

            def interp_one(gx, gy, gz, rres):
                gxc = clampg(gx, inx)
                gyc = clampg(gy, iny)
                gzc = clampg(gz, inz)
                A = jax.lax.dot_general(
                    field_ref[...], wxy_of(gxc, gyc),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (izp, B)
                wz = _tent(z_iota, gzc)                    # (izp, B)
                inner = jnp.sum(A * wz, axis=0, keepdims=True)
                ov2 = (over(gx, inx) ** 2 + over(gy, iny) ** 2
                       + over(gz, inz) ** 2)
                outside = jnp.sqrt(ov2 * (rres * rres) + 1e-12)
                return inner + outside

            return x_iota, y_iota, z_iota, wxy_of, interp_one

        dims = (nx, ny, nz, nxp, nyp, nzp)
        dims_c = (nxc, nyc, nzc, nxpc, nypc, nzpc)
        M = nxp * nyp
        (x_iota, y_iota, z_iota, wxy_of, interp_one) = make_interp(
            fieldZ_ref, dims)
        (_, _, _, _, interp_one_c) = make_interp(fieldZc_ref, dims_c)

        def grid_coords(cand):
            rx, ry, rz = rel_of(cand)
            return ((rx - ox) * inv_res, (ry - oy) * inv_res,
                    (rz - oz) * inv_res)

        def grid_eval(cand):
            gx, gy, gz = grid_coords(cand)
            rows = gx.shape[0]
            d_rows = [
                interp_one(gx[c:c + 1, :], gy[c:c + 1, :], gz[c:c + 1, :],
                           res)
                for c in range(rows)
            ]
            return jnp.concatenate(d_rows, axis=0) if rows > 1 else d_rows[0]

        def grid_eval_coarse(cand):
            """Seed-steering evaluation on the min-pooled half-res field —
            ~8× cheaper; conservative (pooled min ≤ true), so crossing dips
            survive.  The zoom then refines on the TRUE field."""
            rx, ry, rz = rel_of(cand)
            gx = (rx - oxc) * inv_res_c
            gy = (ry - oyc) * inv_res_c
            gz = (rz - ozc) * inv_res_c
            rows = gx.shape[0]
            d_rows = [
                interp_one_c(gx[c:c + 1, :], gy[c:c + 1, :],
                             gz[c:c + 1, :], res_c)
                for c in range(rows)
            ]
            return jnp.concatenate(d_rows, axis=0) if rows > 1 else d_rows[0]

        # ---- coarse scan (k rows per group, poses in-kernel) ---------------
        step = total / (coarse_n - 1)
        dmin = None
        tmin = None
        for g in range(max(coarse_n // kc, 1)):
            tcol = jnp.clip((ioff_c + float(g * kc)) * step, 0.0, total)
            d = grid_eval_coarse(tcol)
            if dmin is None:
                dmin, tmin = d, tcol
            else:
                better = d < dmin
                dmin = jnp.where(better, d, dmin)
                tmin = jnp.where(better, tcol, tmin)
        d0 = dmin[0:1, :]
        t0 = tmin[0:1, :]
        for i in range(1, kc):
            di = dmin[i:i + 1, :]
            better = di < d0
            t0 = jnp.where(better, tmin[i:i + 1, :], t0)
            d0 = jnp.where(better, di, d0)

        # ---- seed pick + ONE deep zoom (round-5 restructure) ---------------
        # The kernel is MXU-bound on the dense two-hot products (~63%
        # utilization measured r4), so eval count is the cost.  The r4
        # dual full-depth zoom spent 2·rounds·k evals; instead: a SHORT
        # warm pre-zoom (so a meaningful warm basin gets refined before
        # judging it), one true-field eval of the coarse argmin (its d0 is
        # a pooled lower bound — not comparable), pick the deeper seed,
        # then a single full-depth zoom.  (2+rounds)·k + 1 evals ≈ 1.7×
        # fewer.  The reference itself descends ONCE from a scanned seed
        # (sw_manager.hpp:677-747), so single-descent is the closer twin.
        shrink = 2.0 / (k - 1)

        def zoom(t, w, nr):
            dm = None
            for _ in range(nr):
                cand = jnp.clip(t + w * offs, 0.0, total)
                d = grid_eval(cand)
                t, dm = _plateau_rows(d, cand, k)
                w = w * shrink
            return t, dm

        pre = 2
        tA, dA = zoom(jnp.clip(twarm, 0.0, total),
                      jnp.full((1, blk), warm_window, dtype), pre)
        dB0 = grid_eval(t0)
        use_a = dA <= dB0
        t_seed = jnp.where(use_a, tA, t0)
        w_seed = jnp.where(use_a, warm_window * shrink ** pre, step)
        t_star, _ = zoom(t_seed, w_seed, rounds)

        # ---- epilogue: f32-weight value + analytic grad at t* --------------
        gx, gy, gz = grid_coords(t_star)
        gxc = clampg(gx, nx)
        gyc = clampg(gy, ny)
        gzc = clampg(gz, nz)
        gx3 = gxc.reshape(1, 1, blk)
        gy3 = gyc.reshape(1, 1, blk)
        wx = _tent(x_iota, gx3)
        wy = _tent(y_iota, gy3)
        # d tent/dg: −1 on the left corner, +1 on the right corner
        dwx = jnp.sign(x_iota - gx3) * (jnp.abs(x_iota - gx3) < 1.0)
        dwy = jnp.sign(y_iota - gy3) * (jnp.abs(y_iota - gy3) < 1.0)
        wcat = jnp.concatenate([
            (wx * wy).astype(jnp.bfloat16).reshape(M, blk),
            (dwx * wy).astype(jnp.bfloat16).reshape(M, blk),
            (wx * dwy).astype(jnp.bfloat16).reshape(M, blk),
        ], axis=1)                                        # (M, 3B)
        A3 = jax.lax.dot_general(
            fieldZ_ref[...], wcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (nzp, 3B)
        A = A3[:, :blk]
        Adx = A3[:, blk:2 * blk]
        Ady = A3[:, 2 * blk:]
        wz = _tent(z_iota, gzc)
        dwz = jnp.sign(z_iota - gzc) * (jnp.abs(z_iota - gzc) < 1.0)
        inner = jnp.sum(A * wz, axis=0, keepdims=True)
        di_dgx = jnp.sum(Adx * wz, axis=0, keepdims=True)
        di_dgy = jnp.sum(Ady * wz, axis=0, keepdims=True)
        di_dgz = jnp.sum(A * dwz, axis=0, keepdims=True)
        ovx = over(gx, nx)
        ovy = over(gy, ny)
        ovz = over(gz, nz)
        ov2 = ovx * ovx + ovy * ovy + ovz * ovz
        outside = jnp.sqrt(ov2 * (res * res) + 1e-12)
        d_star = inner + outside
        # inside-mask: the clamped inner value is constant in g outside
        inx = ((gx > 0.0) & (gx < (nx - 1) - 1e-5)).astype(dtype)
        iny = ((gy > 0.0) & (gy < (ny - 1) - 1e-5)).astype(dtype)
        inz = ((gz > 0.0) & (gz < (nz - 1) - 1e-5)).astype(dtype)
        oslope = (res * res) / outside
        grad_x = (di_dgx * inx + ovx * oslope) * inv_res
        grad_y = (di_dgy * iny + ovy * oslope) * inv_res
        grad_z = (di_dgz * inz + ovz * oslope) * inv_res

        tstar_ref[...] = t_star.reshape(tstar_ref.shape)
        dstar_ref[...] = d_star.reshape(dstar_ref.shape)
        grad_ref[...] = jnp.concatenate(
            [grad_x, grad_y, grad_z], axis=0).reshape(grad_ref.shape)

    return kernel


@functools.lru_cache(maxsize=None)
def _grid_sweep_callable(grid_dims, grid_dims_c, params, coarse_n, rounds,
                         k, N, n_coef, warm_window, fshape, fcshape, blk,
                         interpret):
    kern = _make_grid_sweep_kernel(
        params, coarse_n, rounds, k, N, n_coef, grid_dims, grid_dims_c,
        warm_window)

    @jax.custom_batching.sequential_vmap
    def call(ptsT, tw, starts, durs, coeffs, geo, fieldZ, fieldZc):
        Pp = ptsT.shape[-1]
        return pl.pallas_call(
            kern,
            grid=(Pp // blk,),
            in_specs=[
                pl.BlockSpec((3, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N, n_coef, 3), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((10,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec(fshape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(fcshape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
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
        )(ptsT, tw, starts, durs, coeffs, geo, fieldZ, fieldZc)

    return call


@functools.partial(
    jax.jit,
    static_argnames=("grid_dims", "grid_dims_c", "params", "coarse_n",
                     "rounds", "k", "warm_window", "interpret"),
)
def grid_sweep_warm_fused(grid_dims, grid_dims_c, params, fieldZ, fieldZc,
                          geo, pts, t_warm, starts, durs, coeffs,
                          coarse_n: int = 64, rounds: int = 12, k: int = 4,
                          warm_window: float = 0.3,
                          interpret: bool = False):
    """Fused grid warm sweep → (t* (P,), d* (P,), grad_prel (P, 3)).

    grid_dims / grid_dims_c: (nx, ny, nz, nxp, nyp, nzp) of the full and
    the min-pooled coarse fields (static).  d*/grad come from the in-kernel
    epilogue (f32 weights/accumulation over the bf16-at-rest field; ~2⁻⁸
    field quantization is the only error source) — callers build the
    differentiable penalty value by linearizing at t* exactly like the
    reference consumes (sdf_value, gradp_rel) pairs
    (back_end_optimizer.hpp:619-627 grad_cost_p_sw)."""
    pts = jax.lax.stop_gradient(pts)
    t_warm = jax.lax.stop_gradient(t_warm).astype(jnp.float32)
    starts = jax.lax.stop_gradient(starts).astype(jnp.float32)
    durs = jax.lax.stop_gradient(durs).astype(jnp.float32)
    coeffs = jax.lax.stop_gradient(coeffs).astype(jnp.float32)
    assert coarse_n % 8 == 0, "coarse_n must be a multiple of 8"

    dtype = pts.dtype
    P = pts.shape[0]
    N = durs.shape[0]
    n_coef = coeffs.shape[1]
    blk = min(B_PTS, _round_up(max(P, 128), 128))
    Pp = _round_up(max(P, blk), blk)
    ptsT = pts.astype(jnp.float32).T
    tw = t_warm
    if Pp != P:
        pad = Pp - P
        ptsT = jnp.pad(ptsT, ((0, 0), (0, pad)))
        tw = jnp.pad(tw, (0, pad))

    call = _grid_sweep_callable(
        grid_dims, grid_dims_c, params, coarse_n, rounds, k, N, n_coef,
        warm_window, fieldZ.shape, fieldZc.shape, blk, interpret)
    t_star, d_star, grad = call(ptsT, tw[None, :], starts, durs, coeffs,
                                geo, fieldZ, fieldZc)
    return (
        t_star[0, :P].astype(dtype),
        d_star[0, :P].astype(dtype),
        grad[:, :P].T.astype(dtype),
    )


# z-major field cache, keyed by the source array's identity (a ref to the
# source is kept in the value so the id cannot be recycled)
# Bounded LRU: each entry pins its source field (so id() keys can't be
# recycled while cached) plus two z-major copies — an unbounded dict would
# leak every field a long-lived process ever bakes.  Insertion-ordered
# dict; hits are refreshed to the back, the front is evicted past the cap.
_FIELDZ_CACHE = {}
_FIELDZ_CACHE_MAX = 4


def _zmajor_pad(f3):
    """(nx, ny, nz) → z-major padded (nzp, nxp·nyp) f32, plus dims6."""
    nx, ny, nz = f3.shape
    nxp = _round_up(nx, 16)             # nxp·nyp ≡ 0 (mod 128) lanes
    nyp = _round_up(ny, 8)              # sublane-aligned for the reshape
    nzp = _round_up(nz, 8)
    fz = np.zeros((nzp, nxp, nyp), np.float32)
    fz[:nz, :nx, :ny] = np.transpose(f3, (2, 0, 1))
    return (nx, ny, nz, nxp, nyp, nzp), fz.reshape(nzp, nxp * nyp)


def grid_sweep_inputs(pg):
    """(dims6, dims6_c, fieldZ, fieldZc, geo10) for grid_sweep_warm_fused.

    The field is re-laid-out Z-MAJOR, (nzp, nxp·nyp), and cast to bf16 —
    once, at rest — so the kernel's MXU contracts the (x, y)-pair two-hot
    and the VPU pick runs over the tiny (nzp, B) slab.  A 2×-min-pooled
    twin steers the coarse scan at ~1/8 the cost (conservative: pooled
    min ≤ true, crossing dips survive pooling)."""
    import ml_dtypes

    key = id(pg.field2d)
    hit = _FIELDZ_CACHE.get(key)
    if hit is not None:
        _FIELDZ_CACHE.pop(key)          # refresh LRU position
        _FIELDZ_CACHE[key] = hit
    if hit is None:
        f3 = pg.field2d.reshape(-1, pg.nyp, pg.nzp)[:pg.nx, :pg.ny, :pg.nz]
        dims, fz = _zmajor_pad(np.asarray(f3))
        # 2×2×2 min-pool (pad odd dims by edge-replication first)
        pads = [(0, (-n) % 2) for n in f3.shape]
        fe = np.pad(f3, pads, mode="edge")
        fc = fe.reshape(fe.shape[0] // 2, 2, fe.shape[1] // 2, 2,
                        fe.shape[2] // 2, 2).min(axis=(1, 3, 5))
        dims_c, fzc = _zmajor_pad(fc)
        # cache PURE NUMPY (ml_dtypes bf16): this function is reached
        # inside jit traces, where jnp array construction would capture a
        # per-trace constant (tracer-leak on reuse); numpy crosses the jit
        # boundary as an ordinary argument
        hit = (pg.field2d, dims, dims_c,
               fz.astype(ml_dtypes.bfloat16), fzc.astype(ml_dtypes.bfloat16))
        while len(_FIELDZ_CACHE) >= _FIELDZ_CACHE_MAX:
            _FIELDZ_CACHE.pop(next(iter(_FIELDZ_CACHE)))
        _FIELDZ_CACHE[key] = hit
    _, dims, dims_c, fieldZ, fieldZc = hit
    o = pg.origin
    res = pg.res
    # pooled cell i represents original voxels {2i, 2i+1}: sample point at
    # origin + (2i+0.5)·res ⇒ origin_c = origin + res/2, res_c = 2·res
    geo = np.asarray(
        [o[0], o[1], o[2], 1.0 / res, res,
         o[0] + 0.5 * res, o[1] + 0.5 * res, o[2] + 0.5 * res,
         1.0 / (2.0 * res), 2.0 * res],
        np.float32)
    return dims, dims_c, fieldZ, fieldZc, geo


# --- pooled search grids for fields beyond the VMEM budget -----------------
# (round 5; VERDICT r4 weak #3: fields >8 MiB used to fall back to the
# ~0.08M q/s scalarized-gather XLA sweep — below CPU class exactly for the
# large meshes that need help most)

_POOLED_CACHE = {}
_POOLED_CACHE_MAX = 4


def _zmajor_kernel_bytes(nx, ny, nz):
    """bf16 bytes the fused kernel holds resident for a (nx,ny,nz) field:
    the z-major padded field plus its 2x-min-pooled coarse twin."""
    def one(a, b, c):
        return -(-c // 8) * 8 * (-(-a // 16) * 16) * (-(-b // 8) * 8) * 2
    return one(nx, ny, nz) + one(-(-nx // 2), -(-ny // 2), -(-nz // 2))


def pooled_grid(pg, budget_bytes):
    """Min-pool a PaddedGrid 2× per axis repeatedly until the fused
    kernel's resident z-major inputs fit `budget_bytes`; returns a new
    PaddedGrid at the pooled resolution.

    Min-pooling is CONSERVATIVE for argmin-t steering (pooled min ≤ true:
    crossing dips survive, sw_manager.hpp choiceTInit's rough scan makes
    the same under-resolution trade at rough_dt).  Callers search t* on
    the pooled field and evaluate value/gradient on the TRUE field (one
    XLA trilinear eval per query), so only t* carries the pooled bias."""
    from isdf_tpu.sweep.pallas_grid import pad_grid

    key = (id(pg.field2d), int(budget_bytes))
    hit = _POOLED_CACHE.get(key)
    if hit is not None:
        _POOLED_CACHE.pop(key)
        _POOLED_CACHE[key] = hit
        return hit[1]
    f3 = np.asarray(
        pg.field2d.reshape(-1, pg.nyp, pg.nzp)[:pg.nx, :pg.ny, :pg.nz])
    origin = np.asarray(pg.origin, np.float64).copy()
    res = float(pg.res)
    while _zmajor_kernel_bytes(*f3.shape) > budget_bytes:
        pads = [(0, (-n) % 2) for n in f3.shape]
        fe = np.pad(f3, pads, mode="edge")
        f3 = fe.reshape(fe.shape[0] // 2, 2, fe.shape[1] // 2, 2,
                        fe.shape[2] // 2, 2).min(axis=(1, 3, 5))
        origin = origin + res / 2.0   # pooled cell center of voxels {2i,2i+1}
        res = 2.0 * res
    out = pad_grid(f3, origin, res)
    while len(_POOLED_CACHE) >= _POOLED_CACHE_MAX:
        _POOLED_CACHE.pop(next(iter(_POOLED_CACHE)))
    _POOLED_CACHE[key] = (pg.field2d, out)   # pin source: id() stays valid
    return out
