"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: swept-volume SDF point-queries per second per chip (the
argmin-over-time body-SDF query that dominates the reference's optimizer
inner loop — ref back_end_optimizer.hpp:557-649 + sw_manager.hpp:677),
reported as body-SDF evaluations/s with the SAME eval-count formula as
rounds 1/2 (coarse_n + 8·rounds + 2 per query) for cross-round
comparability.  The production path is the fused Pallas sweep kernel
(isdf_tpu/sweep/pallas_zoom.py).

vs_baseline: ratio against the reference CPU implementation MEASURED on
this host (native/parity/ref_bench.cpp — 9.96e6 evals/s, 2 cores);
vs_ref_desktop_est: against the same per-core rate extrapolated to the
README's 20-core desktop (≈1.0e8 evals/s) — the conservative comparison.

Roofline: `flops_per_query` is counted analytically from the traced
component chain (isdf_tpu/utils/flops.py — XLA cost analysis cannot see
inside Pallas kernels); `vpu_tflops` is the sustained FLOP/s and
`vpu_util` the fraction of the assumed v5e f32 VPU peak (8 sublanes × 128
lanes × 4 ALUs × 0.94 GHz ≈ 3.85 TFLOP/s; the MXU peak is irrelevant —
this workload is elementwise).  See BASELINE.md "Roofline" for the
methodology note.

Scale: `plans_scaling` reports batched back-end throughput at
B ∈ {128, 512, 2048, 4096} concurrent solves on the one chip.

Every run appends its JSON line to BENCH_history.jsonl so perf regressions
are visible run-over-run (VERDICT r2 weak #2).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

VPU_PEAK_FLOPS = 8 * 128 * 4 * 0.94e9  # assumed v5e f32 VPU peak ≈ 3.85e12


def main():
    import jax

    # ISDF_PROFILE=<dir>: capture a jax.profiler device trace of the sweep
    # section (open with TensorBoard / xprof — SURVEY §5 profiling row)
    profile_dir = os.environ.get("ISDF_PROFILE", "")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from isdf_tpu.config import Config
    from isdf_tpu.core import flatness as fl, minco
    from isdf_tpu.core.poly import PolyTraj
    from isdf_tpu.parallel import batch as pb
    from isdf_tpu.shapes import make_shape
    from isdf_tpu.sweep import sweep_sdf_warm
    from isdf_tpu.sweep.fast_eval import sdf_at_time_c
    from isdf_tpu.utils.flops import count_flops

    dev = jax.devices()[0]
    dtype = jnp.float32

    conf = Config(
        integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
        vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8,
    )
    shape = make_shape("CappedCone", conf)
    params = fl.FlatParams.from_config(conf)

    # --- build a representative trajectory -----------------------------------
    rng = np.random.default_rng(0)
    N = 6
    q = jnp.asarray(
        np.linspace(1, 9, N - 1)[:, None] * np.array([1.0, 0.3, 0.15])
        + rng.normal(scale=0.3, size=(N - 1, 3)), dtype)
    T = jnp.asarray(rng.uniform(1.2, 2.2, size=N), dtype)
    head = jnp.zeros((3, 3), dtype)
    tail = jnp.zeros((3, 3), dtype).at[:, 0].set(jnp.asarray([10.0, 3.0, 1.5], dtype))
    coeffs = minco.solve(q, T, head, tail)
    traj = PolyTraj(T, coeffs)

    # --- 1) swept SDF point-query throughput ---------------------------------
    P = 32768
    pts = jnp.asarray(rng.uniform(-1, 11, size=(P, 3)), dtype)
    t_warm = jnp.zeros((P,), dtype)

    fn = jax.jit(
        lambda p, tw: sweep_sdf_warm(
            shape, traj, params, p, tw,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
    )
    sdf, t_star, grad = fn(pts, t_warm)
    jax.block_until_ready(sdf)
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                sdf, t_star, grad = fn(pts, t_star)
            jax.block_until_ready(sdf)
    # median-of-3 repeats: single-shot timing let one tunnel hiccup become
    # the round's official record (VERDICT r4 weak #1/#4)
    iters = 20
    sweep_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            sdf, t_star, grad = fn(pts, t_star)
        jax.block_until_ready(sdf)
        sweep_dts.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(sweep_dts))
    queries_per_s = P / dt
    sweep_spread = [round(P / max(sweep_dts) / 1e6, 2),
                    round(P / min(sweep_dts) / 1e6, 2)]
    evals_per_query = conf.sweep_coarse_samples + 8 * conf.sweep_refine_rounds + 2
    sdf_evals_per_s = queries_per_s * evals_per_query

    # --- roofline: analytic FLOPs of the actual work per query ---------------
    one = jnp.ones((1,), dtype)
    flops_eval = count_flops(
        lambda t: sdf_at_time_c(shape, traj, params, (one, one, one), t), one)
    prel3 = (one, one, one)
    flops_sdf = count_flops(lambda a, b, c: shape.sdf3_fn()(a, b, c), *prel3)
    # per query: coarse scan (rel+sdf per step) + warm pre-zoom (2 rounds)
    # + seed-pick eval + ONE deep zoom (round-5 restructure,
    # pallas_zoom._make_sweep_kernel) + gradient (≈3× sdf via reverse).
    k, rounds = 8, conf.sweep_refine_rounds
    flops_query = (
        conf.sweep_coarse_samples * (15 + flops_sdf)
        + (2 + rounds) * k * flops_eval
        + 2 * flops_eval
        + (flops_eval + 3 * flops_sdf)
    )
    vpu_flops = queries_per_s * flops_query
    vpu_util = vpu_flops / VPU_PEAK_FLOPS

    # --- 2) batched plans/s scaling: B = 128 … 4096 --------------------------
    # each B point is median-of-3 (first timed rep additionally preceded by
    # a warm run): BENCH_r04 recorded a one-shot B=4096 collapse to 31% of
    # B=128 that two same-day runs could not reproduce — a single timing is
    # not a record (VERDICT r4 weak #1).  Peak host/device memory is logged
    # so a memory-pressure cause would be visible in the artifact.
    import resource

    n_pts, solve_iters, chunk = 512, 24, 8
    reps = 3
    scaling, scaling_spread = {}, {}
    for B in (128, 512, 2048, 4096):
        sb = pb.make_random_batch(conf, B=B, N=4, n_points=n_pts, dtype=dtype)
        out = pb.batched_solve_chunked(shape, conf, sb, max_iters=solve_iters,
                                       chunk=chunk)
        jax.block_until_ready(out[2])
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = pb.batched_solve_chunked(
                shape, conf, sb, max_iters=solve_iters, chunk=chunk)
            jax.block_until_ready(out[2])
            dts.append(time.perf_counter() - t0)
        scaling[str(B)] = round(B / float(np.median(dts)), 2)
        scaling_spread[str(B)] = [round(B / max(dts), 2),
                                  round(B / min(dts), 2)]
    plans_per_s = scaling["128"]
    peak_host_rss_mb = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)
    try:
        _ms = dev.memory_stats() or {}
        peak_dev_mb = round(_ms.get("peak_bytes_in_use", 0) / 1e6)
    except Exception:
        peak_dev_mb = -1

    # --- 2b) audited batched throughput: solve + high-res safety audit +
    # warm re-solve rounds (the quality class PlannerManager.plan ships —
    # the raw plans/s above skips the audit; VERDICT r3 weak #5)
    sb_a = pb.make_random_batch(conf, B=128, N=4, n_points=n_pts,
                                dtype=dtype, seed=3)
    out = pb.batched_solve_audited(shape, conf, sb_a, max_iters=solve_iters,
                                   chunk=chunk)
    jax.block_until_ready(out[2])
    t0 = time.perf_counter()
    out = pb.batched_solve_audited(shape, conf, sb_a, max_iters=solve_iters,
                                   chunk=chunk)
    jax.block_until_ready(out[2])
    plans_audited_per_s = round(128 / (time.perf_counter() - t0), 2)

    # --- 2c) grid-shape (mesh robot) sweep throughput: the slowest
    # production path — demos 5/6 run baked voxel SDFs through the fused
    # two-hot grid kernel (VERDICT r3 #3) -------------------------------------
    from isdf_tpu.shapes.gridsdf import grid_shape

    gn = 64
    gres = 0.04
    gorigin = np.full(3, -0.5 * gn * gres)
    ii = np.stack(np.meshgrid(*[np.arange(gn)] * 3, indexing="ij"), axis=-1)
    gp = gorigin + ii * gres
    gxy = np.sqrt(gp[..., 0] ** 2 + gp[..., 1] ** 2) - 0.6
    gfield = np.sqrt(gxy ** 2 + gp[..., 2] ** 2) - 0.25
    gshape = grid_shape("bench_torus64", gfield, gorigin, gres)
    fn_g = jax.jit(
        lambda p, tw: sweep_sdf_warm(
            gshape, traj, params, p, tw,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
    )
    sdf_g, t_g, _ = fn_g(pts, t_warm)
    jax.block_until_ready(sdf_g)
    t0 = time.perf_counter()
    giters = 5
    for _ in range(giters):
        sdf_g, t_g, _ = fn_g(pts, t_g)
    jax.block_until_ready(sdf_g)
    grid_queries_per_s = round(P * giters / (time.perf_counter() - t0))

    # --- 3) p50 single-plan latency: the PRODUCTION single-plan path — one
    # unvmapped solver program (what PlannerManager/backend.optimize runs),
    # not the vmapped batch engine at B=1 (vmap of the line-search
    # while_loop runs batch-max trial counts and roughly doubles per-iter
    # cost; measured round 4, BASELINE.md "plan latency") ------------------
    from isdf_tpu.core import timemap
    from isdf_tpu.opt import backend, lbfgs

    sb1 = pb.make_random_batch(conf, B=1, N=4, n_points=n_pts, dtype=dtype)
    params_b = fl.FlatParams.from_config(conf)
    w_b = backend.BackendWeights.from_config(conf)
    cg1 = backend.make_cost_fn(
        shape, params_b, w_b, sb1.head[0], sb1.tail[0], 4,
        sb1.points[0], sb1.mask[0],
        integral_res=conf.integralIntervs,
        coarse_n=conf.sweep_coarse_samples,
        refine_rounds=conf.sweep_refine_rounds,
    )
    x1 = backend.pack(timemap.T_to_tau(sb1.T0[0]), sb1.q0[0])
    tw1 = jnp.zeros(n_pts, dtype)
    solve1 = jax.jit(lambda x, tw: lbfgs.minimize(
        cg1, x, tw, m=conf.mem_size, max_iters=solve_iters,
        g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol).x)
    jax.block_until_ready(solve1(x1, tw1))
    lats = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(solve1(x1, tw1))
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)
    # sustained single-stream latency: N async launches, one block — on the
    # axon tunnel the blocking wall is ~2× device time (completion-detection
    # backoff, BASELINE.md "plan latency"); this amortized number tracks the
    # device-side solve time a local chip would deliver
    t0 = time.perf_counter()
    outs = [solve1(x1, tw1) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    p50_pipelined_ms = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    # device-side p50: S solves SERIALIZED inside one program via lax.scan
    # (scan bodies run in sequence on device), one host round-trip total —
    # wall/S is the on-device solve time with the tunnel's completion-
    # detection overhead amortized to nothing (VERDICT r4 next #4: the
    # "23.3 ms device" claim must be a measured field, not prose)
    # S=16: the scan carries ~2 ms/solve of fixed overhead at S=8
    # (measured scratch/probe_p50_tpu.py: 32.2 ms at S=8 vs 30.3 at S=16)
    S = 16
    xs_dev = jnp.stack([x1] * S) + 1e-3 * jnp.arange(S, dtype=dtype)[:, None]
    tws_dev = jnp.zeros((S, n_pts), dtype)

    @jax.jit
    def solve_scan(xs, tws):
        def body(c, xt):
            x, tw = xt
            r = lbfgs.minimize(
                cg1, x, tw, m=conf.mem_size, max_iters=solve_iters,
                g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol)
            return c, r.x
        return jax.lax.scan(body, jnp.zeros((), dtype), (xs, tws))[1]

    jax.block_until_ready(solve_scan(xs_dev, tws_dev))
    dev_lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(solve_scan(xs_dev, tws_dev))
        dev_lats.append((time.perf_counter() - t0) / S)
    p50_device_ms = round(float(np.median(dev_lats)) * 1e3, 2)

    # measured on this host by native/parity/ref_bench.cpp (see docstring)
    baseline_evals_per_s = 9.96e6
    ref_desktop_est = 1.0e8
    record = {
        "metric": "swept_sdf_grad_evals_per_s_per_chip",
        "value": round(sdf_evals_per_s),
        "unit": "evals/s",
        "vs_baseline": round(sdf_evals_per_s / baseline_evals_per_s, 2),
        "vs_ref_desktop_est": round(sdf_evals_per_s / ref_desktop_est, 2),
        "ref_evals_per_s_measured": baseline_evals_per_s,
        "sweep_point_queries_per_s": round(queries_per_s),
        "flops_per_query": round(float(flops_query)),
        "vpu_tflops": round(vpu_flops / 1e12, 3),
        "vpu_util": round(float(vpu_util), 3),
        "sweep_mqps_spread": sweep_spread,
        "plans_per_s_per_chip": plans_per_s,
        "plans_per_s_audited": plans_audited_per_s,
        "grid_queries_per_s": grid_queries_per_s,
        "plans_scaling": scaling,
        "plans_scaling_spread": scaling_spread,
        "peak_host_rss_mb": peak_host_rss_mb,
        "peak_device_mb": peak_dev_mb,
        "p50_plan_latency_ms": round(p50_ms, 2),
        "plan_latency_pipelined_ms": p50_pipelined_ms,
        "p50_device_ms": p50_device_ms,
        "plan_iters": solve_iters,
        "device": str(dev),
    }
    hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_history.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps({"ts": time.time(), **record}) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
