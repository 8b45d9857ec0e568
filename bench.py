"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: swept-volume SDF point-queries per second per chip (the
argmin-over-time body-SDF query that dominates the reference's optimizer
inner loop — ref back_end_optimizer.hpp:557-649 + sw_manager.hpp:677).
Each query = coarse scan + fixed zoom refinement + gradient ≈
(coarse_n + 8·rounds + 2) body-SDF evaluations.

vs_baseline: ratio of body-SDF evaluations/s against the reference CPU
implementation MEASURED on this host (native/parity/ref_bench.cpp: the
reference's own Trajectory<5> eval + flatness::optimizated_forward +
analytic SDF + its central-difference gradient, OpenMP at 1.5×cores —
9.96e6 evals/s on this 2-core host, ~5.0e6 evals/s/core).  Because this
host is small, we also report vs_ref_desktop_est: the same per-core rate
extrapolated to the reference README's assumed 20-core desktop
(30 threads), ≈1.0e8 evals/s — the conservative comparison.

Also reported (secondary fields): full back-end plans/s (batched 40-iteration
L-BFGS solves), and p50 single-plan solve latency vs the 100 Hz (10 ms)
replanning budget of traj_server (ref traj_server.cpp:332).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    import jax

    # Persistent compilation cache: compiles over the axon TPU tunnel are very
    # slow (~minutes for the fused sweep program); cache them across runs so
    # the driver's bench invocation pays compile cost at most once.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
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
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        sdf, t_star, grad = fn(pts, t_star)
    jax.block_until_ready(sdf)
    dt = (time.perf_counter() - t0) / iters
    queries_per_s = P / dt
    evals_per_query = conf.sweep_coarse_samples + 8 * conf.sweep_refine_rounds + 2
    sdf_evals_per_s = queries_per_s * evals_per_query

    # --- 2) batched plans/s --------------------------------------------------
    # chunk=2: keeps each device program well under the runtime execution
    # watchdog (a cold L-BFGS iteration can spend many line-search evals)
    B, n_pts, solve_iters, chunk = 128, 512, 24, 2
    sb = pb.make_random_batch(conf, B=B, N=4, n_points=n_pts, dtype=dtype)
    out = pb.batched_solve_chunked(shape, conf, sb, max_iters=solve_iters, chunk=chunk)
    jax.block_until_ready(out[2])
    t0 = time.perf_counter()
    out = pb.batched_solve_chunked(shape, conf, sb, max_iters=solve_iters, chunk=chunk)
    jax.block_until_ready(out[2])
    plan_dt = time.perf_counter() - t0
    plans_per_s = B / plan_dt

    # --- 3) p50 single-plan latency ------------------------------------------
    sb1 = pb.make_random_batch(conf, B=1, N=4, n_points=n_pts, dtype=dtype)
    out = pb.batched_solve_chunked(shape, conf, sb1, max_iters=solve_iters, chunk=chunk)
    jax.block_until_ready(out[2])
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = pb.batched_solve_chunked(shape, conf, sb1, max_iters=solve_iters, chunk=chunk)
        jax.block_until_ready(out[2])
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    # measured on this host by native/parity/ref_bench.cpp (see docstring)
    baseline_evals_per_s = 9.96e6
    ref_desktop_est = 1.0e8  # 5.0e6 evals/s/core × 20-core reference desktop
    print(json.dumps({
        "metric": "swept_sdf_grad_evals_per_s_per_chip",
        "value": round(sdf_evals_per_s),
        "unit": "evals/s",
        "vs_baseline": round(sdf_evals_per_s / baseline_evals_per_s, 2),
        "vs_ref_desktop_est": round(sdf_evals_per_s / ref_desktop_est, 2),
        "ref_evals_per_s_measured": baseline_evals_per_s,
        "sweep_point_queries_per_s": round(queries_per_s),
        "plans_per_s_per_chip": round(plans_per_s, 2),
        "p50_plan_latency_ms": round(p50_ms, 2),
        "plan_iters": solve_iters,
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
