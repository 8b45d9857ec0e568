"""Jit-compiled L-BFGS with Lewis–Overton weak-Wolfe line search.

Replaces the reference's LBFGS-Lite (ref src/utils/include/utils/lbfgs.hpp:
290 line_search_lewisoverton, 480 lbfgs_optimize) — the mid-end solver — and
doubles as the smoothed back-end outer loop (the reference declared an L-BFGS
back end as interchangeable with LMBM, back_end_optimizer.hpp:730).  The
nonsmooth LMBM outer loop lives in opt/lmbm.py.

Design: the entire optimization is one ``lax.while_loop`` under jit —
history ring buffers are fixed (m, n) arrays, the line search is a nested
bounded ``lax.while_loop``, and an opaque ``aux`` pytree threads through the
cost callback across iterations (carries the swept-SDF t* warm starts, the
reference's ``lastTstar`` pattern).  vmap-able across scenario batches.

cost_and_grad signature:  (x, aux) -> (f, g, new_aux).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LBFGSResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    n_iters: jax.Array
    n_evals: jax.Array
    converged: jax.Array
    aux: Any
    history: Any  # (max_iters,) cost trace (observability; NaN-padded)
    state: Any = None  # full solver state for resume (minimize_chunked)


class _State(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    aux: Any
    S: jax.Array           # (m, n) s history
    Y: jax.Array           # (m, n) y history
    rho: jax.Array         # (m,)
    n_corr: jax.Array      # number of valid corrections
    head: jax.Array        # ring-buffer head
    it: jax.Array
    evals: jax.Array
    done: jax.Array
    fpast: jax.Array       # (past,) rolling costs
    trace: jax.Array


def _two_loop(g, S, Y, rho, n_corr, head, m, gamma_clamp=None):
    """Two-loop recursion over a ring buffer (most recent = head−1).

    gamma_clamp: optional (lo, hi) safeguard for the initial-Hessian
    scaling γ = s·y/y·y (the Fortran LMBM's SCLPAR clamps γ to keep a
    degenerate last pair — tiny s·y at a kink — from collapsing the
    direction).  None (the L-BFGS default) keeps the classic unclamped
    scaling."""
    q = g
    alphas = jnp.zeros((m,), g.dtype)

    def bwd(i, carry):
        q, alphas = carry
        slot = (head - 1 - i) % m
        valid = i < n_corr
        a = rho[slot] * jnp.dot(S[slot], q)
        a = jnp.where(valid, a, 0.0)
        q = q - a * Y[slot]
        return q, alphas.at[slot].set(a)

    q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))

    # initial Hessian scaling γ = s·y / y·y of the most recent pair
    last = (head - 1) % m
    yy = jnp.dot(Y[last], Y[last])
    sy = jnp.dot(S[last], Y[last])
    gamma = jnp.where(n_corr > 0, sy / jnp.maximum(yy, 1e-30), 1.0)
    if gamma_clamp is not None:
        lo, hi = gamma_clamp
        gamma = jnp.clip(gamma, lo, hi)
    r = gamma * q

    def fwd(i, r):
        slot = (head - n_corr + i) % m
        valid = i < n_corr
        b = rho[slot] * jnp.dot(Y[slot], r)
        upd = S[slot] * (alphas[slot] - b)
        return r + jnp.where(valid, upd, 0.0)

    r = jax.lax.fori_loop(0, m, fwd, r)
    return r


def _line_search(cost_and_grad, x, f0, g0, d, aux, max_ls, c1=1e-4, c2=0.9,
                 step0=None, armijo_slack=0.0):
    """Lewis–Overton bisection line search for weak Wolfe conditions
    (armijo + weak curvature), robust on nonsmooth objectives
    (ref lbfgs.hpp:290).  step0: initial trial step (ref lbfgs.hpp:565
    uses 1/‖d‖ on the first iteration where d = −g can be huge).
    armijo_slack: absolute sufficient-decrease slack — absorbs the tiny
    objective drift between aux (t* warm-seed) refreshes when the caller
    reuses the previous iteration's (f, g) as the baseline instead of
    re-evaluating (approximate-Wolfe style, cf. Hager–Zhang)."""
    dg0 = jnp.dot(g0, d)
    big = jnp.asarray(jnp.inf, f0.dtype)

    def cond(c):
        step, lo, hi, f, g, aux2, k, ok, evals = c
        return (~ok) & (k < max_ls)

    def body(c):
        step, lo, hi, f, g, aux2, k, ok, evals = c
        xt = x + step * d
        # aux (t* warm seeds) is FROZEN during the search: every trial
        # evaluates the same function f(·, aux).  Threading each trial's
        # refreshed t* would change the objective mid-search (a deeper argmin
        # raises the penalty), making tiny steps look like ascent and failing
        # the search spuriously.  The accepted trial's refreshed aux (auxt)
        # is still carried out for the next outer iteration.
        ft, gt, auxt = cost_and_grad(xt, aux)
        evals = evals + 1
        armijo = ft <= f0 + c1 * step * dg0 + armijo_slack
        curv = jnp.dot(gt, d) >= c2 * dg0
        ok_new = armijo & curv
        hi_new = jnp.where(armijo, hi, step)
        lo_new = jnp.where(armijo & ~curv, step, lo)
        # safeguarded quadratic interpolation on Armijo failure (the
        # reference's LLS/QINT, lmbm_sub.f:2535-2608 / lbfgs.hpp): fit
        # φ(t) ≈ f0 + dg0·t + a·t², minimize, clamp into the bracket —
        # measurably fewer trials than plain bisection on stiff penalties
        denom = ft - f0 - dg0 * step
        t_q = -dg0 * step * step / (2.0 * jnp.maximum(denom, 1e-30))
        mid = jnp.clip(t_q, lo_new + 0.1 * (hi_new - lo_new),
                       lo_new + 0.9 * (hi_new - lo_new))
        mid = jnp.where(jnp.isfinite(mid), mid, 0.5 * (lo_new + hi_new))
        step_new = jnp.where(
            ok_new,
            step,
            jnp.where(
                jnp.isfinite(hi_new),
                mid,
                2.0 * jnp.maximum(step, lo_new),
            ),
        )
        return (step_new, lo_new, hi_new, ft, gt, auxt, k + 1, ok_new, evals)

    if step0 is None:
        step0 = jnp.asarray(1.0, f0.dtype)
    init = (
        jnp.asarray(step0, f0.dtype), jnp.asarray(0.0, f0.dtype), big,
        f0, g0, aux, jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    step, lo, hi, f, g, aux2, k, ok, evals = jax.lax.while_loop(cond, body, init)
    # if the search failed entirely keep the last trial point anyway when it
    # decreased f; else signal failure with step = 0
    improved = f < f0
    return (
        jnp.where(improved, step, 0.0),
        jnp.where(improved, f, f0),
        jax.tree.map(lambda a, b: jnp.where(improved, a, b), g, g0),
        jax.tree.map(
            lambda a, b: jnp.where(improved, a, b), aux2, aux
        ),
        ok | improved,
        evals,
    )


def minimize(
    cost_and_grad: Callable,
    x0,
    aux0=None,
    m: int = 16,
    max_iters: int = 300,
    g_epsilon: float = 1e-6,
    past: int = 10,
    rel_cost_tol: float = 1e-8,
    max_ls: int = 24,
    resume_state: "_State" = None,
    trace_len: int = None,
    consistent_baseline: bool = True,
) -> LBFGSResult:
    """Run L-BFGS; fully jit-compatible (call under jit / vmap).

    Pass ``resume_state`` (from a previous result's ``.state``) to continue a
    solve — the basis of chunked execution (minimize_chunked), which keeps
    single device programs short and provides between-chunk observability
    (the reference's earlyExit callback cadence).

    consistent_baseline (default True): re-evaluate cost+grad at (x, aux)
    at the top of every iteration so the line-search baseline and descent
    direction are exactly consistent with the refreshed aux (t* warm
    seeds).  False reuses the accepted trial's (f, g) — computed under the
    pre-refresh aux — absorbing the objective drift with a relative Armijo
    slack; this saves one full cost+grad per iteration (~30% of solve cost,
    tests/test_opt.py::TestBaselineSkip) but the stale baseline/direction
    measurably degrades solution quality on marginal scenarios (demo2's
    swept-volume clearance flipped negative), so it is opt-in for
    throughput-over-quality workloads only.
    """
    n = x0.shape[0]
    dtype = x0.dtype
    if trace_len is None:
        trace_len = max_iters
    trace = jnp.full((trace_len,), jnp.nan, dtype)
    if resume_state is not None:
        # keep `done` — converged batch elements stay converged (no-ops)
        st = resume_state._replace(trace=trace)
        it_end = st.it + max_iters
    else:
        f0, g0, aux1 = cost_and_grad(x0, aux0)
        fpast = jnp.full((past,), jnp.inf, dtype).at[0].set(f0)
        st = _State(
            x=x0, f=f0, g=g0, aux=aux1,
            S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
            rho=jnp.zeros((m,), dtype),
            n_corr=jnp.asarray(0, jnp.int32), head=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32), evals=jnp.asarray(1, jnp.int32),
            done=jnp.asarray(False), fpast=fpast, trace=trace,
        )
        it_end = max_iters

    def cond(st: _State):
        return (~st.done) & (st.it < it_end)

    def body(st: _State):
        if consistent_baseline:
            # Re-evaluate the baseline at (x, aux): st.f/st.g were computed
            # under the PREVIOUS iteration's aux (t* warm seeds); with
            # refreshed seeds the penalty's argmin can be deeper, so the
            # objective f(·, aux) the search minimizes this iteration
            # differs from st.f by a small drift.  An inconsistent baseline
            # makes every trial look like ascent near convergence and kills
            # the search spuriously.
            f0, g0, _ = cost_and_grad(st.x, st.aux)
            slack = jnp.asarray(0.0, st.f.dtype)
        else:
            # Reuse the accepted trial's (f, g) and absorb the aux-refresh
            # drift with an Armijo slack (approximate Wolfe) — one full
            # cost+grad saved per iteration.
            f0, g0 = st.f, st.g
            # purely relative: vanishes as f → 0 so smooth problems keep
            # full final precision (no absolute floor)
            slack = 1e-6 * jnp.abs(st.f)
        d = -_two_loop(g0, st.S, st.Y, st.rho, st.n_corr, st.head, m)
        # ensure descent; fall back to -g
        dg = jnp.dot(d, g0)
        d = jnp.where(dg < 0, d, -g0)
        # without curvature pairs d = −g, whose norm can be enormous on stiff
        # penalties; scale the first trial step like LBFGS-Lite
        # (ref lbfgs.hpp:565: step = 1/‖d‖ at k = 1)
        dnorm = jnp.linalg.norm(d)
        step0 = jnp.where(
            st.n_corr > 0, 1.0, 1.0 / jnp.maximum(dnorm, 1.0)
        ).astype(st.f.dtype)
        step, f, g, aux, ok, ls_evals = _line_search(
            cost_and_grad, st.x, f0, g0, d, st.aux, max_ls, step0=step0,
            armijo_slack=slack,
        )
        x_new = st.x + step * d
        s = x_new - st.x
        y = g - g0
        sy = jnp.dot(s, y)
        good = ok & (sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y))
        S = jnp.where(good, st.S.at[st.head].set(s), st.S)
        Y = jnp.where(good, st.Y.at[st.head].set(y), st.Y)
        rho = jnp.where(good, st.rho.at[st.head].set(1.0 / sy), st.rho)
        head = jnp.where(good, (st.head + 1) % m, st.head)
        n_corr = jnp.where(good, jnp.minimum(st.n_corr + 1, m), st.n_corr)

        gnorm = jnp.linalg.norm(g) / jnp.maximum(jnp.linalg.norm(x_new), 1.0)
        conv_g = gnorm < g_epsilon
        # read the slot about to be overwritten: its value was written `past`
        # iterations ago (LBFGS++-style past-window test, not consecutive)
        f_old = st.fpast[(st.it + 1) % past]
        conv_f = (st.it >= past) & (
            (f_old - f) / jnp.maximum(jnp.abs(f), 1.0) < rel_cost_tol
        )
        done = conv_g | conv_f | (~ok)
        return _State(
            x=x_new, f=f, g=g, aux=aux, S=S, Y=Y, rho=rho,
            n_corr=n_corr, head=head, it=st.it + 1,
            evals=st.evals + ls_evals + (1 if consistent_baseline else 0),
            done=done,
            fpast=st.fpast.at[(st.it + 1) % past].set(f),
            trace=st.trace.at[st.it % st.trace.shape[0]].set(f),
        )

    st = jax.lax.while_loop(cond, body, st)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g, n_iters=st.it, n_evals=st.evals,
        converged=st.done, aux=st.aux, history=st.trace, state=st,
    )


class _LockState(NamedTuple):
    x: jax.Array
    f: jax.Array           # baseline f at x (under aux)
    g: jax.Array           # baseline gradient at x
    aux: Any
    d: jax.Array           # current search direction
    step: jax.Array        # next trial step
    ls_k: jax.Array        # trials taken in the current search
    S: jax.Array
    Y: jax.Array
    rho: jax.Array
    n_corr: jax.Array
    head: jax.Array
    it: jax.Array          # loop iterations
    n_accept: jax.Array    # accepted (serious) steps
    evals: jax.Array
    done: jax.Array
    fpast: jax.Array
    trace: jax.Array


def minimize_lockstep(
    cost_and_grad: Callable,
    x0,
    aux0=None,
    m: int = 16,
    max_iters: int = 300,
    g_epsilon: float = 1e-6,
    past: int = 10,
    rel_cost_tol: float = 1e-8,
    max_ls: int = 24,
    max_loop: Optional[int] = None,
    resume_state: "_LockState" = None,
    trace_len: int = None,
    c1: float = 1e-4,
    c2: float = 0.9,
) -> LBFGSResult:
    """L-BFGS with the line search SPREAD ACROSS lockstep iterations —
    the batched-solve scheduling of :func:`minimize`.

    Under ``jax.vmap``, a nested line-search ``while_loop`` runs the
    BATCH-MAX trial count every outer iteration (vmap of while = union of
    iterations with masking), so one hard scenario inflates every
    scenario's eval count — measured ~20 evals/iteration at B=128 vs ~2.5
    for the median scenario (round-4 probe).  This variant fixes the
    program shape at exactly TWO cost evaluations per loop iteration:

      slot 1: baseline refresh at (x, aux) — keeps the consistent
              per-iteration baseline of minimize()'s quality-first default
              (aux/t* drift never accumulates);
      slot 2: ONE weak-Wolfe trial at x + step·d; accept ⇒ push pair +
              new direction next iteration; reject ⇒ halve step and retry
              on the NEXT lockstep iteration.

    max_iters counts ACCEPTED steps (comparable to minimize()); the loop
    itself is bounded by max_loop (default 2·max_iters + 8).  Semantics
    match minimize() up to trial scheduling — endpoints agree to solver
    tolerance, not bitwise.
    """
    n = x0.shape[0]
    dtype = x0.dtype
    if max_loop is None:
        max_loop = 2 * max_iters + 8
    if trace_len is None:
        trace_len = max_loop
    trace = jnp.full((trace_len,), jnp.nan, dtype)

    if resume_state is not None:
        st = resume_state._replace(trace=trace)
        accept_end = st.n_accept + max_iters
        loop_end = st.it + max_loop
    else:
        f0, g0, aux1 = cost_and_grad(x0, aux0)
        fpast = jnp.full((past,), jnp.inf, dtype).at[0].set(f0)
        d0 = -g0
        step0 = (1.0 / jnp.maximum(jnp.linalg.norm(d0), 1.0)).astype(dtype)
        st = _LockState(
            x=x0, f=f0, g=g0, aux=aux1, d=d0,
            step=step0,
            ls_k=jnp.asarray(0, jnp.int32),
            S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
            rho=jnp.zeros((m,), dtype),
            n_corr=jnp.asarray(0, jnp.int32), head=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32),
            n_accept=jnp.asarray(0, jnp.int32),
            evals=jnp.asarray(1, jnp.int32),
            done=jnp.asarray(False), fpast=fpast, trace=trace,
        )
        accept_end = max_iters
        loop_end = max_loop

    def cond(st: _LockState):
        return (~st.done) & (st.it < loop_end) & (st.n_accept < accept_end)

    def body(st: _LockState):
        # slot 1: baseline refresh (fresh-search iterations consume it; a
        # mid-search iteration keeps its stored baseline so every trial of
        # one search tests the SAME objective)
        f_re, g_re, _ = cost_and_grad(st.x, st.aux)
        fresh = st.ls_k == 0
        f0 = jnp.where(fresh, f_re, st.f)
        g0 = jax.tree.map(lambda a, b: jnp.where(fresh, a, b), g_re, st.g)

        # direction: recompute on fresh searches only
        d_new = -_two_loop(g0, st.S, st.Y, st.rho, st.n_corr, st.head, m)
        dg_new = jnp.dot(d_new, g0)
        d_new = jnp.where(dg_new < 0, d_new, -g0)
        dnorm = jnp.linalg.norm(d_new)
        step_new = jnp.where(
            st.n_corr > 0, 1.0, 1.0 / jnp.maximum(dnorm, 1.0)
        ).astype(dtype)
        d = jnp.where(fresh, d_new, st.d)
        step = jnp.where(fresh, step_new, st.step)
        dg0 = jnp.dot(d, g0)

        # slot 2: one weak-Wolfe trial
        xt = st.x + step * d
        ft, gt, auxt = cost_and_grad(xt, st.aux)
        armijo = ft <= f0 + c1 * step * dg0
        curv = jnp.dot(gt, d) >= c2 * dg0
        ok = armijo & curv
        exhausted = (st.ls_k + 1 >= max_ls) & (~ok)
        # on exhaustion keep the last trial anyway when it decreased f
        # (minimize()'s behavior); else the search failed → done
        salvage = exhausted & (ft < f0)
        accept = ok | salvage
        fail = exhausted & (~salvage)

        s_vec = xt - st.x
        y_vec = gt - g0
        sy = jnp.dot(s_vec, y_vec)
        good = accept & (sy > 1e-10 * jnp.linalg.norm(s_vec)
                         * jnp.linalg.norm(y_vec))
        S = jnp.where(good, st.S.at[st.head].set(s_vec), st.S)
        Y = jnp.where(good, st.Y.at[st.head].set(y_vec), st.Y)
        rho = jnp.where(good, st.rho.at[st.head].set(1.0 / sy), st.rho)
        head = jnp.where(good, (st.head + 1) % m, st.head)
        n_corr = jnp.where(good, jnp.minimum(st.n_corr + 1, m), st.n_corr)

        x_new = jnp.where(accept, xt, st.x)
        f_new = jnp.where(accept, ft, f0)
        g_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b), gt, g0)
        aux_new = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), auxt, st.aux)
        ls_k = jnp.where(accept, 0, st.ls_k + 1)
        # on reject, branch on WHICH condition failed: Armijo failure means
        # the step is too long (halve); Armijo-pass/curvature-fail means the
        # step is too SHORT — halving can never fix it (as step→0 the
        # directional derivative tends to dg0 < c2·dg0), so grow instead,
        # mirroring _line_search's bracket logic.
        grow = armijo & (~curv)
        step = jnp.where(
            accept, step, jnp.where(grow, 2.0 * step, 0.5 * step))
        n_accept = st.n_accept + accept.astype(jnp.int32)

        gnorm = jnp.linalg.norm(g_new) / jnp.maximum(
            jnp.linalg.norm(x_new), 1.0)
        conv_g = accept & (gnorm < g_epsilon)
        # read the slot the accept below would overwrite: written `past`
        # accepts ago (same past-window convention as minimize())
        f_old = st.fpast[(st.n_accept + 1) % past]
        conv_f = accept & (st.n_accept >= past) & (
            (f_old - f_new) / jnp.maximum(jnp.abs(f_new), 1.0) < rel_cost_tol
        )
        done = conv_g | conv_f | fail
        fpast = jnp.where(
            accept, st.fpast.at[(st.n_accept + 1) % past].set(f_new),
            st.fpast)
        return _LockState(
            x=x_new, f=f_new, g=g_new, aux=aux_new, d=d, step=step,
            ls_k=ls_k, S=S, Y=Y, rho=rho, n_corr=n_corr, head=head,
            it=st.it + 1, n_accept=n_accept, evals=st.evals + 2,
            done=done, fpast=fpast,
            trace=st.trace.at[st.it % st.trace.shape[0]].set(f_new),
        )

    st = jax.lax.while_loop(cond, body, st)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g, n_iters=st.n_accept, n_evals=st.evals,
        converged=st.done, aux=st.aux, history=st.trace, state=st,
    )


def minimize_chunked(
    cost_and_grad,
    x0,
    aux0=None,
    m: int = 16,
    max_iters: int = 300,
    chunk: int = 8,
    callback=None,
    **kw,
) -> LBFGSResult:
    """Host-driven chunked L-BFGS: runs `chunk` iterations per device call,
    carrying full solver state across calls.  Keeps individual XLA programs
    short (long-running single programs can trip runtime watchdogs) and
    invokes `callback(result)` between chunks — the reference's per-iteration
    earlyExit/debug affordance (back_end_optimizer.hpp:888-927)."""
    res = None
    state = None
    done_iters = 0
    while done_iters < max_iters:
        n = min(chunk, max_iters - done_iters)
        res = minimize(
            cost_and_grad, x0, aux0, m=m, max_iters=n,
            resume_state=state, trace_len=chunk, **kw,
        )
        state = res.state
        done_iters = int(res.n_iters)
        if callback is not None and callback(res) is False:
            break
        if bool(res.converged):
            break
        # no progress (converged flag is folded into done inside the loop)
        if done_iters == 0:
            break
    return res
