"""Limited-Memory Bundle Method (LMBM) — jit-compiled nonsmooth outer loop.

The reference's back end drives a Fortran77 LMBM (Haarala–Miettinen–Mäkelä;
ref src/utils/include/lmbm/lmbm_main.f + the C bridge lmbm/lmbm.cpp:8-76,
invoked from back_end_optimizer.cpp:99) because the swept-SDF safety cost is
only piecewise-smooth (the argmin-time t* jumps between local minima).

This is a from-scratch JAX re-derivation of the method's core structure —
NOT a port of the Fortran:  serious/null steps with two-point subgradient
aggregation, a limited-memory inverse-Hessian model from serious-step
(s, y) pairs, and a weak-Wolfe-style acceptance test.  Everything lives in
one ``lax.while_loop`` (fixed-shape ring buffers), so it jits and vmaps
across scenario batches exactly like opt/lbfgs.py.

Loop sketch (per iteration):
  d = −H ĝ           (two-loop recursion over serious-step pairs, ĝ = aggregate)
  trial x⁺ = x + t d  (t from a bounded backtracking search)
  serious step  if f(x⁺) ≤ f − c₁ t ĝᵀH ĝ: move, push (s, y), reset ĝ ← g⁺
  null step     else: stay, aggregate ĝ ← (1−λ*) ĝ + λ* g⁺ with the
                closed-form λ* = argmin‖(1−λ)ĝ + λg⁺‖² clipped to [0, 1]
Stop when w = ‖ĝ‖² + 2|f̂ − f| is small or iterations exhaust.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from isdf_tpu.opt.lbfgs import _two_loop, LBFGSResult


class _LMBMState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g_hat: jax.Array       # aggregate subgradient
    aux: Any
    S: jax.Array
    Y: jax.Array
    rho: jax.Array
    n_corr: jax.Array
    head: jax.Array
    it: jax.Array
    evals: jax.Array
    null_streak: jax.Array
    done: jax.Array
    trace: jax.Array


def minimize(
    cost_and_grad: Callable,
    x0,
    aux0=None,
    m: int = 8,
    max_iters: int = 400,
    tol: float = 1e-6,
    c1: float = 1e-4,
    max_ls: int = 12,
    max_null: int = 30,
) -> LBFGSResult:
    """Minimize a (possibly nonsmooth) function; same signature/result type
    as opt.lbfgs.minimize."""
    n = x0.shape[0]
    dtype = x0.dtype
    f0, g0, aux1 = cost_and_grad(x0, aux0)

    st = _LMBMState(
        x=x0, f=f0, g_hat=g0, aux=aux1,
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype),
        n_corr=jnp.asarray(0, jnp.int32), head=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32), evals=jnp.asarray(1, jnp.int32),
        null_streak=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        trace=jnp.full((max_iters,), jnp.nan, dtype),
    )

    def cond(st: _LMBMState):
        return (~st.done) & (st.it < max_iters)

    def body(st: _LMBMState):
        d = -_two_loop(st.g_hat, st.S, st.Y, st.rho, st.n_corr, st.head, m)
        dg = jnp.dot(d, st.g_hat)
        d = jnp.where(dg < 0, d, -st.g_hat)
        dg = jnp.minimum(dg, jnp.dot(d, st.g_hat))

        # bounded backtracking: find the largest t in {1, 1/2, ...} that
        # decreases f sufficiently; keep the last trial's (f, g, aux).
        def ls_body(c):
            t, f_t, g_t, aux_t, k, ok = c
            xt = st.x + t * d
            ft, gt, auxt = cost_and_grad(xt, aux_t)
            ok_new = ft <= st.f + c1 * t * dg
            t_next = jnp.where(ok_new, t, 0.5 * t)
            return (t_next, ft, gt, auxt, k + 1, ok_new)

        def ls_cond(c):
            t, f_t, g_t, aux_t, k, ok = c
            return (~ok) & (k < max_ls)

        t_fin, f_t, g_t, aux_t, k_ls, serious = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(1.0, dtype), st.f, st.g_hat, st.aux,
             jnp.asarray(0, jnp.int32), jnp.asarray(False)),
        )
        x_t = st.x + t_fin * d

        # --- serious step: accept x_t, push correction pair, reset aggregate
        s_vec = x_t - st.x
        y_vec = g_t - st.g_hat
        sy = jnp.dot(s_vec, y_vec)
        good = serious & (sy > 1e-12)
        S = jnp.where(good, st.S.at[st.head].set(s_vec), st.S)
        Y = jnp.where(good, st.Y.at[st.head].set(y_vec), st.Y)
        rho = jnp.where(good, st.rho.at[st.head].set(1.0 / jnp.maximum(sy, 1e-30)), st.rho)
        head = jnp.where(good, (st.head + 1) % m, st.head)
        n_corr = jnp.where(good, jnp.minimum(st.n_corr + 1, m), st.n_corr)

        # --- null step: two-point aggregation of subgradients
        diff = g_t - st.g_hat
        denom = jnp.dot(diff, diff)
        lam = jnp.clip(
            -jnp.dot(st.g_hat, diff) / jnp.maximum(denom, 1e-30), 0.0, 1.0
        )
        g_agg = st.g_hat + lam * diff

        x_new = jnp.where(serious, x_t, st.x)
        f_new = jnp.where(serious, f_t, st.f)
        g_new = jnp.where(serious, g_t, g_agg)
        aux_new = jax.tree.map(
            lambda a, b: jnp.where(serious, a, b), aux_t, st.aux
        )
        null_streak = jnp.where(serious, 0, st.null_streak + 1)

        w = jnp.dot(g_new, g_new)
        done = (w < tol * tol) | (null_streak > max_null)
        return _LMBMState(
            x=x_new, f=f_new, g_hat=g_new, aux=aux_new,
            S=S, Y=Y, rho=rho, n_corr=n_corr, head=head,
            it=st.it + 1, evals=st.evals + k_ls,
            null_streak=null_streak, done=done,
            trace=st.trace.at[st.it].set(f_new),
        )

    st = jax.lax.while_loop(cond, body, st)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g_hat, n_iters=st.it, n_evals=st.evals,
        converged=st.done, aux=st.aux, history=st.trace,
    )
