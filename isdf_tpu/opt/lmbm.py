"""Limited-Memory Bundle Method (LMBM) — jit-compiled nonsmooth outer loop.

The reference's back end drives a Fortran77 LMBM (Haarala–Miettinen–Mäkelä;
ref src/utils/include/lmbm/lmbm_main.f + lmbm_sub.f, via the C bridge
lmbm/lmbm.cpp:8-76, invoked from back_end_optimizer.cpp:99) because the
swept-SDF safety cost is only piecewise-smooth (the argmin-time t* jumps
between local minima).

This is a from-scratch JAX re-derivation of the method's core structure —
NOT a port of the Fortran.  It carries the pieces that make LMBM a bundle
method rather than "L-BFGS that tolerates failure" (the fidelity items of
the Fortran core, lmbm_sub.f AGBFGS/AGGSR1 + lmbm_main.f's WK test):

  * **Subgradient locality measures** β: each null-step subgradient g⁺,
    collected at y = x + t d, is weighted by how far it is from being a
    valid subgradient at x — β⁺ = max(|f(x) − f(y) + g⁺ᵀ(y−x)|, γ‖y−x‖²)
    (the Fortran's ALFN with distance-measure parameter GAM, exponent 2).
  * **Three-point aggregation**: the new aggregate (ĝ, β̂) minimizes
    φ(λ) = ‖λ₁g_m + λ₂g⁺ + λ₃ĝ‖² + 2(λ₂β⁺ + λ₃β̂) over the unit simplex,
    where g_m is the basic (serious-point) subgradient — the Fortran's
    AGBFGS three-multiplier problem, solved here exactly by enumerating the
    interior / 3 edges / 3 vertices of the triangle (all closed forms).
  * **Desirable-descent stopping**: w = −ĝᵀd + 2β̂ (the Fortran's WK);
    stop when w < tol — small aggregate norm alone is not enough unless
    the accumulated locality is small too.
  * **Serious/null line search**: serious step when
    f(x+td) ≤ f − ε_L t w (sufficient decrease scaled by the desirable
    amount, the Fortran's TL test); otherwise the trial's subgradient
    enters the bundle as a null step.

Limited-memory DUAL model (the Fortran's DLBFGS/DLSR1 pair): after a
serious step the search direction is the inverse-Hessian two-loop over the
serious-step (s, y) pairs; after a null step it switches to the
limited-memory **SR1** inverse model in compact form
    H = γI + (S − γY) (D + L + Lᵀ − γYᵀY)⁻¹ (S − γY)ᵀ
(W = YᵀS, D = diag W, L = strict lower W) applied to the AGGREGATE
subgradient — SR1 admits indefinite curvature, which is what makes the
bundle's null-step model honest on kinked landscapes (lmbm_sub.f AGGSR1).
Null-step auxiliary pairs (s = t·d, y = g⁺ − g_m) are folded into the
shared pair memory too (the Fortran's AGGSR1/DLSR1 update with the
auxiliary subgradient, guarded by positive curvature here so the buffer
stays valid for the BFGS two-loop), and a stalled null streak triggers a
RESTART (memory + aggregation cleared, like lmbm_main.f's restart path)
rather than termination — both were required to match the Fortran's
accuracy on MXHILB (tests/test_lmbm_fortran.py, the golden-parity suite
against the reference's prebuilt lmbm.so).

Everything lives in one ``lax.while_loop`` (fixed-shape ring buffers), so it
jits and vmaps across scenario batches exactly like opt/lbfgs.py.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from isdf_tpu.opt.lbfgs import _two_loop, LBFGSResult


class _LMBMState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array           # basic subgradient at the serious point
    g_hat: jax.Array       # aggregate subgradient
    beta_hat: jax.Array    # aggregate locality measure
    aux: Any
    S: jax.Array
    Y: jax.Array
    rho: jax.Array
    n_corr: jax.Array
    head: jax.Array
    it: jax.Array
    evals: jax.Array
    null_streak: jax.Array
    n_restarts: jax.Array
    done: jax.Array
    trace: jax.Array


def _aggregate3(g_m, g_new, g_hat, beta_new, beta_hat):
    """Solve min_{λ∈Δ²} ‖λ₁g_m + λ₂g⁺ + λ₃ĝ‖² + 2(λ₂β⁺ + λ₃β̂).

    Exact minimization of the strictly convex quadratic over the 2-simplex
    (the Fortran AGBFGS multiplier problem): evaluate the unconstrained
    stationary point of each face (interior, 3 edges, 3 vertices), clip
    edge solutions into [0,1], and take the feasible candidate with the
    lowest objective.  All branches are fixed-shape — vmap/jit safe.
    """
    G = jnp.stack([g_m, g_new, g_hat])                 # (3, n)
    b = jnp.stack([jnp.zeros_like(beta_new), beta_new, beta_hat])
    Q = G @ G.T                                        # (3, 3)

    def phi(lam):
        return lam @ Q @ lam + 2.0 * jnp.dot(lam, b)

    eps = jnp.asarray(1e-12, Q.dtype)

    # vertex candidates
    cands = [jnp.array(v, Q.dtype) for v in
             ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0])]
    # edge candidates: λ on edge (i, j): λ_i = μ, λ_j = 1−μ
    for i, j in ((0, 1), (0, 2), (1, 2)):
        a2 = Q[i, i] - 2 * Q[i, j] + Q[j, j]
        a1 = Q[i, j] - Q[j, j] + b[i] - b[j]
        mu = jnp.clip(-a1 / jnp.maximum(a2, eps), 0.0, 1.0)
        lam = jnp.zeros(3, Q.dtype).at[i].set(mu).at[j].set(1.0 - mu)
        cands.append(lam)
    # interior: stationary point of the equality-constrained problem
    #   [2Q 1; 1ᵀ 0][λ; ν] = [−2b; 1]  — solve via 3×3 with regularization
    A = 2.0 * Q + eps * jnp.eye(3, dtype=Q.dtype)
    ones = jnp.ones(3, Q.dtype)
    Ainv_b = jnp.linalg.solve(A, -2.0 * b)
    Ainv_1 = jnp.linalg.solve(A, ones)
    nu = (1.0 - jnp.dot(ones, Ainv_b)) / jnp.maximum(
        jnp.dot(ones, Ainv_1), eps)
    lam_int = Ainv_b + nu * Ainv_1
    feasible = jnp.all(lam_int >= 0.0)
    lam_int = jnp.where(feasible, lam_int, cands[0])
    phi_int = jnp.where(feasible, phi(lam_int), jnp.inf)
    cands.append(lam_int)

    vals = jnp.stack([phi(c) for c in cands[:-1]] + [phi_int])
    lam = jnp.stack(cands)[jnp.argmin(vals)]
    g_agg = lam @ G
    beta_agg = jnp.dot(lam, b)
    return g_agg, beta_agg


def _sr1_direction(g, S, Y, rho, n_corr, head, m):
    """−H·g with the limited-memory inverse-SR1 compact representation over
    the ring buffer's valid pairs (masked, fixed-shape).  Falls back to −γg
    when no pairs exist; callers additionally guard descent."""
    dtype = g.dtype
    order = (head - n_corr + jnp.arange(m)) % m
    valid = (jnp.arange(m) < n_corr).astype(dtype)
    Sv = S[order] * valid[:, None]                     # (m, n)
    Yv = Y[order] * valid[:, None]

    # the Fortran's DLSR1 uses γ = 1 unconditionally for the SR1 dual model
    # (lmbm_sub.f "Computation of GAMMA": GAMMA = 1.0D+00) — data-dependent
    # scaling here is both non-PSD-risky (s·y ≤ 0 pairs at kinks) and
    # measurably worse (collapsed directions on the back-end landscape);
    # keep the identity base metric
    gam = jnp.asarray(1.0, dtype)

    W = Yv @ Sv.T                                      # (m, m) = YᵀS
    D = jnp.diag(jnp.diag(W))
    L = jnp.tril(W, k=-1)
    M = D + L + L.T - gam * (Yv @ Yv.T)
    # mask invalid slots to identity rows/cols so the solve stays regular
    vm = valid[:, None] * valid[None, :]
    M = M * vm + jnp.diag(1.0 - valid)
    A = Sv - gam * Yv                                  # (m, n)
    rhs = A @ g                                        # (m,)
    coef = jnp.linalg.solve(
        M + 1e-12 * jnp.eye(m, dtype=dtype), rhs) * valid
    return -(gam * g + A.T @ coef)


def minimize(
    cost_and_grad: Callable,
    x0,
    aux0=None,
    m: int = 8,
    max_iters: int = 400,
    tol: float = 1e-6,
    eps_l: float = 1e-4,
    gamma: float = 0.25,
    max_ls: int = 12,
    max_null: int = 50,
    max_restarts: int = 2,
    sr1_null_steps: bool = True,
) -> LBFGSResult:
    """Minimize a (possibly nonsmooth) function; same signature/result type
    as opt.lbfgs.minimize.

    gamma: distance-measure parameter of the locality measure (the
    Fortran's GAM; 0 recovers pure linearization error — valid only for
    convex f, so keep γ > 0 on our nonconvex landscapes).
    eps_l: serious-step sufficient-decrease fraction (Fortran EPSL).
    """
    n = x0.shape[0]
    dtype = x0.dtype
    f0, g0, aux1 = cost_and_grad(x0, aux0)

    st = _LMBMState(
        x=x0, f=f0, g=g0, g_hat=g0,
        beta_hat=jnp.asarray(0.0, dtype), aux=aux1,
        S=jnp.zeros((m, n), dtype), Y=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype),
        n_corr=jnp.asarray(0, jnp.int32), head=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32), evals=jnp.asarray(1, jnp.int32),
        null_streak=jnp.asarray(0, jnp.int32),
        n_restarts=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        trace=jnp.full((max_iters,), jnp.nan, dtype),
    )

    def cond(st: _LMBMState):
        return (~st.done) & (st.it < max_iters)

    def body(st: _LMBMState):
        # SCLPAR-style clamp: null-step pairs at kinks can have s·y ≪ y·y;
        # unclamped γ = s·y/y·y would collapse the direction (death spiral
        # of null steps, measured on the back-end landscape)
        d_bfgs = -_two_loop(st.g_hat, st.S, st.Y, st.rho, st.n_corr,
                            st.head, m, gamma_clamp=(0.01, 100.0))
        if sr1_null_steps:
            # dual model: SR1 direction on the aggregate after null steps
            # (Fortran AGGSR1/DLSR1), BFGS after serious steps (DLBFGS)
            d_sr1 = _sr1_direction(
                st.g_hat, st.S, st.Y, st.rho, st.n_corr, st.head, m)
            d = jnp.where(st.null_streak > 0, d_sr1, d_bfgs)
        else:
            d = d_bfgs
        dg = jnp.dot(d, st.g_hat)
        d = jnp.where(dg < 0, d, -st.g_hat)
        # desirable descent amount w = −ĝᵀd + 2β̂  (Fortran WK)
        w = -jnp.dot(d, st.g_hat) + 2.0 * st.beta_hat
        w = jnp.maximum(w, 1e-30)

        # backtracking: largest t ∈ {1, 1/2, …} with the serious-step
        # decrease f(x+td) ≤ f − ε_L t w; keep the last trial's data.
        # carry BOTH the next trial step and the step at which (f_t, g_t)
        # were actually evaluated: on a failed final trial the body halves t
        # before exiting, and the null-step locality measure below must use
        # the EVALUATED step T (Fortran ALFN, lmbm_sub.f:2460), not t/2.
        def ls_body(c):
            t, _, f_t, g_t, aux_t, k, ok = c
            xt = st.x + t * d
            ft, gt, auxt = cost_and_grad(xt, aux_t)
            ok_new = ft <= st.f - eps_l * t * w
            t_next = jnp.where(ok_new, t, 0.5 * t)
            return (t_next, t, ft, gt, auxt, k + 1, ok_new)

        def ls_cond(c):
            t, t_eval, f_t, g_t, aux_t, k, ok = c
            return (~ok) & (k < max_ls)

        _, t_fin, f_t, g_t, aux_t, k_ls, serious = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype), st.f,
             st.g_hat, st.aux, jnp.asarray(0, jnp.int32),
             jnp.asarray(False)),
        )
        x_t = st.x + t_fin * d

        # --- correction pair: serious steps AND null steps both push the
        # auxiliary-point pair (s = t·d, y = g⁺ − g) into the shared memory
        # (the Fortran's DLBFGS/DLSR1 both update from the auxiliary point;
        # null-pair folding is what lets the model improve DURING a null
        # streak — decisive on ill-conditioned problems, MXHILB 1.9e-3 →
        # 3.6e-5 in the Fortran-parity suite).  Safeguards that make this
        # safe on the stiff kinked back-end landscape: positive-curvature
        # guard here (keeps the two-loop valid), γ-clamp above, and γ = 1
        # in the SR1 dual model (both per the Fortran).
        s_vec = x_t - st.x
        y_vec = g_t - st.g
        sy = jnp.dot(s_vec, y_vec)
        good = sy > 1e-12
        S = jnp.where(good, st.S.at[st.head].set(s_vec), st.S)
        Y = jnp.where(good, st.Y.at[st.head].set(y_vec), st.Y)
        rho = jnp.where(good, st.rho.at[st.head].set(1.0 / jnp.maximum(sy, 1e-30)), st.rho)
        head = jnp.where(good, (st.head + 1) % m, st.head)
        n_corr = jnp.where(good, jnp.minimum(st.n_corr + 1, m), st.n_corr)

        # --- null step: locality measure of the trial subgradient at x
        # (y − x = t d):  β⁺ = max(|f − f_t + t g_tᵀd|, γ‖td‖²)
        step_norm2 = (t_fin * t_fin) * jnp.dot(d, d)
        alf = st.f - f_t + t_fin * jnp.dot(g_t, d)
        beta_new = jnp.maximum(jnp.abs(alf), gamma * step_norm2)
        g_agg, beta_agg = _aggregate3(
            st.g, g_t, st.g_hat, beta_new, st.beta_hat
        )

        x_new = jnp.where(serious, x_t, st.x)
        f_new = jnp.where(serious, f_t, st.f)
        g_base = jnp.where(serious, g_t, st.g)
        g_new = jnp.where(serious, g_t, g_agg)
        beta_hat = jnp.where(serious, 0.0, beta_agg)
        aux_new = jax.tree.map(
            lambda a, b: jnp.where(serious, a, b), aux_t, st.aux
        )
        null_streak = jnp.where(serious, 0, st.null_streak + 1)

        # stopping: desirable descent w = ‖ĝ‖² + 2β̂ small (WK criterion
        # with the identity model; the −ĝᵀd form is used for the search)
        wk = jnp.dot(g_new, g_new) + 2.0 * beta_hat
        # stalled null streak ⇒ RESTART (the Fortran's restart path, not a
        # termination): clear the pair memory and reset the aggregate to
        # the plain subgradient at the serious point; give up only after
        # max_restarts restarts fail to produce a serious step.
        restart = null_streak > max_null
        exhausted = restart & (st.n_restarts >= max_restarts)
        n_corr = jnp.where(restart, 0, n_corr)
        head = jnp.where(restart, 0, head)
        g_new = jax.tree.map(
            lambda a, b: jnp.where(restart, a, b), g_base, g_new)
        beta_hat = jnp.where(restart, 0.0, beta_hat)
        null_streak = jnp.where(restart, 0, null_streak)
        done = (wk < tol * tol) | exhausted
        return _LMBMState(
            x=x_new, f=f_new, g=g_base, g_hat=g_new, beta_hat=beta_hat,
            aux=aux_new,
            S=S, Y=Y, rho=rho, n_corr=n_corr, head=head,
            it=st.it + 1, evals=st.evals + k_ls,
            null_streak=null_streak,
            # a serious step clears the restart budget (the Fortran fails
            # only on CONSECUTIVE restarts without progress)
            n_restarts=jnp.where(
                serious, 0, st.n_restarts + restart.astype(jnp.int32)),
            done=done,
            trace=st.trace.at[st.it].set(f_new),
        )

    st = jax.lax.while_loop(cond, body, st)
    return LBFGSResult(
        x=st.x, f=st.f, g=st.g_hat, n_iters=st.it, n_evals=st.evals,
        converged=st.done, aux=st.aux, history=st.trace,
    )
