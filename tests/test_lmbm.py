"""LMBM nonsmooth optimizer tests: standard nonsmooth benchmarks (MAXQ,
sum-of-abs, Chained LQ) and back-end parity — LMBM and L-BFGS must reach
comparable costs on the swept-SDF objective (the reference treats them as
interchangeable, back_end_optimizer.hpp:730)."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.opt import lmbm, lbfgs


def _cg(f):
    def cg(x, aux):
        v, g = jax.value_and_grad(f)(x)
        return v, g, aux

    return cg


class TestNonsmoothBenchmarks:
    def test_sum_abs(self):
        f = lambda x: jnp.sum(jnp.abs(x - 0.3))
        res = lmbm.minimize(_cg(f), jnp.array([3.0, -2.0, 1.0]), None,
                            max_iters=300)
        np.testing.assert_allclose(np.asarray(res.x), 0.3, atol=5e-3)

    def test_maxq(self):
        # MAXQ: f(x) = max_i x_i², minimum 0 at origin — classic nonsmooth
        f = lambda x: jnp.max(x * x)
        x0 = jnp.arange(1.0, 6.0)
        res = lmbm.minimize(_cg(f), x0, None, max_iters=500, tol=1e-8)
        assert float(res.f) < 1e-4

    def test_chained_lq(self):
        # f = Σ max(−x_i − x_{i+1}, −x_i − x_{i+1} + x_i² + x_{i+1}² − 1)
        def f(x):
            a = -x[:-1] - x[1:]
            b = a + x[:-1] ** 2 + x[1:] ** 2 - 1.0
            return jnp.sum(jnp.maximum(a, b))

        n = 6
        res = lmbm.minimize(_cg(f), -0.5 * jnp.ones(n), None, max_iters=500)
        # optimum: x_i = 1/sqrt(2) ⇒ f* = −(n−1)·sqrt(2)
        f_star = -(n - 1) * np.sqrt(2)
        assert float(res.f) < f_star + 0.05

    def test_smooth_quadratic_sanity(self):
        f = lambda x: 0.5 * jnp.sum(x * x * jnp.array([1.0, 10.0, 100.0]))
        res = lmbm.minimize(_cg(f), jnp.ones(3), None, max_iters=300)
        assert float(res.f) < 1e-8

    def test_jit_vmap(self):
        f = lambda x: jnp.sum(jnp.abs(x)) + 0.5 * jnp.sum(x * x)
        solve = jax.jit(
            lambda x0: lmbm.minimize(_cg(f), x0, None, max_iters=100).f
        )
        out = jax.vmap(solve)(jnp.array([[2.0, -1.0], [0.5, 3.0]]))
        assert np.all(np.asarray(out) < 1e-3)


class TestAggregation:
    def test_three_point_simplex_minimum(self):
        """_aggregate3 must return the exact simplex-constrained minimizer
        of φ(λ) = ‖λᵀG‖² + 2λᵀβ — cross-checked against a dense grid."""
        rng = np.random.default_rng(3)
        for trial in range(8):
            G = jnp.asarray(rng.normal(size=(3, 5)))
            betas = jnp.asarray(np.abs(rng.normal(size=2)))
            g_agg, b_agg = lmbm._aggregate3(
                G[0], G[1], G[2], betas[0], betas[1]
            )
            b3 = jnp.array([0.0, betas[0], betas[1]])

            def phi(lam):
                v = lam @ np.asarray(G)
                return float(v @ v + 2.0 * lam @ np.asarray(b3))

            phi_star = float(
                np.asarray(g_agg) @ np.asarray(g_agg)
            ) + 2.0 * float(b_agg)
            # dense grid over the simplex
            best = np.inf
            for a in np.linspace(0, 1, 41):
                for b in np.linspace(0, 1 - a, 41):
                    best = min(best, phi(np.array([a, b, 1 - a - b])))
            assert phi_star <= best + 1e-6, (trial, phi_star, best)

    def test_null_step_locality_progress(self):
        """On f = max_i |x_i| (subgradient flips every step), the locality-
        aware aggregation must still drive the iterate to the optimum."""
        f = lambda x: jnp.max(jnp.abs(x))
        res = lmbm.minimize(_cg(f), jnp.array([2.0, -1.5, 0.7]), None,
                            max_iters=400)
        assert float(res.f) < 5e-3


class TestBackendParity:
    def test_lmbm_vs_lbfgs_on_backend_cost(self):
        from isdf_tpu.config import Config
        from isdf_tpu.core import flatness as fl, timemap
        from isdf_tpu.opt import backend
        from isdf_tpu.shapes import make_shape

        conf = Config(integralIntervs=8, sweep_coarse_samples=16,
                      sweep_refine_rounds=6, vmax=5.0, omgmax=5.0,
                      thetamax=1.5, safety_hor=0.4)
        shape = make_shape("Ball")
        params = fl.FlatParams.from_config(conf)
        w = backend.BackendWeights.from_config(conf)
        N = 3
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([6.0, 0.0, 1.0]))
        q0 = jnp.array([[2.0, 0.0, 0.5], [4.0, 0.0, 0.5]])
        T0 = jnp.full(3, 2.0)
        x0 = backend.pack(timemap.T_to_tau(T0), q0)
        pts = jnp.array([[3.0, 0.0, 0.5], [2.0, 0.3, 0.4]])
        mask = jnp.array([True, True])
        cg = backend.make_cost_fn(
            shape, params, w, head, tail, N, pts, mask,
            integral_res=8, coarse_n=16, refine_rounds=6,
        )
        t0 = jnp.zeros(2)
        r_bundle = lmbm.minimize(cg, x0, t0, max_iters=120)
        r_lbfgs = lbfgs.minimize(cg, x0, t0, max_iters=120)
        f0 = float(cg(x0, t0)[0])
        assert float(r_bundle.f) < 0.5 * f0
        # comparable quality (within 25% of each other)
        ratio = float(r_bundle.f) / float(r_lbfgs.f)
        assert 0.6 < ratio < 1.67, (float(r_bundle.f), float(r_lbfgs.f))


class TestSR1DualModel:
    def test_sr1_direction_recovers_newton_on_quadratic(self):
        """With full-rank pairs on a quadratic, the inverse-SR1 compact
        model reproduces H = A⁻¹ exactly (classic SR1 n-step property)."""
        from isdf_tpu.opt.lmbm import _sr1_direction

        rng = np.random.default_rng(0)
        n, m = 5, 8
        Amat = rng.normal(size=(n, n))
        Amat = Amat @ Amat.T + np.eye(n)  # SPD Hessian
        S = np.zeros((m, n))
        Y = np.zeros((m, n))
        for k in range(n):
            s = rng.normal(size=n)
            S[k] = s
            Y[k] = Amat @ s
        g = rng.normal(size=n)
        d = _sr1_direction(
            jnp.asarray(g), jnp.asarray(S), jnp.asarray(Y),
            jnp.zeros(m), jnp.asarray(n), jnp.asarray(n % m), m)
        np.testing.assert_allclose(
            np.asarray(d), -np.linalg.solve(Amat, g), rtol=1e-6, atol=1e-8)

    def test_dual_model_on_nonsmooth(self):
        """SR1-on vs SR1-off on a nonsmooth test function: both converge;
        the dual model must not regress the endpoint."""
        from isdf_tpu.opt import lmbm

        def cg(x, aux):
            # sharp-ridge MAXQ-like function: max_i x_i^2 (nonsmooth)
            f = jnp.max(x * x)
            g = jax.grad(lambda z: jnp.max(z * z))(x)
            return f, g, aux

        x0 = jnp.asarray(np.linspace(1.0, 2.0, 8))
        r_on = lmbm.minimize(cg, x0, None, max_iters=200,
                             sr1_null_steps=True)
        r_off = lmbm.minimize(cg, x0, None, max_iters=200,
                              sr1_null_steps=False)
        assert float(r_on.f) < 1e-4
        assert float(r_on.f) <= float(r_off.f) * 10 + 1e-6
