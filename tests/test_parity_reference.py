"""Golden parity against the REFERENCE implementation itself.

`native/parity/golden_dump.cpp` compiles the reference's header-only math
(/root/reference/src/utils/include/utils/{minco,flatness,trajectory,lbfgs}.hpp)
and dumps inputs + outputs for fixed deterministic cases into
`tests/golden/reference_golden.json` (committed).  These tests replay the
same inputs through the JAX re-derivations at f64:

  * MINCO S3 solve: coefficients, jerk energy, analytic energy gradients
    (vs autodiff), and the adjoint propagateGrad (vs autodiff of the solve)
  * Trajectory evaluation p/v/a/j + exact max vel/acc rates (root finding)
  * flatness forward (thrust, quat, ω) and the 170-line hand-written
    backwardthreadsafe (vs one jax.vjp)
  * LBFGS-Lite on a strongly-convex anisotropic problem (unique minimizer)

Tolerances: 1e-8 relative for linear algebra, 1e-6 for optimizer endpoints
(VERDICT r1 item 2).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.core import minco
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.opt import lbfgs

pytestmark = pytest.mark.smoke

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "reference_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def det(i):
    """The dump's deterministic input stream (golden_dump.cpp det())."""
    return np.sin(0.7 * i + 0.3) * (1.0 + 0.1 * (i % 7))


class TestMincoS3Parity:
    @pytest.fixture(scope="class")
    def case(self, golden):
        g = golden["minco_s3"]
        N = int(g["N"])
        head = jnp.asarray(np.reshape(g["head"], (3, 3)))
        tail = jnp.asarray(np.reshape(g["tail"], (3, 3)))
        q = jnp.asarray(np.reshape(g["q"], (3, N - 1)).T)      # ours: (N-1,3)
        T = jnp.asarray(np.asarray(g["T"]))
        return g, N, head, tail, q, T

    def test_coefficients(self, case):
        g, N, head, tail, q, T = case
        ours = np.asarray(minco.solve(q, T, head, tail))        # (N, 6, 3)
        ref = np.reshape(g["coeffs"], (N, 6, 3))
        np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)

    def test_energy_and_partials(self, case):
        g, N, head, tail, q, T = case
        coeffs = jnp.asarray(np.reshape(g["coeffs"], (N, 6, 3)))
        e = float(minco.energy(coeffs, T))
        np.testing.assert_allclose(e, g["energy"], rtol=1e-9)
        # reference's analytic ∂E/∂c, ∂E/∂T vs our autodiff
        gc, gt = jax.grad(minco.energy, argnums=(0, 1))(coeffs, T)
        np.testing.assert_allclose(
            np.asarray(gc), np.reshape(g["energy_grad_coeffs"], (N, 6, 3)),
            rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(g["energy_grad_times"]),
            rtol=1e-8, atol=1e-8)

    def test_adjoint_propagate_grad(self, case):
        """propogateGrad (minco.hpp:584-654, banded adjoint solve) ==
        autodiff through our dense solve of the scalar
        f(q, T) = <costGradC, c(q,T)> + <costGradT, T>."""
        g, N, head, tail, q, T = case
        cgc = jnp.asarray(np.reshape(g["cost_grad_coeffs"], (N, 6, 3)))
        cgt = jnp.asarray(np.asarray(g["cost_grad_times"]))

        def f(q_, T_):
            c = minco.solve(q_, T_, head, tail)
            return jnp.sum(c * cgc) + jnp.sum(T_ * cgt)

        gq, gt = jax.grad(f, argnums=(0, 1))(q, T)
        ref_gp = np.reshape(g["adj_grad_points"], (3, N - 1)).T
        np.testing.assert_allclose(np.asarray(gq), ref_gp,
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(gt),
                                   np.asarray(g["adj_grad_times"]),
                                   rtol=1e-8, atol=1e-8)

    def test_trajectory_eval(self, case):
        g, N, head, tail, q, T = case
        traj = PolyTraj(T, jnp.asarray(np.reshape(g["coeffs"], (N, 6, 3))))
        ts = jnp.asarray(np.asarray(g["eval_ts"]))
        pos, vel, acc, jer = jax.vmap(traj.pvaj)(ts)
        K = len(np.asarray(g["eval_ts"]))
        for ours, key in [(pos, "eval_pos"), (vel, "eval_vel"),
                          (acc, "eval_acc"), (jer, "eval_jer")]:
            np.testing.assert_allclose(
                np.asarray(ours), np.reshape(g[key], (K, 3)),
                rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(float(traj.total_duration),
                                   g["total_duration"], rtol=1e-12)

    def test_max_rates_exact(self, case):
        g, N, head, tail, q, T = case
        traj = PolyTraj(T, jnp.asarray(np.reshape(g["coeffs"], (N, 6, 3))))
        np.testing.assert_allclose(traj.max_vel_rate_exact(),
                                   g["max_vel_rate"], rtol=1e-9)
        np.testing.assert_allclose(traj.max_acc_rate_exact(),
                                   g["max_acc_rate"], rtol=1e-9)


class TestFlatnessParity:
    def test_forward(self, golden):
        g = golden["flatness"]
        K = int(g["K"])
        vaj = np.reshape(g["vaj"], (K, 9))
        p = fl.FlatParams(mass=0.61, grav=9.8, dh=0.10, dv=0.10,
                          cp=0.01, veps=1.0e-4)
        vel, acc, jer = (jnp.asarray(vaj[:, :3]), jnp.asarray(vaj[:, 3:6]),
                         jnp.asarray(vaj[:, 6:9]))
        thr, quat, omg = fl.forward_full(
            vel, acc, jer, jnp.zeros(K), jnp.zeros(K), p)
        np.testing.assert_allclose(np.asarray(thr), np.asarray(g["thrust"]),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(quat),
                                   np.reshape(g["quat"], (K, 4)), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(omg),
                                   np.reshape(g["omg"], (K, 3)),
                                   rtol=1e-8, atol=1e-10)

    def test_backward_equals_vjp(self, golden):
        """The reference's 170-line hand-written reverse pass
        (flatness.hpp:230-406) == one jax.vjp of our forward."""
        g = golden["flatness"]
        K = int(g["K"])
        vaj = np.reshape(g["vaj"], (K, 9))
        ref = np.reshape(g["backward_totals"], (K, 12))
        p = fl.FlatParams(mass=0.61, grav=9.8, dh=0.10, dv=0.10,
                          cp=0.01, veps=1.0e-4)
        for k in range(K):
            vel = jnp.asarray(vaj[k, :3])
            acc = jnp.asarray(vaj[k, 3:6])
            jer = jnp.asarray(vaj[k, 6:9])
            gPos = jnp.asarray([det(k * 7 + 50 + i) for i in range(3)])
            gVel = jnp.asarray([det(k * 7 + 53 + i) for i in range(3)])
            gQuat = jnp.asarray([det(k * 9 + 70 + i) for i in range(4)])
            gOmg = jnp.asarray([det(k * 9 + 74 + i) for i in range(3)])

            _, vjp = jax.vjp(lambda v, a, j: fl.forward(v, a, j, p),
                             vel, acc, jer)
            tV, tA, tJ = vjp((gQuat, gOmg))
            # pos passes through untouched; vel cotangent adds directly
            np.testing.assert_allclose(np.asarray(gPos), ref[k, 0:3],
                                       rtol=1e-9)
            np.testing.assert_allclose(np.asarray(tV + gVel), ref[k, 3:6],
                                       rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(np.asarray(tA), ref[k, 6:9],
                                       rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(np.asarray(tJ), ref[k, 9:12],
                                       rtol=1e-7, atol=1e-9)


class TestLbfgsParity:
    def test_convex_endpoint(self, golden):
        g = golden["lbfgs_convex"]
        n = int(g["n"])
        s = jnp.asarray(np.asarray(g["scale"]))
        c = jnp.asarray(np.asarray(g["center"]))
        x0 = jnp.asarray(np.asarray(g["x0"]))

        def raw(x):
            f = 0.5 * jnp.sum(s * x * x)
            f = f + jnp.sum(jnp.log1p((x - c) ** 2))
            d = x[1:] - x[:-1]
            return f + 0.25 * jnp.sum(d * d)

        def cg(x, aux):
            f, grad = jax.value_and_grad(raw)(x)
            return f, grad, aux

        res = lbfgs.minimize(cg, x0, None, m=8, max_iters=200,
                             g_epsilon=1e-12, past=3, rel_cost_tol=1e-14)
        assert int(g["ret"]) >= 0
        np.testing.assert_allclose(float(res.f), g["f_star"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.asarray(g["x_star"]),
                                   rtol=1e-6, atol=1e-8)
