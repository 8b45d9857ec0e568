"""Golden parity of opt/lmbm.py against the reference's ACTUAL Fortran LMBM
(the solver that drives the reference back end, ref
src/utils/include/lmbm/lmbm.cpp:76 → lmbm_main.f lmbmu_), loaded read-only
through native/parity/lmbm_oracle.py (VERDICT r3 next-round #4).

The upstream test objectives (tnsunc.f) are not shipped with the reference,
so the classic Haarala/Karmitsa problem set is re-implemented here from its
published definitions — the same objective fed to both solvers.

Tolerances (documented): on problems with known optimum f*, our solver must
land within max(50× the Fortran's achieved error, 1e-3); on the back-end
cost, final costs within a 0.6–1.67 ratio band (the same interchangeability
band the reference claims for its own LMBM↔L-BFGS swap,
back_end_optimizer.hpp:730).  Step counts are compared only loosely (≤20×):
the two implementations share the method, not the schedule.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "native", "parity"))

import lmbm_oracle  # noqa: E402

from isdf_tpu.opt import lmbm  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not lmbm_oracle.available(),
                       reason="reference lmbm.so not loadable"),
]


def _cg(f):
    def cg(x, aux):
        v, g = jax.value_and_grad(f)(x)
        return v, g, aux

    return cg


def _np_fn(f):
    """numpy (x)->(f,g) view of a jax scalar fn, for the Fortran oracle."""
    vg = jax.value_and_grad(f)

    def fn(x):
        v, g = vg(jnp.asarray(x, jnp.float64))
        return float(v), np.asarray(g, np.float64)

    return fn


# --- the classic nonsmooth set (published definitions, both solvers) -------
def maxq(x):
    return jnp.max(x * x)


def maxq_x0(n=20):
    x = np.arange(1.0, n + 1)
    x[n // 2:] *= -1.0
    return x


def mxhilb(x):
    n = x.shape[0]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    A = 1.0 / (i + j + 1.0)
    return jnp.max(jnp.abs(A @ x))


def chained_lq(x):
    a = -x[:-1] - x[1:]
    b = a + x[:-1] ** 2 + x[1:] ** 2 - 1.0
    return jnp.sum(jnp.maximum(a, b))


def chained_cb3(x):
    t1 = x[:-1] ** 4 + x[1:] ** 2
    t2 = (2.0 - x[:-1]) ** 2 + (2.0 - x[1:]) ** 2
    t3 = 2.0 * jnp.exp(-x[:-1] + x[1:])
    return jnp.sum(jnp.maximum(jnp.maximum(t1, t2), t3))


CASES = [
    # (name, f, x0, f*)
    ("maxq", maxq, maxq_x0(20), 0.0),
    ("mxhilb", mxhilb, np.ones(20), 0.0),
    ("chained_lq", chained_lq, -0.5 * np.ones(10), -9 * np.sqrt(2.0)),
    ("chained_cb3", chained_cb3, 2.0 * np.ones(10), 9 * 2.0),
]


class TestLmbmParity:
    @pytest.mark.parametrize("name,f,x0,fstar", CASES,
                             ids=[c[0] for c in CASES])
    def test_problem_set(self, name, f, x0, fstar):
        ref = lmbm_oracle.optimize_ref(_np_fn(f), x0)
        assert ref["status"] in (0, 1, 2), (name, ref["status"])
        # m=15 = the Fortran's max_corrections default (lmbm.h) — memory
        # size is decisive on ill-conditioned problems (MXHILB stalls ~60×
        # worse at m=8; measured sweep in the round-4 notes)
        res = lmbm.minimize(_cg(f), jnp.asarray(x0, jnp.float64), None,
                            m=15, max_iters=1500, tol=1e-8)
        err_ref = abs(ref["f"] - fstar)
        err_ours = abs(float(res.f) - fstar)
        # documented tolerance: within 50× the Fortran's achieved error
        # or 1e-3 absolute, whichever is looser
        assert err_ours <= max(50.0 * err_ref, 1e-3), (
            name, err_ours, err_ref, ref["n_evals"], int(res.n_evals))
        # loose effort sanity — same method class, not the same schedule
        assert int(res.n_evals) <= 20 * max(ref["n_evals"], 50), name

    def test_backend_cost_parity(self):
        """The real target: both solvers on OUR back-end objective (fixed
        inputs) must reach comparable final costs."""
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

        # Fortran side: thread the t* warm seeds through a mutable cell,
        # exactly as the reference threads lastTstar across its callback
        # evaluations (back_end_optimizer.hpp:59,576-578)
        cg_j = jax.jit(cg)
        cell = {"t": jnp.zeros(2, jnp.float64)}

        def np_fn(x):
            fv, g, t_star = cg_j(jnp.asarray(x, jnp.float64), cell["t"])
            cell["t"] = t_star
            return float(fv), np.asarray(g, np.float64)

        ref = lmbm_oracle.optimize_ref(np_fn, np.asarray(x0, np.float64),
                                       max_iterations=200,
                                       max_evaluations=600)
        t0 = jnp.zeros(2, jnp.float64)
        res = lmbm.minimize(cg, jnp.asarray(x0, jnp.float64), t0,
                            max_iters=200)
        f0 = float(cg(jnp.asarray(x0, jnp.float64), t0)[0])
        # both must make major progress, and land in the same quality band
        assert ref["f"] < 0.5 * f0
        assert float(res.f) < 0.5 * f0
        ratio = float(res.f) / ref["f"]
        assert 0.6 < ratio < 1.67, (float(res.f), ref["f"], ref)
