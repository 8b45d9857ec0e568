"""Unit parity tests for core math: MINCO solve, energy, flatness, smoothing,
time map, polynomial evaluation — checked against closed forms, boundary
conditions, and finite differences (the reference validates none of this;
SURVEY.md §4 defines this pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.core import minco, flatness, smoothing, timemap
from isdf_tpu.core.poly import PolyTraj, beta
from isdf_tpu.core.so3 import quat_to_rot, rpy_to_rot


def rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float64)


class TestPoly:
    def test_eval_matches_horner(self):
        key = jax.random.PRNGKey(0)
        T = jnp.array([1.3, 0.7, 2.1])
        C = rand(key, 3, 6, 3)
        traj = PolyTraj(T, C)
        t = 1.9  # inside piece 2 (local s = 0.6)
        s = 0.6
        c = np.array(C[1])
        expect = sum(c[k] * s**k for k in range(6))
        np.testing.assert_allclose(np.array(traj.pos(t)), expect, rtol=1e-12)
        # velocity
        expect_v = sum(k * c[k] * s ** (k - 1) for k in range(1, 6))
        np.testing.assert_allclose(np.array(traj.vel(t)), expect_v, rtol=1e-12)

    def test_time_gradient_chain(self):
        """∂pos(t*)/∂T_j = -vel for j < piece(t*) — the reference's
        gradT(j<i) chain (back_end_optimizer.hpp:642-645) via autodiff."""
        key = jax.random.PRNGKey(1)
        C = rand(key, 3, 6, 3)
        t_star = 2.5  # piece 2 when T = [1, 1, 1]

        def posx(T):
            return PolyTraj(T, C).pos(t_star)[0]

        g = jax.grad(posx)(jnp.array([1.0, 1.0, 1.0]))
        v = PolyTraj(jnp.array([1.0, 1.0, 1.0]), C).vel(t_star)[0]
        np.testing.assert_allclose(np.array(g[:2]), -float(v) * np.ones(2), rtol=1e-9)
        assert abs(float(g[2])) < 1e-12

    def test_max_rate_exact_vs_dense_sampling(self):
        """Companion-matrix max rates (root_finder.hpp equivalent) must
        dominate and closely match a dense-sampling estimate."""
        key = jax.random.PRNGKey(7)
        T = jnp.array([1.1, 0.9, 1.7])
        C = rand(key, 3, 6, 3)
        traj = PolyTraj(T, C)
        ts = jnp.linspace(0.0, traj.total_duration, 20001)
        v = jnp.linalg.norm(jax.vmap(traj.vel)(ts), axis=-1)
        a = jnp.linalg.norm(jax.vmap(traj.acc)(ts), axis=-1)
        v_ex = traj.max_vel_rate_exact()
        a_ex = traj.max_acc_rate_exact()
        assert v_ex >= float(v.max()) - 1e-9
        assert a_ex >= float(a.max()) - 1e-9
        np.testing.assert_allclose(v_ex, float(v.max()), rtol=1e-4)
        np.testing.assert_allclose(a_ex, float(a.max()), rtol=1e-4)
        big = max(v_ex, a_ex) + 1.0
        assert traj.check_feasibility(big, big)
        assert not traj.check_feasibility(v_ex * 0.99, big)

    def test_beta_matches_reference_rows(self):
        # ref back_end_optimizer.hpp:478-483 (beta0..beta4 at s1)
        s1 = 0.7
        b1 = np.array(beta(jnp.float64(s1), 1))
        np.testing.assert_allclose(
            b1, [0, 1, 2 * s1, 3 * s1**2, 4 * s1**3, 5 * s1**4], rtol=1e-12
        )
        b4 = np.array(beta(jnp.float64(s1), 4))
        np.testing.assert_allclose(b4, [0, 0, 0, 0, 24.0, 120.0 * s1], rtol=1e-12)


class TestMinco:
    def _setup(self, N=4, s=3, key=0):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
        q = rand(k1, N - 1, 3) * 3.0
        T = jnp.abs(rand(k2, N)) + 0.8
        head = jnp.zeros((3, s)).at[:, 0].set(rand(k3, 3))
        tail = jnp.zeros((3, s)).at[:, 0].set(jnp.array([5.0, 1.0, 2.0]))
        return q, T, head, tail

    @pytest.mark.parametrize("s", [2, 3, 4])
    def test_boundary_and_waypoints(self, s):
        q, T, head, tail = self._setup(N=4, s=s)
        c = minco.solve(q, T, head, tail, s=s)
        nc = 2 * s
        # head conditions: derivative d at t=0 is d! * c[0, d]
        import math

        for d in range(s):
            np.testing.assert_allclose(
                np.array(c[0, d] * math.factorial(d)), np.array(head[:, d]), atol=1e-8
            )
        # waypoints: piece i evaluated at T_i equals q_i
        for i in range(3):
            b = np.array([float(T[i]) ** k for k in range(nc)])
            np.testing.assert_allclose(
                np.array(c[i]).T @ b, np.array(q[i]), atol=1e-8
            )

    @pytest.mark.parametrize("s", [2, 3, 4])
    def test_continuity(self, s):
        q, T, head, tail = self._setup(N=4, s=s)
        c = minco.solve(q, T, head, tail, s=s)
        nc = 2 * s
        import math

        for i in range(3):
            for d in range(2 * s - 1):
                b = np.zeros(nc)
                for k in range(d, nc):
                    b[k] = (
                        math.factorial(k) / math.factorial(k - d)
                    ) * float(T[i]) ** (k - d)
                left = np.array(c[i]).T @ b
                b0 = np.zeros(nc)
                b0[d] = math.factorial(d)
                right = np.array(c[i + 1]).T @ b0
                np.testing.assert_allclose(left, right, atol=1e-7)

    def test_energy_matches_reference_constants(self):
        """s=3 energy formula vs minco.hpp:530-543 hard-coded constants."""
        q, T, head, tail = self._setup(N=3, s=3)
        c = minco.solve(q, T, head, tail, s=3)
        cn, Tn = np.array(c), np.array(T)
        expect = 0.0
        for i in range(3):
            b = cn[i]  # rows c0..c5 (ascending) == reference b rows
            T1 = Tn[i]
            T2, T3, T4, T5 = T1**2, T1**3, T1**4, T1**5
            expect += (
                36.0 * b[3] @ b[3] * T1
                + 144.0 * b[4] @ b[3] * T2
                + 192.0 * b[4] @ b[4] * T3
                + 240.0 * b[5] @ b[3] * T3
                + 720.0 * b[5] @ b[4] * T4
                + 720.0 * b[5] @ b[5] * T5
            )
        got = float(minco.energy(c, T, s=3))
        np.testing.assert_allclose(got, expect, rtol=1e-10)

    def test_energy_is_integral_of_sq_jerk(self):
        q, T, head, tail = self._setup(N=3, s=3)
        c = minco.solve(q, T, head, tail, s=3)
        traj = PolyTraj(T, c)
        ts = np.linspace(0, float(traj.total_duration), 20001)
        j = np.array(jax.vmap(traj.jerk)(jnp.array(ts)))
        num = np.trapezoid((j**2).sum(-1), ts)
        np.testing.assert_allclose(float(minco.energy(c, T)), num, rtol=1e-4)

    def test_energy_grads_vs_fd(self):
        q, T, head, tail = self._setup(N=4, s=3)

        def E(q, T):
            return minco.energy(minco.solve(q, T, head, tail), T)

        gq, gT = jax.grad(E, argnums=(0, 1))(q, T)
        eps = 1e-6
        for idx in [(0, 1), (2, 2)]:
            qp = q.at[idx].add(eps)
            qm = q.at[idx].add(-eps)
            fd = (E(qp, T) - E(qm, T)) / (2 * eps)
            np.testing.assert_allclose(float(gq[idx]), float(fd), rtol=1e-4)
        Tp = T.at[1].add(eps)
        Tm = T.at[1].add(-eps)
        fd = (E(q, Tp) - E(q, Tm)) / (2 * eps)
        np.testing.assert_allclose(float(gT[1]), float(fd), rtol=1e-4)


class TestFlatness:
    def setup_method(self):
        self.p = flatness.FlatParams()

    def _ref_forward(self, v, a, j, p):
        """Literal transcription of the reference formulas for oracle testing
        (flatness.hpp:88-148), numpy scalars."""
        v0, v1, v2 = v
        a0, a1, a2 = a
        cp_term = np.sqrt(v0 * v0 + v1 * v1 + v2 * v2 + p.veps)
        w_term = 1.0 + p.cp * cp_term
        w = w_term * np.array(v)
        dh_over_m = p.dh / p.mass
        zu = np.array(a) + dh_over_m * w + np.array([0, 0, p.grav])
        zu_sqr_norm = zu @ zu
        zu_norm = np.sqrt(zu_sqr_norm)
        z = zu / zu_norm
        tilt_den = np.sqrt(2.0 * (1.0 + z[2]))
        quat = np.array([0.5 * tilt_den, -z[1] / tilt_den, z[0] / tilt_den, 0.0])
        ng_den = zu_sqr_norm * zu_norm
        ng = np.zeros((3, 3))
        ng[0, 0] = (zu[1] ** 2 + zu[2] ** 2) / ng_den
        ng[1, 1] = (zu[0] ** 2 + zu[2] ** 2) / ng_den
        ng[2, 2] = (zu[0] ** 2 + zu[1] ** 2) / ng_den
        ng[0, 1] = ng[1, 0] = -zu[0] * zu[1] / ng_den
        ng[0, 2] = ng[2, 0] = -zu[0] * zu[2] / ng_den
        ng[1, 2] = ng[2, 1] = -zu[1] * zu[2] / ng_den
        v_dot_a = np.dot(v, a)
        dw_term = p.cp * v_dot_a / cp_term
        dw = w_term * np.array(a) + dw_term * np.array(v)
        dz_term = np.array(j) + dh_over_m * dw
        dz = ng @ dz_term
        omg_den = z[2] + 1.0
        omg_term = dz[2] / omg_den
        omg = np.array(
            [
                -dz[1] + z[1] * omg_term,
                dz[0] - z[0] * omg_term,
                (z[1] * dz[0] - z[0] * dz[1]) / omg_den,
            ]
        )
        return quat, omg

    def test_forward_matches_reference(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            v = rng.normal(size=3) * 3
            a = rng.normal(size=3) * 2
            j = rng.normal(size=3)
            quat, omg = flatness.forward(
                jnp.array(v), jnp.array(a), jnp.array(j), self.p
            )
            rq, romg = self._ref_forward(v, a, j, self.p)
            np.testing.assert_allclose(np.array(quat), rq, atol=1e-10)
            np.testing.assert_allclose(np.array(omg), romg, atol=1e-10)

    def test_quat_normalized_and_rot(self):
        v = jnp.array([1.0, -2.0, 0.5])
        a = jnp.array([0.3, 0.2, -0.4])
        j = jnp.zeros(3)
        quat, _ = flatness.forward(v, a, j, self.p)
        np.testing.assert_allclose(float(jnp.linalg.norm(quat)), 1.0, atol=1e-12)
        R = quat_to_rot(quat)
        np.testing.assert_allclose(
            np.array(R @ R.T), np.eye(3), atol=1e-12
        )
        # body z column equals normalized zu
        zu, *_ = flatness._zu(v, a, self.p)
        z = zu / jnp.linalg.norm(zu)
        np.testing.assert_allclose(np.array(R[:, 2]), np.array(z), atol=1e-12)

    def test_full_forward_hover(self):
        p = self.p
        z = jnp.zeros(3)
        thr, quat, omg = flatness.forward_full(z, z, z, 0.0, 0.0, p)
        np.testing.assert_allclose(float(thr), p.mass * p.grav, rtol=1e-9)
        np.testing.assert_allclose(np.array(quat), [1, 0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.array(omg), 0.0, atol=1e-12)

    def test_grad_no_nan(self):
        def f(v):
            q, o = flatness.forward(v, jnp.ones(3), jnp.ones(3), self.p)
            return jnp.sum(q**2) + jnp.sum(o**2)

        g = jax.grad(f)(jnp.array([0.0, 0.0, 0.0]))
        assert np.all(np.isfinite(np.array(g)))


class TestSmoothing:
    def test_values_match_reference(self):
        mu = 0.01
        xs = [-1.0, 0.0, 0.004, 0.01, 5.0]
        for x in xs:
            f = float(smoothing.smoothed_l1(jnp.float64(x), mu))
            if x <= 0:
                expect = 0.0
            elif x > mu:
                expect = x - 0.5 * mu
            else:
                xdmu = x / mu
                expect = (mu - 0.5 * x) * xdmu**3
            np.testing.assert_allclose(f, expect, atol=1e-15)

    def test_grad_matches_reference_df(self):
        mu = 0.01
        for x in [0.004, 0.008, 0.5]:
            g = float(jax.grad(smoothing.smoothed_l1)(jnp.float64(x), mu))
            if x > mu:
                expect = 1.0
            else:
                xdmu = x / mu
                expect = xdmu**2 * (-0.5 * xdmu + 3.0 * (mu - 0.5 * x) / mu)
            np.testing.assert_allclose(g, expect, rtol=1e-12)

    def test_c1_at_zero(self):
        g = float(jax.grad(smoothing.smoothed_l1)(jnp.float64(0.0), 0.01))
        assert g == 0.0


class TestTimeMap:
    def test_roundtrip(self):
        tau = jnp.linspace(-4, 4, 41)
        T = timemap.tau_to_T(tau)
        assert np.all(np.array(T) > 0)
        back = timemap.T_to_tau(T)
        np.testing.assert_allclose(np.array(back), np.array(tau), atol=1e-9)

    def test_grad_matches_reference(self):
        # ref backwardGradT: dT/dτ = τ+1 (τ>0); (1−τ)/den² (τ≤0)
        for tau in [0.7, -0.9]:
            g = float(jax.grad(timemap.tau_to_T)(jnp.float64(tau)))
            if tau > 0:
                expect = tau + 1.0
            else:
                den = (0.5 * tau - 1.0) * tau + 1.0
                expect = (1.0 - tau) / den**2
            np.testing.assert_allclose(g, expect, rtol=1e-12)


class TestSO3:
    def test_rpy_identity(self):
        np.testing.assert_allclose(np.array(rpy_to_rot(0.0, 0.0, 0.0)), np.eye(3), atol=1e-15)

    def test_quat_vs_rpy_yaw(self):
        th = 0.6
        q = jnp.array([np.cos(th / 2), 0.0, 0.0, np.sin(th / 2)])
        np.testing.assert_allclose(
            np.array(quat_to_rot(q)), np.array(rpy_to_rot(0.0, 0.0, th)), atol=1e-12
        )


class TestGenericDegree:
    """PolyTraj is degree-generic: MINCO s=2 (4 coeffs) and s=4 (8 coeffs)
    evaluate end-to-end through the same container and the gather-free fast
    path (VERDICT r2 missing #6; ref minco.hpp:201 S2NU, :658 S4NU)."""

    @pytest.mark.parametrize("s", [2, 4])
    def test_trajectory_evaluates(self, s):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        N = 4
        q = rand(k1, N - 1, 3) * 2.0
        T = jnp.abs(rand(k2, N)) + 1.0
        head = jnp.zeros((3, s))
        tail = jnp.zeros((3, s)).at[:, 0].set(jnp.array([4.0, 1.0, 0.5]))
        traj = minco.trajectory(q, T, head, tail, s=s)
        assert traj.n_coef == 2 * s
        # endpoints
        np.testing.assert_allclose(np.array(traj.pos(0.0)), 0.0, atol=1e-8)
        np.testing.assert_allclose(
            np.array(traj.pos(traj.total_duration)), [4.0, 1.0, 0.5], atol=1e-7)
        # interior waypoint
        t1 = float(T[0])
        np.testing.assert_allclose(np.array(traj.pos(t1)), np.array(q[0]),
                                   atol=1e-7)

    @pytest.mark.parametrize("s", [2, 3, 4])
    def test_pvaj_matches_finite_difference(self, s):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        N = 3
        q = rand(k1, N - 1, 3)
        T = jnp.abs(rand(k2, N)) + 1.0
        head = jnp.zeros((3, s))
        tail = jnp.zeros((3, s))
        traj = minco.trajectory(q, T, head, tail, s=s)
        t = 1.234
        h = 1e-6
        pos, vel, acc, jer = traj.pvaj(jnp.float64(t))
        v_fd = (traj.pos(t + h) - traj.pos(t - h)) / (2 * h)
        a_fd = (traj.vel(t + h) - traj.vel(t - h)) / (2 * h)
        np.testing.assert_allclose(np.array(vel), np.array(v_fd), atol=1e-5)
        np.testing.assert_allclose(np.array(acc), np.array(a_fd), atol=1e-5)

    @pytest.mark.parametrize("s", [2, 4])
    def test_fast_eval_parity(self, s):
        from isdf_tpu.sweep.fast_eval import pvaj_all

        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        N = 3
        q = rand(k1, N - 1, 3)
        T = jnp.abs(rand(k2, N)) + 1.0
        traj = minco.trajectory(q, T, jnp.zeros((3, s)), jnp.zeros((3, s)),
                                s=s)
        ts = jnp.linspace(0.0, float(traj.total_duration), 37)
        fast = pvaj_all(traj, ts)
        slow = jax.vmap(traj.pvaj)(ts)
        for f, sl in zip(fast[:3], slow[:3]):
            np.testing.assert_allclose(np.array(f), np.array(sl), atol=1e-9)
