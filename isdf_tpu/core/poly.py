"""Piecewise-polynomial trajectories as JAX pytrees.

Re-design of the reference's ``Piece<D>``/``Trajectory<D>``
(ref: src/utils/include/utils/trajectory.hpp:38,394,105-150,545): a
trajectory is (durations[N], coeffs[N, 6, 3]) with **ascending** power
coefficients per piece — pos(s) = Σ_k coeffs[i, k] s^k for local time s in
piece i.  Degree is fixed at 5 (TRAJ_ORDER=5, jerk-optimal MINCO s=3).

Everything is shape-static and differentiable; evaluation at a global time
uses a piece lookup whose index is discrete (gradients flow through the
*local time* s = t - Σ_{j<i} T_j, reproducing the reference's
"gradT(j<i) -= …" chain rule for free — ref back_end_optimizer.hpp:642-645).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Derivative-weight tables for a degree-5 polynomial in ascending powers.
# basis(s, d)[k] = d^k/ds^k s^k  — i.e. beta_d of the reference
# (ref back_end_optimizer.hpp:478-483).
_FACT = [
    jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),          # pos
    jnp.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0]),          # vel
    jnp.array([0.0, 0.0, 2.0, 6.0, 12.0, 20.0]),        # acc
    jnp.array([0.0, 0.0, 0.0, 6.0, 24.0, 60.0]),        # jerk
    jnp.array([0.0, 0.0, 0.0, 0.0, 24.0, 120.0]),       # snap
    jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 120.0]),        # crackle
]
_POW = [
    jnp.array([0, 1, 2, 3, 4, 5]),
    jnp.array([0, 0, 1, 2, 3, 4]),
    jnp.array([0, 0, 0, 1, 2, 3]),
    jnp.array([0, 0, 0, 0, 1, 2]),
    jnp.array([0, 0, 0, 0, 0, 1]),
    jnp.array([0, 0, 0, 0, 0, 0]),
]


def beta(s, order: int):
    """Basis vector β_order(s) with β·c = d^order pos / ds^order, shape (..., 6).

    Powers are built by iterated products and a static gather, NOT jnp.power:
    d/ds s⁰ through jnp.power is 0·s⁻¹ = NaN at s = 0, which every piece's
    first sample hits.
    """
    s = jnp.asarray(s)
    one = jnp.ones_like(s)
    pows = [one]
    for _ in range(5):
        pows.append(pows[-1] * s)
    P = jnp.stack(pows, axis=-1)                      # (..., 6): s^0..s^5
    return _FACT[order].astype(s.dtype) * P[..., _POW[order]]


class PolyTraj(NamedTuple):
    """(durations[N], coeffs[N, 6, 3]) — ascending powers."""

    durations: jax.Array
    coeffs: jax.Array

    @property
    def n_pieces(self) -> int:
        return self.durations.shape[0]

    @property
    def total_duration(self):
        return jnp.sum(self.durations)

    # -- piece lookup --------------------------------------------------------
    def locate(self, t):
        """Return (piece index, local time) for a global time t.

        The index is discrete (no gradient); the local time is differentiable
        in both t and the durations (ref trajectory.hpp:545 locatePieceIdx).
        """
        cum = jnp.cumsum(self.durations)
        starts = cum - self.durations
        t = jnp.asarray(t)
        tc = jnp.clip(t, 0.0, cum[-1])
        idx = jnp.clip(
            jnp.searchsorted(cum, jax.lax.stop_gradient(tc), side="left"),
            0,
            self.n_pieces - 1,
        )
        s = t - starts[idx]
        return idx, s

    # -- evaluation ----------------------------------------------------------
    def eval_local(self, idx, s, order: int = 0):
        """Evaluate derivative `order` of piece `idx` at local time `s` → (..., 3)."""
        c = self.coeffs[idx]                        # (..., 6, 3)
        b = beta(s, order)                          # (..., 6)
        return jnp.einsum("...k,...kd->...d", b, c)

    def eval(self, t, order: int = 0):
        idx, s = self.locate(t)
        return self.eval_local(idx, s, order)

    def pos(self, t):
        return self.eval(t, 0)

    def vel(self, t):
        return self.eval(t, 1)

    def acc(self, t):
        return self.eval(t, 2)

    def jerk(self, t):
        return self.eval(t, 3)

    def pvaj(self, t):
        """Fused pos/vel/acc/jerk (ref trajectory.hpp:105 getPos_Vel_Acc_Jerk)."""
        idx, s = self.locate(t)
        c = self.coeffs[idx]
        out = tuple(
            jnp.einsum("...k,...kd->...d", beta(s, d), c) for d in range(4)
        )
        return out

    def pvajs(self, t):
        """pos/vel/acc/jerk/snap — snap feeds ∂cost/∂T chain rules."""
        idx, s = self.locate(t)
        c = self.coeffs[idx]
        return tuple(
            jnp.einsum("...k,...kd->...d", beta(s, d), c) for d in range(5)
        )

    # -- sampling ------------------------------------------------------------
    def sample(self, n: int, order: int = 0):
        """Evaluate `order` at n uniformly spaced global times (incl. ends)."""
        ts = jnp.linspace(0.0, self.total_duration, n)
        return ts, jax.vmap(lambda t: self.eval(t, order))(ts)

    # -- max rates (ref trajectory.hpp getMaxVelRate/getMaxAccRate) ----------
    def max_vel_rate(self, samples_per_piece: int = 64):
        ts = jnp.linspace(0.0, self.total_duration, self.n_pieces * samples_per_piece)
        v = jax.vmap(self.vel)(ts)
        return jnp.max(jnp.linalg.norm(v, axis=-1))

    def max_acc_rate(self, samples_per_piece: int = 64):
        ts = jnp.linspace(0.0, self.total_duration, self.n_pieces * samples_per_piece)
        a = jax.vmap(self.acc)(ts)
        return jnp.max(jnp.linalg.norm(a, axis=-1))

    def junction_positions(self):
        """Positions at piece boundaries (N+1 points)."""
        start = self.coeffs[:, 0, :]                # value at s=0
        last = self.eval_local(self.n_pieces - 1, self.durations[-1], 0)
        return jnp.concatenate([start, last[None]], axis=0)

    # -- exact max rates via polynomial roots (host-side; ref
    #    trajectory.hpp getMaxVelRate/getMaxAccRate + root_finder.hpp) ------
    def _max_rate_exact(self, order: int) -> float:
        """Exact max ‖d^order pos/dt^order‖ over the trajectory.

        The reference isolates the real roots of d/ds ‖f'(s)‖² with its
        recursive root_finder (root_finder.hpp:1-1237); here the critical
        points come from the companion-matrix eigenvalues of the same
        derivative polynomial (numpy.roots) — a tiny host computation per
        piece, exact to machine precision, used by audits/serving (not in
        the jit hot path, where the sampled variants below suffice).
        """
        import numpy as np

        best = 0.0
        coeffs = np.asarray(self.coeffs, dtype=np.float64)  # (N, 6, 3)
        durs = np.asarray(self.durations, dtype=np.float64)
        for i in range(coeffs.shape[0]):
            # derivative-of-interest coefficients, ascending powers
            c = coeffs[i]
            for _ in range(order):
                c = c[1:] * np.arange(1, c.shape[0])[:, None]
            # g(s) = ‖c(s)‖² ; critical points: g'(s) = 0
            g = np.zeros(2 * c.shape[0] - 1)
            for ax in range(3):
                g += np.convolve(c[:, ax], c[:, ax])
            dg = g[1:] * np.arange(1, len(g))
            cand = [0.0, durs[i]]
            if np.any(dg != 0.0):
                r = np.roots(dg[::-1])
                r = r[np.abs(r.imag) < 1e-9].real
                cand += list(r[(r > 0.0) & (r < durs[i])])
            s = np.asarray(cand)
            val = np.polyval(g[::-1], s).max()
            best = max(best, float(val))
        return float(np.sqrt(max(best, 0.0)))

    def max_vel_rate_exact(self) -> float:
        return self._max_rate_exact(1)

    def max_acc_rate_exact(self) -> float:
        return self._max_rate_exact(2)

    def check_feasibility(self, vmax: float, amax: float) -> bool:
        """True iff max ‖v‖ ≤ vmax and max ‖a‖ ≤ amax (exact, host-side;
        ref trajectory.hpp checkMaxVelRate/checkMaxAccRate)."""
        return (self.max_vel_rate_exact() <= vmax
                and self.max_acc_rate_exact() <= amax)
