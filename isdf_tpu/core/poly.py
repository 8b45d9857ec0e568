"""Piecewise-polynomial trajectories as JAX pytrees.

Re-design of the reference's ``Piece<D>``/``Trajectory<D>``
(ref: src/utils/include/utils/trajectory.hpp:38,394,105-150,545): a
trajectory is (durations[N], coeffs[N, n_coef, 3]) with **ascending** power
coefficients per piece — pos(s) = Σ_k coeffs[i, k] s^k for local time s in
piece i.  The container is degree-generic: n_coef = 4/6/8 for MINCO
s = 2/3/4 (the planner's workhorse is the jerk-optimal s=3, TRAJ_ORDER=5).

Everything is shape-static and differentiable; evaluation at a global time
uses a piece lookup whose index is discrete (gradients flow through the
*local time* s = t - Σ_{j<i} T_j, reproducing the reference's
"gradT(j<i) -= …" chain rule for free — ref back_end_optimizer.hpp:642-645).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Derivative-weight tables for an ascending-power polynomial basis:
# deriv_tables(n)[0][d, k] = k!/(k−d)! (0 for k < d), [1][d, k] = max(k−d, 0)
# — i.e. beta_d of the reference (ref back_end_optimizer.hpp:478-483),
# generic in the coefficient count so MINCO s=2 (4 coeffs) / s=3 (6) /
# s=4 (8) all evaluate through the same container.
import functools
import math as _math

import numpy as _np


@functools.lru_cache(maxsize=None)
def deriv_tables(n_coef: int):
    fact = _np.zeros((n_coef + 1, n_coef))
    powr = _np.zeros((n_coef + 1, n_coef), dtype=_np.int32)
    for d in range(n_coef + 1):
        for k in range(n_coef):
            if k >= d:
                fact[d, k] = _math.factorial(k) / _math.factorial(k - d)
                powr[d, k] = k - d
    return fact, powr


def beta(s, order: int, n_coef: int = 6):
    """Basis vector β_order(s) with β·c = d^order pos / ds^order,
    shape (..., n_coef).  Orders ≥ n_coef give the zero vector.

    Powers are built by iterated products and a static gather, NOT jnp.power:
    d/ds s⁰ through jnp.power is 0·s⁻¹ = NaN at s = 0, which every piece's
    first sample hits.
    """
    s = jnp.asarray(s)
    fact, powr = deriv_tables(n_coef)
    order = min(order, n_coef)
    one = jnp.ones_like(s)
    pows = [one]
    for _ in range(n_coef - 1):
        pows.append(pows[-1] * s)
    P = jnp.stack(pows, axis=-1)                      # (..., n_coef)
    return jnp.asarray(fact[order], s.dtype) * P[..., powr[order]]


class PolyTraj(NamedTuple):
    """(durations[N], coeffs[N, n_coef, 3]) — ascending powers.

    n_coef = 2s: 4 for MINCO s=2 (min-acc), 6 for s=3 (min-jerk, the
    planner's workhorse), 8 for s=4 (min-snap)."""

    durations: jax.Array
    coeffs: jax.Array

    @property
    def n_pieces(self) -> int:
        return self.durations.shape[0]

    @property
    def n_coef(self) -> int:
        return self.coeffs.shape[1]

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
        c = self.coeffs[idx]                        # (..., n_coef, 3)
        b = beta(s, order, self.n_coef)             # (..., n_coef)
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
            jnp.einsum("...k,...kd->...d", beta(s, d, self.n_coef), c)
            for d in range(4)
        )
        return out

    def pvajs(self, t):
        """pos/vel/acc/jerk/snap — snap feeds ∂cost/∂T chain rules."""
        idx, s = self.locate(t)
        c = self.coeffs[idx]
        return tuple(
            jnp.einsum("...k,...kd->...d", beta(s, d, self.n_coef), c)
            for d in range(5)
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
