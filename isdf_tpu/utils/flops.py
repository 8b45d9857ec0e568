"""Analytic FLOP accounting by jaxpr traversal.

XLA's ``compiled.cost_analysis()`` cannot see inside Pallas kernels (they
are opaque custom calls), so the bench counts FLOPs by tracing the SAME
jnp code the kernel inlines (shapes/primitives.py component chain) and
walking the jaxpr: every elementwise arithmetic primitive counts 1 FLOP
per output element (sqrt/div/rsqrt counted as 1 — conservative: they cost
several VPU passes), dot_general counts 2·M·N·K.  Used for the roofline /
MFU figures in bench.py and BASELINE.md.
"""

from __future__ import annotations

import jax
import numpy as np

_ARITH = {
    "add", "sub", "mul", "div", "rem", "neg", "sign", "floor", "ceil",
    "round", "abs", "max", "min", "pow", "integer_pow", "exp", "log",
    "sqrt", "rsqrt", "tanh", "sin", "cos", "atan2", "logistic", "cbrt",
    "square", "reciprocal", "erf", "expm1", "log1p", "clamp", "select_n",
    "nextafter",
}
_COMPARE = {"eq", "ne", "ge", "gt", "le", "lt", "and", "or", "not", "xor"}


def _eqn_flops(eqn) -> float:
    prim = eqn.primitive.name
    out_elems = sum(
        int(np.prod(v.aval.shape)) for v in eqn.outvars
        if hasattr(v.aval, "shape")
    )
    if prim in _ARITH or prim in _COMPARE:
        return float(out_elems)
    if prim == "dot_general":
        a, b = eqn.invars[0].aval, eqn.invars[1].aval
        d = eqn.params["dimension_numbers"]
        contract = d[0][0]
        k = int(np.prod([a.shape[i] for i in contract]))
        return 2.0 * out_elems * k
    if prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
                "cumsum", "cumprod", "argmax", "argmin", "reduce_and",
                "reduce_or"):
        in_elems = int(np.prod(eqn.invars[0].aval.shape))
        return float(in_elems)
    if prim in ("closed_call", "pjit", "custom_jvp_call", "custom_vjp_call",
                "custom_vjp_call_jaxpr", "remat", "checkpoint", "scan",
                "while", "cond", "custom_vmap_call"):
        total = 0.0
        for name in ("jaxpr", "call_jaxpr", "fun_jaxpr", "branches"):
            sub = eqn.params.get(name)
            if sub is None:
                continue
            subs = sub if isinstance(sub, (tuple, list)) else [sub]
            for s in subs:
                j = getattr(s, "jaxpr", s)
                total += _jaxpr_flops(j)
        if prim == "scan":
            total *= eqn.params.get("length", 1)
        return total
    return 0.0


def _jaxpr_flops(jaxpr) -> float:
    return sum(_eqn_flops(e) for e in jaxpr.eqns)


def count_flops(fn, *args) -> float:
    """Estimated FLOPs of one call of ``fn(*args)`` (elementwise = 1/elem)."""
    closed = jax.make_jaxpr(fn)(*args)
    return _jaxpr_flops(closed.jaxpr)
