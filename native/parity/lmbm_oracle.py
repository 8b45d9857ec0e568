"""ctypes harness around the reference's prebuilt Fortran LMBM solver.

The reference back end is driven by ``lmbm::lmbm_optimize`` (ref
src/utils/include/lmbm/lmbm.cpp:76 → ``lmbmu_`` in lmbm_main.f), shipped
prebuilt as ``lmbm.so`` next to its sources.  This module loads that .so
READ-ONLY and exposes it as a Python oracle so ``isdf_tpu/opt/lmbm.py`` can
be parity-tested against the actual Fortran
(tests/test_parity_reference.py::TestLmbmParity — VERDICT r3 next-round #4).

Nothing here is copied from the reference: this file only declares the ABI
(struct layout verified against offsetof) and marshals callbacks.
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_SO = "/root/reference/src/utils/include/lmbm/lmbm.so"
# C++ mangling of lmbm::lmbm_optimize(int, double*, double*, ...)
_SYM = "_ZN4lmbm13lmbm_optimizeEiPdS0_PFdPvPKdS0_iES1_PFiS1_S3_iEPNS_16lmbm_parameter_tE"


class LmbmParams(C.Structure):
    """Mirror of lmbm::lmbm_parameter_t (offsets verified: size 112,
    doubles start at 48)."""

    _fields_ = [
        ("timeout", C.c_float),
        ("bundle_size", C.c_int),
        ("ini_corrections", C.c_int),
        ("max_corrections", C.c_int),
        ("exponent_distmeasure", C.c_int),
        ("max_iterations", C.c_int),
        ("max_evaluations", C.c_int),
        ("past", C.c_int),
        ("verbose", C.c_int),
        ("update_method", C.c_int),
        ("scaling_strategy", C.c_int),
        ("delta_past", C.c_double),
        ("f_rel_eps", C.c_double),
        ("f_lower_bound", C.c_double),
        ("terminate_param1", C.c_double),
        ("terminate_param2", C.c_double),
        ("distance_measure", C.c_double),
        ("sufficient_dec", C.c_double),
        ("max_stepsize", C.c_double),
    ]


assert C.sizeof(LmbmParams) == 112

_EVAL_T = C.CFUNCTYPE(C.c_double, C.c_void_p, C.POINTER(C.c_double),
                      C.POINTER(C.c_double), C.c_int)
_PROG_T = C.CFUNCTYPE(C.c_int, C.c_void_p, C.POINTER(C.c_double), C.c_int)


def available() -> bool:
    if not os.path.exists(_SO):
        return False
    try:
        C.CDLL(_SO)
        return True
    except OSError:
        return False


def optimize_ref(fn, x0, **param_overrides):
    """Run the reference Fortran LMBM on ``fn``.

    fn: callable(x: np.ndarray) -> (f: float, g: np.ndarray) — the
    objective + subgradient, evaluated in float64.
    Returns dict(x, f, n_evals, n_iters, status).
    """
    lib = C.CDLL(_SO)
    opt = getattr(lib, _SYM)
    opt.restype = C.c_int
    opt.argtypes = [C.c_int, C.POINTER(C.c_double), C.POINTER(C.c_double),
                    _EVAL_T, C.c_void_p, _PROG_T, C.POINTER(LmbmParams)]

    x0 = np.asarray(x0, np.float64)
    n = x0.shape[0]
    x = np.array(x0, np.float64)
    fx = C.c_double(0.0)
    counts = {"evals": 0, "iters": 0}

    @_EVAL_T
    def _eval(_inst, xp, gp, nn):
        counts["evals"] += 1
        xv = np.ctypeslib.as_array(xp, shape=(nn,))
        f, g = fn(xv.copy())
        gv = np.ctypeslib.as_array(gp, shape=(nn,))
        gv[:] = np.asarray(g, np.float64)
        return float(f)

    @_PROG_T
    def _prog(_inst, _xp, k):
        counts["iters"] = max(counts["iters"], int(k))
        return 0

    p = LmbmParams(
        timeout=300.0, bundle_size=2, ini_corrections=7, max_corrections=15,
        exponent_distmeasure=2, max_iterations=10000, max_evaluations=20000,
        past=10, verbose=-1, update_method=0, scaling_strategy=0,
        delta_past=1e-8, f_rel_eps=1e4, f_lower_bound=-1e60,
        terminate_param1=1e-6, terminate_param2=1e-6, distance_measure=0.5,
        sufficient_dec=1e-4, max_stepsize=1.5,
    )
    for k, v in param_overrides.items():
        setattr(p, k, v)

    status = opt(n, x.ctypes.data_as(C.POINTER(C.c_double)), C.byref(fx),
                 _eval, None, _prog, C.byref(p))
    return {
        "x": x, "f": float(fx.value), "n_evals": counts["evals"],
        "n_iters": counts["iters"], "status": int(status),
    }
