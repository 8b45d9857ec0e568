from isdf_tpu.core.poly import PolyTraj  # noqa: F401
from isdf_tpu.core import minco, flatness, smoothing, timemap, so3  # noqa: F401
