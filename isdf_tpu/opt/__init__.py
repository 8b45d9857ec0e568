from isdf_tpu.opt.lbfgs import minimize as lbfgs_minimize  # noqa: F401
from isdf_tpu.opt import backend, midend  # noqa: F401
