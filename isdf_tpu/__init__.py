"""isdf_tpu — TPU-native any-shape trajectory optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ZJU-FAST-Lab/Implicit-SDF-Planner (IROS 2023, "Continuous Implicit SDF Based
Any-shape Robot Trajectory Optimization"): MINCO minimum-jerk polynomial
trajectories, quadrotor differential-flatness attitude maps, implicit robot
body SDFs (analytic zoo + CSG combinators + mesh-derived grids), SE(3)-aware
front-end search with pose-indexed collision kernels, and the swept-volume
collision cost (argmin-over-trajectory-time body SDF) evaluated at batched
obstacle voxels — all jit-compiled end-to-end, scenario-parallel over TPU
meshes.

Layer map (mirrors SURVEY.md §7.1):
  core/     — polynomial trajectories, MINCO solve, flatness, smoothing, τ↔T
  shapes/   — SDF primitives, CSG operators, the reference shape zoo, grid SDFs
  world/    — occupancy grids, ESDF, AABB gathers, procedural map generators
  sweep/    — swept-volume SDF (coarse time scan + fixed-step refinement)
  opt/      — jitted L-BFGS / nonsmooth outer loops, mid-end + back-end costs
  search/   — SE(3) A* front end with precomputed pose-feasibility volumes
  parallel/ — scenario batching, device meshes, shard_map engines
  plan/     — planner manager orchestration (the plan_manager equivalent)
  viz/      — trajectory / swept-mesh export, marching cubes
"""

__version__ = "0.1.0"

from isdf_tpu.config import Config  # noqa: F401
