from isdf_tpu.sim.quadrotor import QuadrotorParams, QuadState, step as quad_step, rollout  # noqa: F401
from isdf_tpu.sim.so3_control import SO3ControlGains, so3_control  # noqa: F401
from isdf_tpu.sim.fake_drone import cmd_to_odom  # noqa: F401
from isdf_tpu.sim.depth_render import (  # noqa: F401
    CameraIntrinsics, render_depth, render_pointcloud,
)
