from isdf_tpu.world.gridmap import GridMap  # noqa: F401
from isdf_tpu.world import maps_gen, aabb  # noqa: F401
from isdf_tpu.world.moving import MovingObstacle, predict_traj, compose_map  # noqa: F401
