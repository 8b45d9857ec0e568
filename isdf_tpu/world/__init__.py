from isdf_tpu.world.gridmap import GridMap  # noqa: F401
from isdf_tpu.world import maps_gen, aabb  # noqa: F401
