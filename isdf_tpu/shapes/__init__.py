from isdf_tpu.shapes import primitives, ops  # noqa: F401
from isdf_tpu.shapes.zoo import Shape, make_shape, SHAPE_REGISTRY  # noqa: F401
