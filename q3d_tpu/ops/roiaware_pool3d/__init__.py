from .roiaware_pool3d_utils import (  # noqa: F401
    points_in_boxes_cpu,
    points_in_boxes_jax,
    roiaware_pool3d,
)
