from .iou3d_nms_utils import (  # noqa: F401
    boxes_bev_overlap,
    boxes_iou_bev,
    boxes_iou3d,
    boxes_aligned_iou3d,
    nms_bev,
    nms_normal_bev,
)
