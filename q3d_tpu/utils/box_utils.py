"""Box geometry: corners, range masks, lidar<->camera<->image conversions.

Capability parity with reference ``pcdet/utils/box_utils.py`` (439 LoC:
``boxes_to_corners_3d``, ``mask_boxes_outside_range_numpy``,
``boxes3d_lidar_to_kitti_camera`` and friends), written fresh for JAX with
numpy twins for the host-side data pipeline and KITTI evaluation.

Box convention (same as reference): (x, y, z, dx, dy, dz, heading[, ...])
with (x, y, z) the box CENTER, dx/dy/dz sizes along the box frame x/y/z, and
heading the rotation about +z (counter-clockwise, 0 == +x axis).
"""

import jax.numpy as jnp
import numpy as np

from . import common_utils


_CORNER_TEMPLATE = np.array([
    [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
], dtype=np.float32) / 2.0


def boxes_to_corners_3d(boxes3d):
    """(N, 7) -> (N, 8, 3) corners.

        7 -------- 4
       /|         /|
      6 -------- 5 .
      | |        | |
      . 3 -------- 0
      |/         |/
      2 -------- 1
    """
    xp = jnp if isinstance(boxes3d, jnp.ndarray) else np
    template = xp.asarray(_CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]            # (N,8,3)
    corners = common_utils.rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 7+) -> (N, 4, 2) BEV corners, counter-clockwise order."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    half_dx = boxes[:, 3] * 0.5
    half_dy = boxes[:, 4] * 0.5
    # local frame, counter-clockwise
    lx = xp.stack([half_dx, -half_dx, -half_dx, half_dx], axis=1)    # (N,4)
    ly = xp.stack([half_dy, half_dy, -half_dy, -half_dy], axis=1)
    cosa = xp.cos(boxes[:, 6])[:, None]
    sina = xp.sin(boxes[:, 6])[:, None]
    gx = lx * cosa - ly * sina + boxes[:, 0][:, None]
    gy = lx * sina + ly * cosa + boxes[:, 1][:, None]
    return xp.stack([gx, gy], axis=-1)                               # (N,4,2)


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1,
                                   use_center_to_filter=True):
    """boxes: (N, 7+) numpy -> bool (N,) keep mask (reference box_utils semantics)."""
    if boxes.shape[0] == 0:
        return np.zeros(0, dtype=bool)
    if use_center_to_filter:
        c = boxes[:, 0:3]
        mask = ((c >= np.asarray(limit_range[0:3])) & (c <= np.asarray(limit_range[3:6]))).all(axis=1)
    else:
        corners = boxes_to_corners_3d(boxes)  # (N,8,3)
        inside = ((corners >= np.asarray(limit_range[0:3]))
                  & (corners <= np.asarray(limit_range[3:6]))).all(axis=2)
        mask = inside.sum(axis=1) >= min_num_corners
    return mask


def remove_points_in_boxes3d(points, boxes3d):
    """numpy: drop points whose xyz falls inside any box (used by GT sampling)."""
    from ..ops.roiaware_pool3d import points_in_boxes_cpu
    flags = points_in_boxes_cpu(points[:, 0:3], boxes3d)  # (nboxes, npoints)
    return points[flags.sum(axis=0) == 0]


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    xp = jnp if isinstance(boxes3d, jnp.ndarray) else np
    large = xp.asarray(boxes3d).copy() if xp is np else boxes3d
    extra = xp.asarray(extra_width, dtype=boxes3d.dtype)
    if xp is np:
        large[:, 3:6] = large[:, 3:6] + extra[None, :] * 2
        return large
    return boxes3d.at[:, 3:6].add(extra[None, :] * 2)


# --------------------------------------------------------------------------
# KITTI camera-frame conversions (host-side numpy; used by the KITTI dataset's
# generate_prediction_dicts -> official AP evaluator)
# --------------------------------------------------------------------------

def boxes3d_lidar_to_kitti_camera(boxes3d_lidar, calib):
    """(N, 7) lidar [x,y,z,dx,dy,dz,r] -> (N, 7) camera [x,y,z,l,h,w,ry].

    Lidar box center is the volumetric center; KITTI camera boxes sit on the
    bottom face, with ry measured about the camera -y axis.
    """
    boxes3d_lidar = boxes3d_lidar.copy()
    xyz_lidar = boxes3d_lidar[:, 0:3].copy()
    dx, dy, dz = boxes3d_lidar[:, 3:4], boxes3d_lidar[:, 4:5], boxes3d_lidar[:, 5:6]
    r = boxes3d_lidar[:, 6:7]
    xyz_lidar[:, 2] -= dz.reshape(-1) / 2  # center -> bottom
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    ry = -r - np.pi / 2
    return np.concatenate([xyz_cam, dx, dz, dy, ry], axis=1)  # l=dx, h=dz, w=dy


def boxes3d_kitti_camera_to_lidar(boxes3d_camera, calib):
    """(N, 7) camera [x,y,z,l,h,w,ry] -> (N, 7) lidar [x,y,z,dx,dy,dz,heading]."""
    boxes3d_camera = boxes3d_camera.copy()
    xyz_cam = boxes3d_camera[:, 0:3]
    l, h, w = boxes3d_camera[:, 3:4], boxes3d_camera[:, 4:5], boxes3d_camera[:, 5:6]
    ry = boxes3d_camera[:, 6:7]
    xyz_lidar = calib.rect_to_lidar(xyz_cam)
    xyz_lidar[:, 2] += h.reshape(-1) / 2  # bottom -> center
    heading = -ry - np.pi / 2
    return np.concatenate([xyz_lidar, l, w, h, heading], axis=1)


def boxes3d_kitti_camera_to_imageboxes(boxes3d_camera, calib, image_shape=None):
    """(N, 7) camera boxes -> (N, 4) [x1,y1,x2,y2] image boxes via corner projection."""
    corners = camera_boxes_to_corners_3d(boxes3d_camera)      # (N,8,3)
    pts_img, _ = calib.rect_to_img(corners.reshape(-1, 3))
    pts_img = pts_img.reshape(-1, 8, 2)
    minv = pts_img.min(axis=1)
    maxv = pts_img.max(axis=1)
    boxes2d = np.concatenate([minv, maxv], axis=1)
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], 0, image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], 0, image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], 0, image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], 0, image_shape[0] - 1)
    return boxes2d


def camera_boxes_to_corners_3d(boxes3d):
    """(N, 7) camera [x,y,z,l,h,w,ry] -> (N, 8, 3) corners in rect camera frame."""
    l, h, w = boxes3d[:, 3:4], boxes3d[:, 4:5], boxes3d[:, 5:6]
    x_c = np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float32) / 2
    y_c = np.array([0, 0, 0, 0, -1, -1, -1, -1], dtype=np.float32)
    z_c = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float32) / 2
    corners = np.stack([l * x_c, h * y_c, w * z_c], axis=-1)  # (N,8,3)
    ry = boxes3d[:, 6]
    cosa, sina = np.cos(ry), np.sin(ry)
    zeros, ones = np.zeros_like(cosa), np.ones_like(cosa)
    # rotation about camera y axis
    rot = np.stack([cosa, zeros, -sina,
                    zeros, ones, zeros,
                    sina, zeros, cosa], axis=-1).reshape(-1, 3, 3)
    corners = corners @ rot
    return corners + boxes3d[:, None, 0:3]


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned 2D IoU between (N,4) and (M,4) [x1,y1,x2,y2] boxes."""
    xp = jnp if isinstance(boxes_a, jnp.ndarray) else np
    x_min = xp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    y_min = xp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    x_max = xp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y_max = xp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    inter = xp.clip(x_max - x_min, 0, None) * xp.clip(y_max - y_min, 0, None)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / xp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6, None)


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """BEV IoU using the axis-aligned box of the nearest 90° orientation
    (reference ``box_utils.boxes3d_nearest_bev_iou`` — used by the axis-aligned
    anchor target assigner)."""
    xp = jnp if isinstance(boxes_a, jnp.ndarray) else np

    def to_aabb(boxes):
        rot = common_utils.limit_period(boxes[:, 6], 0.5, np.pi)
        swap = xp.abs(rot) > np.pi / 4
        dx = xp.where(swap, boxes[:, 4], boxes[:, 3])
        dy = xp.where(swap, boxes[:, 3], boxes[:, 4])
        return xp.stack([boxes[:, 0] - dx / 2, boxes[:, 1] - dy / 2,
                         boxes[:, 0] + dx / 2, boxes[:, 1] + dy / 2], axis=1)

    return boxes_iou_normal(to_aabb(boxes_a), to_aabb(boxes_b))
