"""Numpy geometric augmentation primitives.

Parity with reference ``datasets/augmentor/augmentor_utils.py`` (658 LoC of
numpy/numba transforms): global flips about x/y, global rotation about z,
global scaling, global translation — each applied consistently to points and
(7+)-dim gt boxes (center, size, heading, optional velocity columns).
"""

import numpy as np

from ...utils import common_utils


def random_flip_along_x(gt_boxes, points, enable_prob=0.5, force=None):
    """Flip y -> -y. gt heading r -> -r; velocity vy -> -vy."""
    enable = np.random.rand() < enable_prob if force is None else force
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points, enable


def random_flip_along_y(gt_boxes, points, enable_prob=0.5, force=None):
    """Flip x -> -x. heading r -> pi - r; velocity vx -> -vx."""
    enable = np.random.rand() < enable_prob if force is None else force
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points, enable


def global_rotation(gt_boxes, points, rot_range, angle=None):
    if angle is None:
        angle = np.random.uniform(rot_range[0], rot_range[1])
    points = common_utils.rotate_points_along_z(
        points[None].astype(np.float32), np.array([angle], np.float32))[0]
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = common_utils.rotate_points_along_z(
        gt_boxes[None, :, 0:3].astype(np.float32),
        np.array([angle], np.float32))[0]
    gt_boxes[:, 6] += angle
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate([gt_boxes[:, 7:9],
                              np.zeros((len(gt_boxes), 1), np.float32)], axis=1)
        vel = common_utils.rotate_points_along_z(
            vel[None], np.array([angle], np.float32))[0]
        gt_boxes[:, 7:9] = vel[:, 0:2]
    return gt_boxes, points, angle


def global_scaling(gt_boxes, points, scale_range, scale=None):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points, 1.0
    if scale is None:
        scale = np.random.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 7:9] *= scale
    return gt_boxes, points, scale


def global_translation(gt_boxes, points, noise_std):
    if isinstance(noise_std, (int, float)):
        noise_std = [noise_std] * 3
    t = np.array([np.random.normal(0, s) for s in noise_std], np.float32)
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] += t
    gt_boxes[:, :3] += t
    return gt_boxes, points, t
