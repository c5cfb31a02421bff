"""Unit tests: geometry, coders, rotated IoU and NMS vs brute-force oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from q3d_tpu.utils import common_utils, box_utils, box_coder_utils
from q3d_tpu.ops.iou3d_nms import (boxes_iou_bev, boxes_iou3d, nms_bev,
                                   boxes_aligned_iou3d)
from q3d_tpu.ops.roiaware_pool3d import points_in_boxes_cpu, points_in_boxes_jax


# ------------------------- oracles (dense rasterization) -------------------

def _rect_corners_np(box):
    return np.asarray(box_utils.boxes_to_corners_bev(box[None]))[0]


def _poly_area_raster(box_a, box_b, res=512):
    """Monte-Carlo-free raster oracle for rotated rectangle intersection."""
    lo = np.minimum(_rect_corners_np(box_a).min(0), _rect_corners_np(box_b).min(0)) - 0.1
    hi = np.maximum(_rect_corners_np(box_a).max(0), _rect_corners_np(box_b).max(0)) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)

    def inside(box):
        d = pts - box[0:2]
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return (inside(box_a) & inside(box_b)).sum() * cell


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-5, 5, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


# ------------------------------- tests -------------------------------------

def test_limit_period():
    v = np.array([0.1, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    out = common_utils.limit_period(v, 0.5, np.pi)
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)


def test_rotate_points_along_z():
    pts = np.array([[[1.0, 0.0, 0.0, 7.0]]], np.float32)
    out = common_utils.rotate_points_along_z(pts, np.array([np.pi / 2], np.float32))
    np.testing.assert_allclose(out[0, 0, :3], [0, 1, 0], atol=1e-6)
    assert out[0, 0, 3] == 7.0  # feature passthrough


def test_corners_identity_box():
    box = np.array([[0, 0, 0, 2, 4, 6, 0]], np.float32)
    corners = np.asarray(box_utils.boxes_to_corners_3d(box))
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(np.abs(corners[0]).max(0), [1, 2, 3], atol=1e-6)


def test_residual_coder_roundtrip():
    coder = box_coder_utils.ResidualCoder(code_size=7)
    boxes = jnp.asarray(_random_boxes(32, 1))
    anchors = jnp.asarray(_random_boxes(32, 2))
    dec = coder.decode(coder.encode(boxes, anchors), anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(boxes), atol=1e-4, rtol=1e-4)


def test_residual_coder_sincos_roundtrip():
    coder = box_coder_utils.ResidualCoder(code_size=7, encode_angle_by_sincos=True)
    boxes = jnp.asarray(_random_boxes(16, 3))
    anchors = jnp.asarray(_random_boxes(16, 4))
    dec = coder.decode(coder.encode(boxes, anchors), anchors)
    d = np.asarray(dec)
    b = np.asarray(boxes)
    np.testing.assert_allclose(d[:, :6], b[:, :6], atol=1e-4, rtol=1e-4)
    ang = common_utils.angle_difference(d[:, 6], b[:, 6])
    np.testing.assert_allclose(ang, 0, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rotated_iou_vs_raster_oracle(seed):
    boxes = _random_boxes(6, seed)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(6):
        for j in range(6):
            inter = _poly_area_raster(boxes[i], boxes[j])
            area_i = boxes[i, 3] * boxes[i, 4]
            area_j = boxes[j, 3] * boxes[j, 4]
            expect = inter / max(area_i + area_j - inter, 1e-6)
            assert abs(iou[i, j] - expect) < 0.02, (i, j, iou[i, j], expect)


def test_identical_box_iou_is_one():
    boxes = _random_boxes(8, 5)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)
    iou3 = np.asarray(boxes_iou3d(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(iou3), 1.0, atol=1e-3)
    aligned = np.asarray(boxes_aligned_iou3d(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(aligned, 1.0, atol=1e-3)


def test_disjoint_boxes_iou_zero():
    a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
    b = np.array([[10, 10, 0, 1, 1, 1, 1.0]], np.float32)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == 0.0


def test_nms_matches_numpy_greedy():
    boxes = _random_boxes(64, 7)
    scores = np.random.RandomState(7).rand(64).astype(np.float32)
    idx, valid = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), thresh=0.2,
                         pre_maxsize=64, post_maxsize=64)
    got = list(np.asarray(idx)[np.asarray(valid)])

    # numpy greedy oracle using our (validated) IoU
    iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    order = np.argsort(-scores)
    keep, removed = [], np.zeros(64, bool)
    for i in order:
        if removed[i]:
            continue
        keep.append(i)
        removed |= iou[i] > 0.2
    assert got == keep


def test_nms_respects_validity_mask():
    boxes = _random_boxes(16, 9)
    scores = np.linspace(1, 0.1, 16).astype(np.float32)
    mask = np.zeros(16, bool)
    mask[:4] = True
    idx, valid = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.99,
                         pre_maxsize=16, post_maxsize=16,
                         score_valid=jnp.asarray(mask))
    kept = np.asarray(idx)[np.asarray(valid)]
    assert set(kept).issubset(set(range(4)))


def test_points_in_boxes_cpu_and_jax_agree():
    boxes = _random_boxes(5, 11)
    pts = np.random.RandomState(3).uniform(-6, 6, (200, 3)).astype(np.float32)
    flags = points_in_boxes_cpu(pts, boxes)
    assert flags.shape == (5, 200)
    jidx = np.asarray(points_in_boxes_jax(jnp.asarray(pts), jnp.asarray(boxes)))
    for n in range(200):
        inside = np.where(flags[:, n])[0]
        if len(inside) == 0:
            assert jidx[n] == -1
        else:
            assert jidx[n] in inside


def test_boxes3d_nearest_bev_iou():
    a = np.array([[0, 0, 0, 4, 2, 1, 0.0]], np.float32)
    b = np.array([[0, 0, 0, 2, 4, 1, np.pi / 2]], np.float32)  # same footprint
    iou = np.asarray(box_utils.boxes3d_nearest_bev_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)


def test_wavefront_nms_equals_sequential():
    """The wavefront-parallel greedy suppression must equal the sequential
    K-step formulation on random IoU matrices (exactness of the level
    decomposition)."""
    import numpy as np
    import jax.numpy as jnp
    from q3d_tpu.ops.iou3d_nms import iou3d_nms_utils as iu

    rng = np.random.RandomState(0)
    for trial in range(6):
        K = [8, 33, 64, 128, 200, 64][trial]
        m = rng.rand(K, K).astype(np.float32)
        m = (m + m.T) / 2
        valid = rng.rand(K) > (0.2 if trial % 2 else 0.0)
        # high threshold -> sparse chains; low -> deep chains
        for t in (0.9, 0.5, 0.2):
            seq = np.asarray(iu._greedy_suppress_xla(
                jnp.asarray(m), jnp.asarray(valid), t))
            wav = np.asarray(iu._greedy_suppress_wavefront(
                jnp.asarray(m), jnp.asarray(valid), t))
            np.testing.assert_array_equal(seq, wav)
