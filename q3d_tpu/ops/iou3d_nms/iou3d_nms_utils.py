"""Rotated BEV overlap, 3D IoU and rotated NMS — pure XLA, jittable, static-K.

TPU-native replacement for the reference CUDA extension ``iou3d_nms_cuda``
(``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu``: polygon-clipping rotated
overlap + 64-bit-bitmask greedy NMS) and its wrappers
(``pcdet/ops/iou3d_nms/iou3d_nms_utils.py``: ``boxes_iou_bev:31``,
``boxes_iou3d_gpu:48``, ``nms_gpu:120``, ``nms_normal_gpu:138``).

Design: instead of sequential polygon clipping per pair (branchy, scalar —
hostile to the VPU), the rotated intersection area is computed data-parallel
over all N×M pairs at once from a fixed 24-candidate-vertex set
(4+4 contained corners + 16 edge×edge intersections), angularly sorted and
integrated with a masked shoelace.  Greedy NMS is a ``lax.fori_loop`` over a
precomputed K×K IoU matrix with static K (scores are pre-top-K'd), so the
whole post-processing stage stays inside one XLA computation.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ...utils import box_utils

_EPS = 1e-8


def _cross2(o, a, b):
    """2D cross product (a-o) x (b-o); broadcasting over leading dims."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _points_in_convex_quad(pts, quad):
    """pts: (..., P, 2); quad: (..., 4, 2) counter-clockwise -> (..., P) bool."""
    inside = None
    for i in range(4):
        a = quad[..., i, :][..., None, :]
        b = quad[..., (i + 1) % 4, :][..., None, :]
        s = _cross2(a, b, pts)
        cond = s >= -1e-6
        inside = cond if inside is None else (inside & cond)
    return inside


def _segment_intersections(qa, qb):
    """All 16 edge-pair intersection points between two quads.

    qa, qb: (..., 4, 2). Returns pts (..., 16, 2), valid (..., 16).
    """
    a1 = qa[..., :, None, :]                       # (...,4,1,2)
    a2 = jnp.roll(qa, -1, axis=-2)[..., :, None, :]
    b1 = qb[..., None, :, :]                       # (...,1,4,2)
    b2 = jnp.roll(qb, -1, axis=-2)[..., None, :, :]
    da = a2 - a1
    db = b2 - b1
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]   # (...,4,4)
    diff = b1 - a1
    t_num = diff[..., 0] * db[..., 1] - diff[..., 1] * db[..., 0]
    u_num = diff[..., 0] * da[..., 1] - diff[..., 1] * da[..., 0]
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    valid = (jnp.abs(denom) >= _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a1 + t[..., None] * da
    shp = pts.shape[:-3]
    return pts.reshape(*shp, 16, 2), valid.reshape(*shp, 16)


def _convex_area_from_candidates(pts, valid):
    """Area of the convex hull of masked candidate points.

    pts: (..., C, 2); valid: (..., C).  All valid points are assumed to lie on
    the hull (true for intersections of two convex quads).
    """
    n_valid = valid.sum(axis=-1)                                  # (...,)
    w = valid[..., None].astype(pts.dtype)
    center = (pts * w).sum(axis=-2) / jnp.maximum(n_valid[..., None], 1)
    rel = pts - center[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, 1e4)                              # invalid sort last
    # variadic key-value sort (a fusable fixed-size sorting network on TPU)
    # instead of argsort + take_along_axis: the gathers in the latter force
    # (..., C, 2) temporaries out to HBM, dominating NMS time at K=500
    _, rx, ry = jax.lax.sort((ang, rel[..., 0], rel[..., 1]),
                             dimension=-1, num_keys=1)
    rel_sorted = jnp.stack([rx, ry], axis=-1)
    C = pts.shape[-2]
    idx = jnp.arange(C)
    # ring over the first n_valid sorted points: next(i) = i+1, last -> 0
    rel_next = jnp.roll(rel_sorted, -1, axis=-2)
    is_last = idx[None] == (n_valid[..., None] - 1)
    rel_next = jnp.where(is_last[..., None], rel_sorted[..., :1, :], rel_next)
    contrib = (rel_sorted[..., 0] * rel_next[..., 1]
               - rel_sorted[..., 1] * rel_next[..., 0])
    contrib = jnp.where(idx[None] < n_valid[..., None], contrib, 0.0)
    area = 0.5 * jnp.abs(contrib.sum(axis=-1))
    return jnp.where(n_valid >= 3, area, 0.0)


def _rotated_overlap_quads(qa, qb):
    """Intersection area of two convex quads; qa:(...,4,2), qb:(...,4,2)."""
    shape = jnp.broadcast_shapes(qa.shape, qb.shape)
    qa = jnp.broadcast_to(qa, shape)
    qb = jnp.broadcast_to(qb, shape)
    a_in_b = _points_in_convex_quad(qa, qb)            # (...,4)
    b_in_a = _points_in_convex_quad(qb, qa)            # (...,4)
    inter_pts, inter_valid = _segment_intersections(qa, qb)
    pts = jnp.concatenate([qa, qb, inter_pts], axis=-2)          # (...,24,2)
    valid = jnp.concatenate([a_in_b, b_in_a, inter_valid], axis=-1)
    return _convex_area_from_candidates(pts, valid)


def boxes_bev_overlap(boxes_a, boxes_b):
    """Rotated BEV intersection AREA. boxes: (N, 7), (M, 7) -> (N, M)."""
    qa = box_utils.boxes_to_corners_bev(boxes_a)       # (N,4,2)
    qb = box_utils.boxes_to_corners_bev(boxes_b)       # (M,4,2)
    return _rotated_overlap_quads(qa[:, None], qb[None, :])


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU. (N, 7), (M, 7) -> (N, M)."""
    overlap = boxes_bev_overlap(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, 1e-6, None)


def _height_overlap(boxes_a, boxes_b):
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    return jnp.clip(jnp.minimum(za2[:, None], zb2[None, :])
                    - jnp.maximum(za1[:, None], zb1[None, :]), 0, None)


def boxes_iou3d(boxes_a, boxes_b):
    """3D IoU. (N, 7), (M, 7) -> (N, M). Matches reference boxes_iou3d_gpu."""
    overlap_bev = boxes_bev_overlap(boxes_a, boxes_b)
    overlap_3d = overlap_bev * _height_overlap(boxes_a, boxes_b)
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, 1e-6, None)


def boxes_aligned_iou3d(boxes_a, boxes_b):
    """Pairwise-aligned 3D IoU: (N, 7), (N, 7) -> (N,)."""
    qa = box_utils.boxes_to_corners_bev(boxes_a)
    qb = box_utils.boxes_to_corners_bev(boxes_b)
    overlap_bev = _rotated_overlap_quads(qa, qb)
    za = jnp.minimum(boxes_a[:, 2] + boxes_a[:, 5] / 2, boxes_b[:, 2] + boxes_b[:, 5] / 2)
    zb = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 5] / 2, boxes_b[:, 2] - boxes_b[:, 5] / 2)
    overlap_3d = overlap_bev * jnp.clip(za - zb, 0, None)
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, 1e-6, None)


def _greedy_suppress_xla(iou, valid, thresh):
    """Sequential greedy NMS over a (K, K) IoU matrix; rows sorted by score.
    Pure-XLA fallback (K fori_loop steps)."""
    K = iou.shape[0]
    idx = jnp.arange(K)

    def body(i, keep):
        suppress = (iou[i] > thresh) & (idx > i) & keep[i]
        return keep & jnp.logical_not(suppress)

    return jax.lax.fori_loop(0, K, body, valid)


def _greedy_suppress(iou, valid, thresh):
    """Greedy NMS sweep — single Pallas kernel on TPU (see pallas_nms.py)."""
    from .pallas_nms import greedy_suppress
    return greedy_suppress(iou, valid, thresh)


@partial(jax.jit, static_argnames=("thresh", "pre_maxsize", "post_maxsize", "normal"))
def _nms_impl(boxes, scores, score_valid, thresh, pre_maxsize, post_maxsize, normal):
    K = min(pre_maxsize, boxes.shape[0])
    neg_inf = jnp.asarray(-1e9, scores.dtype)
    scores_m = jnp.where(score_valid, scores, neg_inf)
    top_scores, order = jax.lax.top_k(scores_m, K)
    top_boxes = boxes[order]
    top_valid = top_scores > neg_inf / 2
    if normal:
        # axis-aligned BEV IoU, ignoring rotation (reference nms_normal_gpu)
        aabb = jnp.stack([top_boxes[:, 0] - top_boxes[:, 3] / 2,
                          top_boxes[:, 1] - top_boxes[:, 4] / 2,
                          top_boxes[:, 0] + top_boxes[:, 3] / 2,
                          top_boxes[:, 1] + top_boxes[:, 4] / 2], axis=1)
        iou = box_utils.boxes_iou_normal(aabb, aabb)
    else:
        iou = boxes_iou_bev(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, top_valid, thresh)
    # select up to post_maxsize kept indices, score-ordered (rows already are)
    kept_scores = jnp.where(keep, top_scores, neg_inf)
    P = min(post_maxsize, K)
    sel_scores, sel_pos = jax.lax.top_k(kept_scores, P)
    sel_idx = order[sel_pos]
    sel_valid = sel_scores > neg_inf / 2
    return sel_idx, sel_valid


def nms_bev(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500, score_valid=None):
    """Rotated greedy NMS (reference ``nms_gpu``).

    Args:
        boxes: (N, 7) float; scores: (N,) float.
        score_valid: optional (N,) bool mask of real (non-padding) boxes.
    Returns:
        (idx, valid): (post_maxsize,) int32 indices into ``boxes`` ordered by
        descending score, and a bool mask of surviving entries.  Fixed-size —
        jit/vmap-friendly; hosts trim with ``idx[valid]``.
    """
    if score_valid is None:
        score_valid = jnp.ones(scores.shape, bool)
    return _nms_impl(boxes, scores, score_valid, float(thresh),
                     int(pre_maxsize), int(post_maxsize), False)


def nms_normal_bev(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500,
                   score_valid=None):
    """Axis-aligned greedy NMS (reference ``nms_normal_gpu``)."""
    if score_valid is None:
        score_valid = jnp.ones(scores.shape, bool)
    return _nms_impl(boxes, scores, score_valid, float(thresh),
                     int(pre_maxsize), int(post_maxsize), True)
