"""Rotated BEV overlap, 3D IoU and rotated NMS — pure XLA, jittable, static-K.

TPU-native replacement for the reference CUDA extension ``iou3d_nms_cuda``
(``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu``: polygon-clipping rotated
overlap + 64-bit-bitmask greedy NMS) and its wrappers
(``pcdet/ops/iou3d_nms/iou3d_nms_utils.py``: ``boxes_iou_bev:31``,
``boxes_iou3d_gpu:48``, ``nms_gpu:120``, ``nms_normal_gpu:138``).

Design: instead of sequential polygon clipping per pair (branchy, scalar —
hostile to the VPU), the rotated intersection area is computed data-parallel
over all N×M pairs at once: each quad edge is interval-clipped to the other
quad's half-planes (Liang-Barsky) and contributes its shoelace term
directly — the boundary of a convex intersection is exactly {A-edge parts
inside B} ∪ {B-edge parts inside A}, and shoelace contributions need no
global vertex ordering.  No sort, no transcendentals (an earlier
24-candidate angular-sort formulation spent ~5x the time in lax.sort +
arctan2).  Greedy NMS is a ``lax.fori_loop`` over a precomputed K×K IoU
matrix with static K (scores are pre-top-K'd), so the whole post-processing
stage stays inside one XLA computation.
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


def _clipped_edges_contrib(poly, clip, origin, bias):
    """Shoelace contributions of ``poly``'s edges clipped to the inside of
    convex ``clip`` (Liang-Barsky interval clipping per edge).

    poly, clip: (..., 4, 2) CCW; origin: (..., 2) common shoelace origin.
    Returns (contrib (...,), net (..., 2)) = the summed shoelace
    contributions 0.5 * cross(q1_e - o, q2_e - o) of the retained
    sub-segments, and the net traversal vector sum(q2_e - q1_e) used by the
    caller's closed-boundary check.  ``bias`` shifts the inside test
    (d >= bias): a positive bias requires strict interiority, excluding
    boundary-collinear segments.
    """
    p1 = poly                                          # (...,4,2)
    p2 = jnp.roll(poly, -1, axis=-2)
    c1 = clip[..., None, :, :]                         # (...,1,4,2)
    c2 = jnp.roll(clip, -1, axis=-2)[..., None, :, :]
    # signed (scaled) distance of edge endpoints to each clip half-plane
    d1 = _cross2(c1, c2, p1[..., :, None, :]) - bias   # (...,4poly,4clip)
    d2 = _cross2(c1, c2, p2[..., :, None, :]) - bias
    denom = d1 - d2
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    tc = d1 / safe                                     # crossing parameter
    # entry (outside->inside) raises t0; exit lowers t1; both-outside empty
    t0 = jnp.where((d1 < 0) & (d2 >= 0), tc, 0.0).max(axis=-1)
    t1 = jnp.where((d1 >= 0) & (d2 < 0), tc, 1.0).min(axis=-1)
    keep = ~(((d1 < 0) & (d2 < 0)).any(axis=-1) | (t0 >= t1))
    keepf = keep.astype(poly.dtype)[..., None]
    e = p2 - p1
    o = origin[..., None, :]
    q1 = (p1 - o + t0[..., None] * e) * keepf
    q2 = (p1 - o + t1[..., None] * e) * keepf
    contrib = 0.5 * (q1[..., 0] * q2[..., 1] - q1[..., 1] * q2[..., 0])
    return contrib.sum(axis=-1), (q2 - q1).sum(axis=-2)


_BIAS = 1e-3   # collinear-boundary exclusion margin (scaled distance units)


def _rotated_overlap_quads(qa, qb):
    """Intersection area of two convex quads; qa:(...,4,2), qb:(...,4,2).

    Asymmetric biases count shared collinear boundary once (A-edges keep it,
    B-edges need strict interiority).  A degenerate contact (segment/point
    intersection) leaves the collected boundary unclosed; the net-traversal
    check zeroes those (a closed CCW boundary has zero net edge vector).
    """
    shape = jnp.broadcast_shapes(qa.shape, qb.shape)
    qa = jnp.broadcast_to(qa, shape)
    qb = jnp.broadcast_to(qb, shape)
    origin = qa.mean(axis=-2)
    a1, v1 = _clipped_edges_contrib(qa, qb, origin, 0.0)
    a2, v2 = _clipped_edges_contrib(qb, qa, origin, _BIAS)
    v = v1 + v2
    closed = (jnp.abs(v[..., 0]) + jnp.abs(v[..., 1])) < 1e-2
    return jnp.where(closed, jnp.maximum(a1 + a2, 0.0), 0.0)


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


def _greedy_suppress_wavefront(iou, valid, thresh):
    """EXACT greedy NMS without the K-step sequential loop.

    Greedy keep_i depends only on kept j < i, so boxes can be finalized in
    dependency *levels*: each iteration decides every box whose potential
    suppressors (higher-score overlapping boxes) are all decided.  The
    number of iterations equals the longest overlap chain — single digits
    on real detections — and each iteration is two vectorized (K, K)
    masked reductions, which is ~20x faster on TPU than K tiny sequential
    steps (a 500-step loop costs ~5 us/step inside a large XLA program,
    whether expressed as lax.fori_loop or a Pallas kernel loop).
    """
    K = iou.shape[0]
    upper = jnp.triu(jnp.ones((K, K), bool), k=1)       # [j, i] with j < i
    over = upper & (iou > thresh)                       # j<i overlapping i
    # invalid boxes are decided (not kept) from the start
    init = (~valid, jnp.zeros(K, bool))

    def cond(state):
        decided, _ = state
        return ~decided.all()

    def step(state):
        decided, keep = state
        # i is ready when every potential suppressor j<i is decided.
        # (~decided)[:, None] broadcasts along lanes — the equivalent
        # decided[None, :].T forced a (K, K) relayout on TPU.
        ready = ~decided & ~(over & (~decided)[:, None]).any(0)
        suppressed = (over & (keep & decided)[:, None]).any(0)
        keep = keep | (ready & valid & ~suppressed)
        return decided | ready, keep

    def body(state):
        # several wavefront levels per while iteration: the level count on
        # real detections is single digits, and each while-loop trip costs
        # far more than the two (K, K) masked reductions of a step, so
        # batching steps (extra steps are idempotent no-ops once converged)
        # cuts the trip count to 2-3
        for _ in range(4):
            state = step(state)
        return state

    _, keep = jax.lax.while_loop(cond, body, init)
    return keep


def _greedy_suppress(iou, valid, thresh):
    """Greedy NMS sweep (exact, wavefront-parallel)."""
    return _greedy_suppress_wavefront(iou, valid, thresh)


@partial(jax.jit, static_argnames=("thresh", "pre_maxsize", "post_maxsize",
                                   "normal", "presorted"))
def _nms_impl(boxes, scores, score_valid, thresh, pre_maxsize, post_maxsize,
              normal, presorted=False):
    K = min(pre_maxsize, boxes.shape[0])
    if presorted:
        # caller guarantees descending-score row order (e.g. CenterHead's
        # decode emits lax.top_k output): greedy order == row order, so the
        # reorder top_k is skipped; invalid rows stay in place (they are
        # pre-decided "not kept" in the sweep, which changes nothing)
        order = jnp.arange(K, dtype=jnp.int32)
        top_boxes = boxes[:K]
        top_valid = score_valid[:K]
    else:
        neg_inf = jnp.asarray(-1e9, scores.dtype)
        scores_m = jnp.where(score_valid, scores, neg_inf)
        top_scores, order = jax.lax.top_k(scores_m, K)
        top_boxes = boxes[order]
        top_valid = top_scores > neg_inf / 2
    # lane-align the candidate count BEFORE the (K, K) IoU: every pairwise
    # intermediate then tiles cleanly (measured ~4x on v5e at K=500 vs the
    # unaligned shapes XLA must pad per-op)
    Kp = -(-K // 128) * 128
    if Kp != K:
        top_boxes = jnp.pad(top_boxes, ((0, Kp - K), (0, 0)))
        top_valid = jnp.pad(top_valid, (0, Kp - K))
    if normal:
        # axis-aligned BEV IoU, ignoring rotation (reference nms_normal_gpu)
        aabb = jnp.stack([top_boxes[:, 0] - top_boxes[:, 3] / 2,
                          top_boxes[:, 1] - top_boxes[:, 4] / 2,
                          top_boxes[:, 0] + top_boxes[:, 3] / 2,
                          top_boxes[:, 1] + top_boxes[:, 4] / 2], axis=1)
        iou = box_utils.boxes_iou_normal(aabb, aabb)
    else:
        iou = boxes_iou_bev(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, top_valid, thresh)[:K]
    # select up to post_maxsize kept indices.  Rows are already score-
    # ordered, so a stable cumsum compaction replaces the final top_k sort
    P = min(post_maxsize, K)
    kpos = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (kpos < P), kpos, P)
    sel_pos = jnp.full(P + 1, K, jnp.int32).at[slot].set(
        jnp.arange(K, dtype=jnp.int32))[:P]
    sel_valid = sel_pos < K
    sel_idx = jnp.take(order, sel_pos, mode="fill", fill_value=0)
    return sel_idx, sel_valid


def nms_bev(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500,
            score_valid=None, presorted=False):
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
                     int(pre_maxsize), int(post_maxsize), False,
                     presorted=presorted)


def nms_normal_bev(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500,
                   score_valid=None):
    """Axis-aligned greedy NMS (reference ``nms_normal_gpu``)."""
    if score_valid is None:
        score_valid = jnp.ones(scores.shape, bool)
    return _nms_impl(boxes, scores, score_valid, float(thresh),
                     int(pre_maxsize), int(post_maxsize), True)
