"""NMS dispatch (reference ``model_utils/model_nms_utils.py``), static-shape.

``class_agnostic_nms:6`` / ``multi_classes_nms:28`` with cfg-string dispatch to
the rotated or axis-aligned kernel.  Everything returns fixed-size
(indices, valid) pairs so detector post-processing stays inside one jit.
"""

import jax
import jax.numpy as jnp

from ...ops.iou3d_nms import nms_bev, nms_normal_bev

_NMS_FNS = {
    "nms_gpu": nms_bev,
    "nms_bev": nms_bev,
    "nms_normal_gpu": nms_normal_bev,
    "nms_normal_bev": nms_normal_bev,
}


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None,
                       box_valid=None, presorted=False):
    """box_scores: (N,); box_preds: (N, 7). Returns (idx, valid) fixed-size.

    presorted=True: caller guarantees descending-score order (e.g. the rows
    come straight out of a lax.top_k decode) — skips the NMS-internal
    reorder."""
    valid = jnp.ones(box_scores.shape, bool) if box_valid is None else box_valid
    if score_thresh is not None:
        valid = valid & (box_scores >= score_thresh)
    nms_fn = _NMS_FNS[nms_config.NMS_TYPE]
    kw = {"presorted": True} if presorted and nms_fn is nms_bev else {}
    return nms_fn(box_preds, box_scores, thresh=float(nms_config.NMS_THRESH),
                  pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
                  post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
                  score_valid=valid, **kw)


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None,
                      box_valid=None):
    """Per-class NMS (reference multi_classes_nms:28).

    cls_scores: (N, num_class); returns per-class fixed-size results stacked:
    (idx (C, post), valid (C, post), scores (C, post)).
    """
    num_class = cls_scores.shape[1]
    idxs, valids, scores = [], [], []
    for k in range(num_class):
        s = cls_scores[:, k]
        v = jnp.ones(s.shape, bool) if box_valid is None else box_valid
        if score_thresh is not None:
            v = v & (s >= score_thresh)
        nms_fn = _NMS_FNS[nms_config.NMS_TYPE]
        idx, val = nms_fn(box_preds, s, thresh=float(nms_config.NMS_THRESH),
                          pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
                          post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
                          score_valid=v)
        idxs.append(idx)
        valids.append(val)
        scores.append(s[idx])
    return jnp.stack(idxs), jnp.stack(valids), jnp.stack(scores)


def class_specific_nms(box_scores, box_preds, box_labels, nms_config,
                       score_thresh=None, box_valid=None):
    """Per-class NMS with per-class thresholds (reference
    class_specific_nms:69).  box_labels: (N,) 1-based predicted classes.
    Returns fixed-size (idx, valid) over the union, score-ordered."""
    num_class = len(nms_config.NMS_THRESH) if isinstance(
        nms_config.NMS_THRESH, (list, tuple)) else 0
    base_valid = jnp.ones(box_scores.shape, bool) if box_valid is None \
        else box_valid
    if score_thresh is not None:
        thr = score_thresh
        if isinstance(thr, (list, tuple)):
            thr_arr = jnp.asarray(list(thr))[box_labels - 1]
        else:
            thr_arr = thr
        base_valid = base_valid & (box_scores >= thr_arr)

    all_scores = []
    all_idx = []
    all_valid = []
    classes = range(1, (num_class or int(nms_config.get("NUM_CLASSES", 3))) + 1)
    for k in classes:
        thresh = nms_config.NMS_THRESH[k - 1] if num_class \
            else nms_config.NMS_THRESH
        v = base_valid & (box_labels == k)
        idx, val = nms_bev(box_preds, box_scores, thresh=float(thresh),
                           pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
                           post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
                           score_valid=v)
        all_idx.append(idx)
        all_valid.append(val)
        all_scores.append(jnp.where(val, box_scores[idx], -1.0))
    scores = jnp.concatenate(all_scores)
    idxs = jnp.concatenate(all_idx)
    post = int(nms_config.NMS_POST_MAXSIZE)
    top_s, pos = jax.lax.top_k(scores, post)
    return idxs[pos], top_s > 0
