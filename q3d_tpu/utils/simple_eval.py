"""Lightweight detection mAP for synthetic/integration evaluation.

Not a reference component — the reference delegates to official KITTI /
nuScenes evaluators (vendored separately in ``q3d_tpu/datasets/kitti``).
This provides a fast greedy-matching AP (11-point interpolated, BEV IoU) used
by SyntheticDataset and CI tests.
"""

import numpy as np


def _bucket(n):
    """Round up to a power-of-two size so the jitted IoU kernel compiles a
    handful of times instead of once per unique per-frame box count (a
    recompilation storm that made evaluation hang for minutes)."""
    b = 8
    while b < n:
        b *= 2
    return b


def _bev_iou_np(boxes_a, boxes_b):
    import jax.numpy as jnp
    from ..ops.iou3d_nms import boxes_iou_bev
    na, nb = len(boxes_a), len(boxes_b)
    if na == 0 or nb == 0:
        return np.zeros((na, nb), np.float32)
    pa = np.zeros((_bucket(na), boxes_a.shape[1]), np.float32)
    pb = np.zeros((_bucket(nb), boxes_b.shape[1]), np.float32)
    pa[:na] = boxes_a
    pb[:nb] = boxes_b
    return np.asarray(boxes_iou_bev(jnp.asarray(pa),
                                    jnp.asarray(pb)))[:na, :nb]


def simple_map(det_annos, gt_annos, class_names, iou_thresh=0.5):
    """det_annos: [{'boxes_lidar','score','name'}]; gt_annos: [{'boxes','names'}]."""
    ap_dict = {}
    for cls in class_names:
        scores, tp_flags, n_gt = [], [], 0
        for det, gt in zip(det_annos, gt_annos):
            det_mask = det["name"] == cls
            gt_mask = gt["names"] == cls
            det_boxes = det["boxes_lidar"][det_mask]
            det_scores = det["score"][det_mask]
            gt_boxes = gt["boxes"][gt_mask]
            n_gt += len(gt_boxes)
            order = np.argsort(-det_scores)
            det_boxes, det_scores = det_boxes[order], det_scores[order]
            iou = _bev_iou_np(det_boxes, gt_boxes)
            taken = np.zeros(len(gt_boxes), bool)
            for i in range(len(det_boxes)):
                scores.append(det_scores[i])
                j = int(np.argmax(iou[i])) if len(gt_boxes) else -1
                if j >= 0 and iou[i, j] >= iou_thresh and not taken[j]:
                    taken[j] = True
                    tp_flags.append(1.0)
                else:
                    tp_flags.append(0.0)
        if n_gt == 0:
            ap_dict[f"AP_{cls}"] = 0.0
            continue
        if not scores:
            ap_dict[f"AP_{cls}"] = 0.0
            continue
        order = np.argsort(-np.asarray(scores))
        tp = np.asarray(tp_flags)[order]
        cum_tp = np.cumsum(tp)
        recall = cum_tp / n_gt
        precision = cum_tp / (np.arange(len(tp)) + 1)
        ap = 0.0
        for r in np.linspace(0, 1, 11):
            p = precision[recall >= r].max() if (recall >= r).any() else 0.0
            ap += p / 11
        ap_dict[f"AP_{cls}"] = float(ap)
    ap_dict["mAP"] = float(np.mean([v for k, v in ap_dict.items()
                                    if k.startswith("AP_")]))
    return ap_dict
