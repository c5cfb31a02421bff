"""ONCE official evaluation protocol — numpy re-implementation.

Parity target: ``/root/reference/pcdet/datasets/once/once_eval/evaluation.py``
(get_evaluation_results + eval_utils.py filters + iou_utils criterion=2
intersection kernel).  Protocol:

  * superclass merge: Car/Bus/Truck -> Vehicle (IoU 0.7), Pedestrian (0.3),
    Cyclist (0.5);
  * difficulties: overall + distance buckets 0-30m / 30-50m / 50m-inf
    (center L2 norm), out-of-bucket boxes are IGNORED (flag 1), not counted;
  * rotated 3D IoU with heading gate: IoU forced to 0 when the heading
    difference (wrapped to [0, pi]) exceeds pi/2;
  * 50-point interpolated AP: score thresholds chosen so recall advances in
    1/50 steps over matched-TP scores (same rule as KITTI's 40-point eval),
    precision/recall right-max envelope, AP = mean of precision[1:] * 100.

The greedy matcher is the reference's exactly (gt-major, best-score match in
``accumulate_scores``; best-IoU match in ``compute_statistics``), with the
inner candidate scan vectorized — only the sequential ``assigned`` dependency
stays a Python loop.
"""

import numpy as np

IOU_THRESHOLD = {"Car": 0.7, "Bus": 0.7, "Truck": 0.7,
                 "Pedestrian": 0.3, "Cyclist": 0.5}
SUPERCLASS_IOU_THRESHOLD = {"Vehicle": 0.7, "Pedestrian": 0.3, "Cyclist": 0.5}
NUM_PR_POINTS = 50


def _bev_intersection(boxes_a, boxes_b):
    """Rotated BEV intersection areas (N, M) — reference iou_utils
    rotate_iou_gpu_eval(criterion=2) returns the raw intersection area."""
    import jax.numpy as jnp
    from ...ops.iou3d_nms.iou3d_nms_utils import boxes_bev_overlap
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float64)
    return np.asarray(boxes_bev_overlap(
        jnp.asarray(boxes_a, jnp.float32), jnp.asarray(boxes_b, jnp.float32)),
        np.float64)


def iou3d_with_heading(gt_boxes, pred_boxes, with_heading=True):
    """(N, M) rotated 3D IoU, zeroed where |wrapped heading diff| > pi/2.

    Boxes: (x, y, z, dx, dy, dz, heading), z = center.
    """
    n, m = len(gt_boxes), len(pred_boxes)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float64)
    inter_2d = _bev_intersection(gt_boxes, pred_boxes)
    gt_hi = gt_boxes[:, 2] + gt_boxes[:, 5] * 0.5
    gt_lo = gt_boxes[:, 2] - gt_boxes[:, 5] * 0.5
    pd_hi = pred_boxes[:, 2] + pred_boxes[:, 5] * 0.5
    pd_lo = pred_boxes[:, 2] - pred_boxes[:, 5] * 0.5
    inter_h = np.minimum(gt_hi[:, None], pd_hi[None, :]) \
        - np.maximum(gt_lo[:, None], pd_lo[None, :])
    inter_h = np.clip(inter_h, 0, None)
    inter_3d = inter_2d * inter_h
    vol_gt = np.prod(gt_boxes[:, 3:6], axis=1)
    vol_pd = np.prod(pred_boxes[:, 3:6], axis=1)
    union = vol_gt[:, None] + vol_pd[None, :] - inter_3d
    iou = inter_3d / np.clip(union, 1e-9, None)
    if with_heading:
        diff = np.abs(gt_boxes[:, 6:7] - pred_boxes[None, :, 6])
        diff = np.where(diff >= np.pi, 2 * np.pi - diff, diff)
        iou = np.where(diff > np.pi / 2, 0.0, iou)
    return iou


def _distance_ignore(boxes, level, num_levels):
    """Ignore mask for the distance buckets (reference eval_utils.py):
    level 0 (or the 'overall' level in Overall&Distance mode) keeps all."""
    if num_levels == 4 and level == 0:
        return np.zeros(len(boxes), bool)
    bucket = level - 1 if num_levels == 4 else level
    dist = np.linalg.norm(boxes[:, 0:3], axis=1)
    if bucket == 0:
        keep = dist < 30
    elif bucket == 1:
        keep = (dist >= 30) & (dist < 50)
    else:
        keep = dist >= 50
    return ~keep


def _class_flags(names, boxes, class_name, level, num_levels, use_superclass):
    """flag per box: 0 accepted, 1 ignored (difficulty), -1 other class."""
    flags = np.zeros(len(names), np.int64)
    if use_superclass and class_name == "Vehicle":
        reject = (names == "Pedestrian") | (names == "Cyclist")
    else:
        reject = names != class_name
    flags[reject] = -1
    ignore = _distance_ignore(boxes, level, num_levels)
    flags[ignore & ~reject] = 1
    return flags


def _accumulate_scores(iou, scores, gt_flag, pred_flag, iou_threshold):
    """Scores of matched TPs (for threshold selection): gt-major greedy,
    each gt takes the unassigned same-class pred with the highest SCORE
    among those with IoU > threshold."""
    assigned = np.zeros(len(scores), bool)
    out = []
    cand_ok = pred_flag != -1
    for i in range(iou.shape[0]):
        if gt_flag[i] == -1:
            continue
        ok = cand_ok & ~assigned & (iou[i] > iou_threshold)
        if not ok.any():
            continue
        j = int(np.argmax(np.where(ok, scores, -np.inf)))
        assigned[j] = True
        if gt_flag[i] == 0 and pred_flag[j] == 0:
            out.append(scores[j])
    return np.asarray(out)


def _compute_statistics(iou, scores, gt_flag, pred_flag, score_threshold,
                        iou_threshold):
    """(tp, fp, fn) at one score threshold — reference compute_statistics:
    gt-major greedy by best IoU over non-ignored preds, ignored preds only
    claim a gt when no accepted pred matches."""
    assigned = np.zeros(len(scores), bool)
    under = scores < score_threshold
    tp = fp = fn = 0
    for i in range(iou.shape[0]):
        if gt_flag[i] == -1:
            continue
        row = iou[i]
        ok = ~assigned & ~under & (row > iou_threshold)
        ok0 = ok & (pred_flag == 0)
        ok1 = ok & (pred_flag == 1)
        if ok0.any():
            j = int(np.argmax(np.where(ok0, row, -np.inf)))
            detected, ignored_det = True, False
        elif ok1.any():
            j = int(np.argmax(ok1))        # first ignored candidate
            detected, ignored_det = True, True
        else:
            detected, j, ignored_det = False, -1, False
        if not detected:
            if gt_flag[i] == 0:
                fn += 1
        elif gt_flag[i] == 1 or ignored_det:
            assigned[j] = True
        else:
            tp += 1
            assigned[j] = True
    fp = int((~assigned & (pred_flag == 0) & ~under).sum())
    return tp, fp, fn


def _get_thresholds(scores, num_gt, num_pr_points=NUM_PR_POINTS):
    """Reference get_thresholds: walk matched scores descending, emit a
    threshold each time recall advances by 1/num_pr_points."""
    eps = 1e-6
    scores = np.sort(scores)[::-1]
    recall_level = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if (r_recall + l_recall < 2 * recall_level) and i < len(scores) - 1:
            continue
        thresholds.append(score)
        recall_level += 1 / num_pr_points
        while r_recall + l_recall + eps > 2 * recall_level:
            thresholds.append(score)
            recall_level += 1 / num_pr_points
    return thresholds


def get_evaluation_results(gt_annos, pred_annos, classes, use_superclass=True,
                           iou_thresholds=None, num_pr_points=NUM_PR_POINTS,
                           difficulty_mode="Overall&Distance",
                           ap_with_heading=True):
    """ONCE AP table.  Annos: dicts with 'name' (N,) str and 'boxes_3d'
    (N, 7); preds additionally 'score' (N,).  Returns (str, dict)."""
    if iou_thresholds is None:
        iou_thresholds = (SUPERCLASS_IOU_THRESHOLD if use_superclass
                          else IOU_THRESHOLD)
    assert len(gt_annos) == len(pred_annos)
    if use_superclass:
        classes = [c for c in classes if c not in ("Car", "Bus", "Truck")]
        classes.insert(0, "Vehicle")

    if difficulty_mode == "Overall&Distance":
        difficulty_types = ["overall", "0-30m", "30-50m", "50m-inf"]
    elif difficulty_mode == "Overall":
        difficulty_types = ["overall"]
    else:
        difficulty_types = ["0-30m", "30-50m", "50m-inf"]
    num_difficulties = len(difficulty_types)

    def _names(anno):
        names = np.asarray(anno["name"], dtype=object)
        if use_superclass:
            names = np.where(np.isin(names, ("Car", "Bus", "Truck")),
                             "Vehicle", names)
        return names

    ious = [iou3d_with_heading(np.asarray(g["boxes_3d"], np.float64),
                               np.asarray(p["boxes_3d"], np.float64),
                               with_heading=ap_with_heading)
            for g, p in zip(gt_annos, pred_annos)]
    gt_names = [_names(a) for a in gt_annos]
    pred_names = [_names(a) for a in pred_annos]

    AP = np.zeros((len(classes), num_difficulties))
    for ci, cls in enumerate(classes):
        iou_th = iou_thresholds[cls]
        for di in range(num_difficulties):
            gt_flags, pred_flags, accum, num_valid_gt = [], [], [], 0
            for si in range(len(gt_annos)):
                gflag = _class_flags(
                    gt_names[si], np.asarray(gt_annos[si]["boxes_3d"]),
                    cls, di, num_difficulties, use_superclass)
                pflag = _class_flags(
                    pred_names[si], np.asarray(pred_annos[si]["boxes_3d"]),
                    cls, di, num_difficulties, use_superclass)
                gt_flags.append(gflag)
                pred_flags.append(pflag)
                num_valid_gt += int((gflag == 0).sum())
                accum.append(_accumulate_scores(
                    ious[si], np.asarray(pred_annos[si]["score"], np.float64),
                    gflag, pflag, iou_th))
            if num_valid_gt == 0:
                continue
            thresholds = _get_thresholds(
                np.concatenate(accum) if accum else np.zeros(0),
                num_valid_gt, num_pr_points)
            cm = np.zeros((len(thresholds), 3))
            for si in range(len(gt_annos)):
                scores = np.asarray(pred_annos[si]["score"], np.float64)
                for ti, th in enumerate(thresholds):
                    cm[ti] += _compute_statistics(
                        ious[si], scores, gt_flags[si], pred_flags[si],
                        th, iou_th)
            precision = np.zeros(num_pr_points + 1)
            for ti in range(len(thresholds)):
                precision[ti] = cm[ti, 0] / max(cm[ti, 0] + cm[ti, 1], 1e-9)
            # right-max envelope (reference takes max over the full padded
            # tail, zeros included)
            precision = np.maximum.accumulate(precision[::-1])[::-1]
            AP[ci, di] = precision[1:].sum() / num_pr_points * 100

    ret_dict = {}
    ret_str = "\n|AP@%-9s|" % str(num_pr_points)
    for dt in difficulty_types:
        ret_str += "%-12s|" % dt
    ret_str += "\n"
    for ci, cls in enumerate(classes):
        ret_str += "|%-12s|" % cls
        for di, dt in enumerate(difficulty_types):
            ret_dict[f"AP_{cls}/{dt}"] = AP[ci, di]
            ret_str += "%-12.2f|" % AP[ci, di]
        ret_str += "\n"
    mAP = AP.mean(axis=0)
    ret_str += "|%-12s|" % "mAP"
    for di, dt in enumerate(difficulty_types):
        ret_dict[f"AP_mean/{dt}"] = mAP[di]
        ret_str += "%-12.2f|" % mAP[di]
    ret_str += "\n"
    return ret_str, ret_dict
