"""Waymo detection metrics — official-API wiring + numpy fallback.

Parity target: ``/root/reference/pcdet/datasets/waymo/waymo_eval.py``
(OpenPCDetWaymoDetectionMetricsEstimator).  Two paths:

  * ``waymo_evaluation_official``: builds the same OBJECT_TYPE-breakdown
    config (IoU 0.7 vehicle / 0.5 pedestrian / 0.5 sign / 0.5 cyclist) and
    runs the ``waymo_open_dataset`` metric ops when that package is
    importable;
  * ``waymo_evaluation``: self-contained numpy AP / APH with the same
    protocol: LEVEL_1 = difficulty-1 gts only (difficulty-2 matches are
    ignored, not fp), LEVEL_2 = all gts, 100 m distance cap, difficulty
    derived from num_points_in_gt (> 5 -> 1 else 2) when the label is 0
    (reference ``waymo_eval.py:44-46``).  APH weights each TP by heading
    accuracy 1 - |wrapped dtheta| / pi (the OD API's definition).  Matching
    is score-sorted greedy by max IoU (the OD API defaults to Hungarian;
    greedy differs only in pathological overlap ties).
"""

import numpy as np

CLASS_IOU = {"Vehicle": 0.7, "Pedestrian": 0.5, "Sign": 0.5, "Cyclist": 0.5}
DEFAULT_DISTANCE_THRESH = 100


def _iou_matrix(gt_boxes, dt_boxes):
    import jax.numpy as jnp
    from ...ops.iou3d_nms.iou3d_nms_utils import boxes_iou3d
    if len(gt_boxes) == 0 or len(dt_boxes) == 0:
        return np.zeros((len(gt_boxes), len(dt_boxes)))
    return np.asarray(boxes_iou3d(
        jnp.asarray(gt_boxes[:, :7], jnp.float32),
        jnp.asarray(dt_boxes[:, :7], jnp.float32)), np.float64)


def _collect(infos, class_names, is_gt, distance_thresh):
    """Flatten per-frame annos -> dict frame_id -> per-class arrays."""
    out = {}
    for info in infos:
        fid = info["frame_id"]
        names = np.asarray(info.get("name", []), dtype=object)
        boxes = np.asarray(info.get("gt_boxes_lidar" if is_gt
                                    else "boxes_lidar",
                                    np.zeros((0, 7))), np.float64)
        if boxes.shape[0] != len(names):
            boxes = boxes[:len(names)]
        if is_gt:
            difficulty = np.asarray(
                info.get("difficulty", np.zeros(len(names))), np.int64).copy()
            npts = np.asarray(info.get("num_points_in_gt",
                                       np.full(len(names), 100)), np.int64)
            zero = difficulty == 0
            difficulty[zero & (npts > 5)] = 1
            difficulty[zero & (npts <= 5)] = 2
            scores = np.ones(len(names))
        else:
            difficulty = np.zeros(len(names), np.int64)
            scores = np.asarray(info.get("score", np.ones(len(names))),
                                np.float64)
        if len(boxes):
            dist_ok = np.linalg.norm(boxes[:, 0:2], axis=1) < distance_thresh
        else:
            dist_ok = np.zeros(0, bool)
        keep = dist_ok
        out[fid] = {"names": names[keep], "boxes": boxes[keep],
                    "difficulty": difficulty[keep], "scores": scores[keep]}
    return out


def _wrap_angle_diff(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    return np.where(d > np.pi, 2 * np.pi - d, d)


def _eval_class_level(gt_frames, dt_frames, cls, level, iou_th):
    """Score-sorted greedy PR for one class at one difficulty level.

    level 1: only difficulty-1 gts count; matches to difficulty-2 gts are
    ignored (neither tp nor fp).  level 2: all gts count.
    Returns (ap, aph) * 100.
    """
    records = []          # (score, tp, fp, heading_acc)
    num_valid_gt = 0
    for fid, gt in gt_frames.items():
        dt = dt_frames.get(fid)
        gmask = gt["names"] == cls
        gboxes = gt["boxes"][gmask]
        gdiff = gt["difficulty"][gmask]
        counted = gdiff <= level
        num_valid_gt += int(counted.sum())
        if dt is None:
            continue
        dmask = dt["names"] == cls
        dboxes = dt["boxes"][dmask]
        dscores = dt["scores"][dmask]
        if len(dboxes) == 0:
            continue
        order = np.argsort(-dscores)
        dboxes, dscores = dboxes[order], dscores[order]
        iou = _iou_matrix(gboxes, dboxes)
        claimed = np.zeros(len(gboxes), bool)
        for j in range(len(dboxes)):
            col = iou[:, j] if len(gboxes) else np.zeros(0)
            col = np.where(claimed, -1.0, col)
            i = int(np.argmax(col)) if len(col) else -1
            if i >= 0 and col[i] > iou_th:
                claimed[i] = True
                if counted[i]:
                    h = 1.0 - _wrap_angle_diff(gboxes[i, 6],
                                               dboxes[j, 6]) / np.pi
                    records.append((dscores[j], 1, 0, max(0.0, float(h))))
                # uncounted (harder-level) gt: ignored detection
            else:
                records.append((dscores[j], 0, 1, 0.0))
    if num_valid_gt == 0 or not records:
        return 0.0, 0.0
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([r[2] for r in records])
    hsum = np.cumsum([r[3] for r in records])
    recall = tp / num_valid_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    precision_h = hsum / np.maximum(tp + fp, 1e-9)

    def _integrate(rec, prec):
        rec = np.concatenate(([0.0], rec, [1.0]))
        prec = np.concatenate(([0.0], prec, [0.0]))
        prec = np.maximum.accumulate(prec[::-1])[::-1]
        i = np.where(rec[1:] != rec[:-1])[0]
        return float(np.sum((rec[i + 1] - rec[i]) * prec[i + 1]))

    # APH: same (unweighted) recall axis, precision weighted by heading
    # accuracy — each TP contributes h instead of 1 (Waymo paper defn.)
    return (_integrate(recall, precision) * 100,
            _integrate(recall, precision_h) * 100)


def waymo_evaluation(prediction_infos, gt_infos, class_names,
                     distance_thresh=DEFAULT_DISTANCE_THRESH):
    """Numpy AP/APH table for LEVEL_1 and LEVEL_2 (reference
    waymo_evaluation:183).  Returns (str, dict)."""
    gt_frames = _collect(gt_infos, class_names, True, distance_thresh)
    dt_frames = _collect(prediction_infos, class_names, False,
                         distance_thresh)
    ap_dict = {}
    lines = []
    for cls in class_names:
        iou_th = CLASS_IOU.get(cls, 0.5)
        for level in (1, 2):
            ap, aph = _eval_class_level(gt_frames, dt_frames, cls, level,
                                        iou_th)
            kap = f"OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}/AP"
            kaph = f"OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}/APH"
            ap_dict[kap] = ap
            ap_dict[kaph] = aph
            lines.append(f"{kap}: {ap:.4f}")
            lines.append(f"{kaph}: {aph:.4f}")
    return "\n".join(lines), ap_dict


def waymo_evaluation_official(prediction_infos, gt_infos, class_names,
                              distance_thresh=DEFAULT_DISTANCE_THRESH):
    """Run the waymo_open_dataset metric ops (requires the OD package +
    TensorFlow).  Mirrors the reference estimator's config
    (``waymo_eval.py:91-113``)."""
    import tensorflow as tf
    from waymo_open_dataset import label_pb2
    from waymo_open_dataset.metrics.python import config_util_py as config_util
    from waymo_open_dataset.protos import metrics_pb2
    from google.protobuf import text_format

    config = metrics_pb2.Config()
    config_text = """
        breakdown_generator_ids: OBJECT_TYPE
        difficulties { levels: 1 levels: 2 }
        matcher_type: TYPE_HUNGARIAN
        box_type: TYPE_3D
        iou_thresholds: 0.0
        iou_thresholds: 0.7
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        iou_thresholds: 0.5
    """
    for x in range(100):
        config_text += "\n score_cutoffs: %f" % (x * 0.01)
    text_format.Merge(config_text, config)

    type_by_name = {"Vehicle": label_pb2.Label.TYPE_VEHICLE,
                    "Pedestrian": label_pb2.Label.TYPE_PEDESTRIAN,
                    "Sign": label_pb2.Label.TYPE_SIGN,
                    "Cyclist": label_pb2.Label.TYPE_CYCLIST}

    def flatten(frames, is_gt):
        fids, boxes, types, scores, diffs = [], [], [], [], []
        for k, (fid, fr) in enumerate(sorted(frames.items())):
            n = len(fr["names"])
            fids.append(np.full(n, k, np.int64))
            boxes.append(fr["boxes"][:, :7])
            types.append(np.asarray(
                [type_by_name.get(str(nm), 0) for nm in fr["names"]],
                np.uint8))
            scores.append(fr["scores"])
            diffs.append(fr["difficulty"].astype(np.uint8))
        cat = lambda xs, d: (np.concatenate(xs) if xs else
                             np.zeros((0,) if d == 1 else (0, 7)))
        return (cat(fids, 1), cat(boxes, 2), cat(types, 1), cat(scores, 1),
                cat(diffs, 1))

    gt_frames = _collect(gt_infos, class_names, True, distance_thresh)
    dt_frames = _collect(prediction_infos, class_names, False,
                         distance_thresh)
    g_fid, g_box, g_type, g_score, g_diff = flatten(gt_frames, True)
    d_fid, d_box, d_type, d_score, _ = flatten(dt_frames, False)

    from waymo_open_dataset.metrics.ops import py_metrics_ops
    metrics = py_metrics_ops.detection_metrics(
        prediction_bbox=tf.constant(d_box, tf.float32),
        prediction_type=tf.constant(d_type, tf.uint8),
        prediction_score=tf.constant(d_score, tf.float32),
        prediction_frame_id=tf.constant(d_fid, tf.int64),
        prediction_overlap_nlz=tf.zeros_like(d_fid, tf.bool),
        ground_truth_bbox=tf.constant(g_box, tf.float32),
        ground_truth_type=tf.constant(g_type, tf.uint8),
        ground_truth_frame_id=tf.constant(g_fid, tf.int64),
        ground_truth_difficulty=tf.constant(g_diff, tf.uint8),
        config=config.SerializeToString())
    names = config_util.get_breakdown_names_from_config(config)
    ap_dict = {}
    for i, name in enumerate(names):
        ap_dict[name + "/AP"] = float(np.asarray(metrics.average_precision)[i])
        ap_dict[name + "/APH"] = float(
            np.asarray(metrics.average_precision_ha_weighted)[i])
    return "\n".join(f"{k}: {v:.4f}" for k, v in ap_dict.items()), ap_dict
