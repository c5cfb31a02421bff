"""Lyft mAP evaluation — numpy re-implementation of the reference's vendored
toolkit evaluator (``/root/reference/pcdet/datasets/lyft/lyft_mAP_eval/
lyft_eval.py`` + ``lyft_utils.py:319 format_lyft_results``).

Protocol (COCO-style 3D mAP):
  * per class, predictions of ALL frames sorted by score descending;
  * greedy match: each prediction takes the single highest-IoU gt of its
    frame; a gt can be claimed once per IoU threshold (tp), duplicates are
    fp; IoU must exceed the threshold;
  * AP = area under the precision-recall curve with the right-max envelope
    and recall-change summation (VOC "correct" AP);
  * mAP = mean over the IoU threshold list (default 0.5:0.95:0.05), then
    over classes.

Difference from the reference's box handling: the reference round-trips
boxes through global-frame quaternions (lyft SDK format); we evaluate
directly on lidar-frame (x, y, z, dx, dy, dz, yaw) boxes with the same
polygon-intersection x height-overlap IoU, which is frame-invariant.
"""

import numpy as np

DEFAULT_IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2))


def _iou3d_matrix(gt_boxes, pred_boxes):
    import jax.numpy as jnp
    from ...ops.iou3d_nms.iou3d_nms_utils import boxes_iou3d
    if len(gt_boxes) == 0 or len(pred_boxes) == 0:
        return np.zeros((len(gt_boxes), len(pred_boxes)))
    return np.asarray(boxes_iou3d(
        jnp.asarray(gt_boxes[:, :7], jnp.float32),
        jnp.asarray(pred_boxes[:, :7], jnp.float32)), np.float64)


def get_envelope(precisions):
    """Right-max precision envelope (reference lyft_eval.py:229)."""
    return np.maximum.accumulate(precisions[::-1])[::-1]


def get_ap(recalls, precisions):
    """VOC 'correct AP': sum of (delta recall) * envelope precision."""
    recalls = np.concatenate(([0.0], recalls, [1.0]))
    precisions = np.concatenate(([0.0], precisions, [0.0]))
    precisions = get_envelope(precisions)
    i = np.where(recalls[1:] != recalls[:-1])[0]
    return float(np.sum((recalls[i + 1] - recalls[i]) * precisions[i + 1]))


def recall_precision(gt, predictions, iou_threshold_list):
    """gt / predictions: lists of dicts with 'sample_token', 'box' (7,),
    'name'; predictions also 'score'.  Returns (recalls, precisions,
    ap_list) stacked over thresholds, or (-1, -1, -1) with no gt."""
    num_gts = len(gt)
    if num_gts == 0:
        return -1, -1, -1
    image_gts = {}
    for g in gt:
        image_gts.setdefault(g["sample_token"], []).append(
            np.asarray(g["box"], np.float64))
    image_gts = {k: np.stack(v) for k, v in image_gts.items()}
    gt_checked = {k: np.zeros((len(v), len(iou_threshold_list)))
                  for k, v in image_gts.items()}
    # per-frame IoU matrices computed ONCE per frame in a single batched
    # rotated-IoU launch (the reference recomputes per prediction); each
    # prediction then just indexes its column
    preds = sorted(predictions, key=lambda x: x["score"], reverse=True)
    pred_idx_by_token = {}
    for pi, pred in enumerate(preds):
        pred_idx_by_token.setdefault(pred["sample_token"], []).append(pi)
    overlap_col = {}
    for token, pis in pred_idx_by_token.items():
        gts = image_gts.get(token)
        if gts is None or len(gts) == 0:
            continue
        pb = np.stack([np.asarray(preds[pi]["box"], np.float64)[:7]
                       for pi in pis])
        mat = _iou3d_matrix(gts, pb)                 # (N_gt, N_pred_frame)
        for ci, pi in enumerate(pis):
            overlap_col[pi] = mat[:, ci]
    tp = np.zeros((len(preds), len(iou_threshold_list)))
    fp = np.zeros((len(preds), len(iou_threshold_list)))
    for pi, pred in enumerate(preds):
        token = pred["sample_token"]
        overlaps = overlap_col.get(pi)
        if overlaps is None:
            fp[pi, :] = 1.0
            continue
        jmax = int(np.argmax(overlaps))
        max_overlap = overlaps[jmax]
        checked = gt_checked[token]
        for ti, th in enumerate(iou_threshold_list):
            if max_overlap > th:
                if checked[jmax, ti] == 0:
                    tp[pi, ti] = 1.0
                    checked[jmax, ti] = 1
                else:
                    fp[pi, ti] = 1.0
            else:
                fp[pi, ti] = 1.0
    fp = np.cumsum(fp, axis=0)
    tp = np.cumsum(tp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap_list = [get_ap(recalls[:, ti], precisions[:, ti])
               for ti in range(len(iou_threshold_list))]
    return recalls, precisions, ap_list


def get_average_precisions(gt, predictions, class_names, iou_thresholds):
    """Per-class AP averaged over the IoU threshold list (reference
    lyft_eval.py:345)."""
    gt_by_class, pred_by_class = {}, {}
    for g in gt:
        gt_by_class.setdefault(g["name"], []).append(g)
    for p in predictions:
        pred_by_class.setdefault(p["name"], []).append(p)
    average_precisions = np.zeros(len(class_names))
    for ci, cls in enumerate(class_names):
        if cls in pred_by_class and cls in gt_by_class:
            _, _, ap_list = recall_precision(
                gt_by_class[cls], pred_by_class[cls], iou_thresholds)
            if ap_list != -1:
                average_precisions[ci] = float(np.mean(ap_list))
    return average_precisions


def format_lyft_results(classwise_ap, class_names, iou_threshold_list,
                        version="trainval"):
    """Result table (reference lyft_utils.py:319)."""
    ret_dict = {}
    result = f"----------------Lyft {version} results-----------------\n"
    for ci, cls in enumerate(class_names):
        result += f"***{cls}\n"
        result += "mAP@{}: {:.4f}\n".format(
            list(iou_threshold_list), classwise_ap[ci])
        ret_dict[f"mAP_{cls}"] = float(classwise_ap[ci])
    mAP = float(np.mean(classwise_ap)) if len(classwise_ap) else 0.0
    result += "--------------average performance-------------\n"
    result += f"mAP: {mAP:.4f}\n"
    ret_dict["mAP"] = mAP
    return result, ret_dict


def lyft_eval(det_annos, gt_annos, class_names,
              iou_thresholds=DEFAULT_IOU_THRESHOLDS):
    """End-to-end evaluation on lidar-frame annos.

    det_annos: per frame {'frame_id', 'boxes_lidar' (N, 7+), 'score',
    'name'}; gt_annos: per frame {'frame_id'|'sample_token', 'boxes'|
    'gt_boxes_lidar' (M, 7+), 'name'|'names'}.
    """
    preds, gts = [], []
    for d in det_annos:
        token = d.get("frame_id", d.get("sample_token"))
        boxes = np.asarray(d.get("boxes_lidar", d.get("boxes",
                                                      np.zeros((0, 7)))))
        names = np.asarray(d.get("name", d.get("names", [])))
        scores = np.asarray(d.get("score", np.zeros(len(boxes))))
        for i in range(len(boxes)):
            preds.append({"sample_token": token, "box": boxes[i, :7],
                          "name": str(names[i]), "score": float(scores[i])})
    for g in gt_annos:
        token = g.get("frame_id", g.get("sample_token"))
        boxes = np.asarray(g.get("gt_boxes_lidar", g.get("boxes",
                                                         np.zeros((0, 7)))))
        names = np.asarray(g.get("name", g.get("names", [])))
        for i in range(len(boxes)):
            gts.append({"sample_token": token, "box": boxes[i, :7],
                        "name": str(names[i])})
    aps = get_average_precisions(gts, preds, class_names,
                                 list(iou_thresholds))
    return format_lyft_results(aps, class_names, list(iou_thresholds))
