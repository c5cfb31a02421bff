"""Self-contained nuScenes detection metrics (numpy).

The reference delegates to the external ``nuscenes-devkit``
(``pcdet/datasets/nuscenes/nuscenes_dataset.py:257-311``); that package is
not available here, so this module re-implements the official protocol:

  * center-distance matching at D = {0.5, 1, 2, 4} m per class;
  * AP = normalized area of the (recall, precision) curve above
    (0.1, 0.1) — the devkit's clipped-and-rescaled integral;
  * TP metrics at D=2 m matches: ATE (m), ASE (1-IoU of aligned boxes),
    AOE (rad), AVE (m/s);
  * NDS = (5 * mAP + sum_tp (1 - min(1, err_norm))) / 10 with the devkit's
    per-metric normalization.

Inputs: det/gt annos as dicts with 'boxes' (N, 9: x y z dx dy dz yaw vx vy),
'names' (N,), det also 'scores' (N,).
"""

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_DIST = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


def _angle_diff(a, b, period=2 * np.pi):
    d = (a - b) % period
    return np.minimum(d, period - d)


def _scale_iou(det_box, gt_box):
    """IoU of aligned, centered boxes (size-only) — devkit scale_iou."""
    mins = np.minimum(det_box[3:6], gt_box[3:6])
    inter = np.prod(mins)
    union = np.prod(det_box[3:6]) + np.prod(gt_box[3:6]) - inter
    return inter / max(union, 1e-9)


def accumulate_class(dets, gts, class_name, dist_th):
    """All-frame accumulation for one (class, distance threshold).

    Returns dict with precision/recall arrays and tp-metric lists."""
    npos = sum(int((g["names"] == class_name).sum()) for g in gts)
    rows = []   # (score, frame, det_idx)
    for fi, det in enumerate(dets):
        mask = det["names"] == class_name
        for di in np.where(mask)[0]:
            rows.append((det["scores"][di], fi, di))
    rows.sort(key=lambda r: -r[0])

    taken = [set() for _ in gts]
    tp, fp = [], []
    errs = {"trans": [], "scale": [], "orient": [], "vel": []}
    for score, fi, di in rows:
        det_box = dets[fi]["boxes"][di]
        gt = gts[fi]
        gmask = gt["names"] == class_name
        gidx = np.where(gmask)[0]
        best_j, best_d = -1, np.inf
        for j in gidx:
            if j in taken[fi]:
                continue
            d = np.linalg.norm(det_box[:2] - gt["boxes"][j][:2])
            if d < best_d:
                best_d, best_j = d, j
        if best_j >= 0 and best_d < dist_th:
            taken[fi].add(best_j)
            tp.append(1)
            fp.append(0)
            gt_box = gt["boxes"][best_j]
            errs["trans"].append(best_d)
            errs["scale"].append(1 - _scale_iou(det_box, gt_box))
            period = np.pi if class_name == "barrier" else 2 * np.pi
            errs["orient"].append(_angle_diff(det_box[6], gt_box[6], period))
            if len(det_box) >= 9 and len(gt_box) >= 9:
                errs["vel"].append(
                    float(np.linalg.norm(det_box[7:9] - gt_box[7:9])))
        else:
            tp.append(0)
            fp.append(1)

    if npos == 0 or not rows:
        return {"ap": 0.0, "errs": errs, "npos": npos}
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / npos
    precision = tp / np.maximum(tp + fp, 1e-9)
    # devkit: interpolate precision onto 101 recall points, clip, rescale
    rec_interp = np.linspace(0, 1, 101)
    prec_interp = np.interp(rec_interp, recall, precision, right=0)
    prec_interp = prec_interp[rec_interp >= MIN_RECALL]
    prec_interp = np.clip(prec_interp - MIN_PRECISION, 0, None) \
        / (1 - MIN_PRECISION)
    ap = float(prec_interp.mean())
    return {"ap": ap, "errs": errs, "npos": npos}


def nuscenes_eval(det_annos, gt_annos, class_names, verbose=False):
    """-> (result_str, dict with per-class APs, TP errors, mAP, NDS)."""
    metrics = {}
    ap_all = []
    tp_metrics = {"trans": [], "scale": [], "orient": [], "vel": []}
    for cls in class_names:
        aps = []
        for dist_th in DIST_THRESHOLDS:
            acc = accumulate_class(det_annos, gt_annos, cls, dist_th)
            aps.append(acc["ap"])
            if dist_th == TP_DIST:
                for k in tp_metrics:
                    vals = acc["errs"][k]
                    tp_metrics[k].append(np.mean(vals) if vals else 1.0)
        cls_ap = float(np.mean(aps))
        metrics[f"AP_{cls}"] = cls_ap
        ap_all.append(cls_ap)
    mAP = float(np.mean(ap_all)) if ap_all else 0.0

    # devkit TP normalization bounds
    tp_errors = {
        "mATE": float(np.mean(tp_metrics["trans"])) if tp_metrics["trans"] else 1.0,
        "mASE": float(np.mean(tp_metrics["scale"])) if tp_metrics["scale"] else 1.0,
        "mAOE": float(np.mean(tp_metrics["orient"])) if tp_metrics["orient"] else 1.0,
        "mAVE": float(np.mean(tp_metrics["vel"])) if tp_metrics["vel"] else 1.0,
    }
    tp_scores = [max(0.0, 1 - tp_errors["mATE"]),
                 max(0.0, 1 - tp_errors["mASE"]),
                 max(0.0, 1 - tp_errors["mAOE"] / np.pi),
                 max(0.0, 1 - min(tp_errors["mAVE"], 1.0))]
    nds = float((5 * mAP + sum(tp_scores)) / (5 + len(tp_scores)))
    metrics.update(tp_errors)
    metrics["mAP"] = mAP
    metrics["NDS"] = nds
    lines = [f"{k}: {v:.4f}" for k, v in metrics.items()]
    return "\n".join(lines), metrics
