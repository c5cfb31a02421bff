"""Argoverse 2 detection metric — numpy implementation of the av2
evaluation protocol (``av2.evaluation.detection.eval.evaluate``; the
reference calls that SDK directly, argo2_dataset.py:449-486, so this is the
self-contained twin used when the SDK is absent).

Protocol (av2 DetectionCfg defaults):
  * matching by EUCLIDEAN CENTER DISTANCE in 3D, greedy over detections
    sorted by score, one gt per detection per threshold;
  * AP = mean interpolated precision over 100 recall samples, averaged
    over affinity thresholds {0.5, 1, 2, 4} m;
  * true-positive metrics at the 2.0 m threshold: ATE (m), ASE
    (1 - aligned-IoU), AOE (rad, minimal angle diff);
  * CDS = AP * mean(1 - normalized err), errors normalized by
    ATE/2.0, ASE/1.0, AOE/pi (av2 constants MAX_NORMALIZED_ATE etc.);
  * gts beyond ``max_range_m`` (default 200 m) are excluded.
"""

import numpy as np

AFFINITY_THRESHOLDS_M = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD_M = 2.0
MAX_RANGE_M = 200.0
# normalizers for the composite score (av2 detection constants)
NORM_ATE, NORM_ASE, NORM_AOE = 2.0, 1.0, np.pi


def _aligned_iou(det_box, gt_box):
    mins = np.minimum(det_box[3:6], gt_box[3:6])
    inter = np.prod(mins)
    union = np.prod(det_box[3:6]) + np.prod(gt_box[3:6]) - inter
    return inter / max(union, 1e-9)


def _angle_diff(a, b):
    """Minimal absolute yaw difference, wrapped to [0, pi]."""
    d = np.abs(a - b) % (2 * np.pi)
    return min(d, 2 * np.pi - d)


def accumulate_class(dets, gts, class_name, dist_th, max_range=MAX_RANGE_M):
    """One (class, threshold) pass over all frames.

    dets/gts: per-frame dicts {boxes (N,7+), names, [scores]}."""
    npos = 0
    gt_keep = []
    for g in gts:
        boxes = np.asarray(g["boxes"]).reshape(-1, g["boxes"].shape[-1]) \
            if len(g["boxes"]) else np.zeros((0, 7))
        keep = (np.asarray(g["names"]) == class_name)
        if len(boxes):
            keep = keep & (np.linalg.norm(boxes[:, :2], axis=1) < max_range)
        gt_keep.append(keep)
        npos += int(keep.sum())
    rows = []
    for fi, det in enumerate(dets):
        mask = np.asarray(det["names"]) == class_name
        for di in np.where(mask)[0]:
            rows.append((float(det["scores"][di]), fi, di))
    rows.sort(key=lambda r: -r[0])

    taken = [set() for _ in gts]
    tp, fp = [], []
    errs = {"ate": [], "ase": [], "aoe": []}
    for score, fi, di in rows:
        det_box = np.asarray(dets[fi]["boxes"][di])
        gidx = np.where(gt_keep[fi])[0]
        best_j, best_d = -1, np.inf
        for j in gidx:
            if j in taken[fi]:
                continue
            d = np.linalg.norm(det_box[:3]
                               - np.asarray(gts[fi]["boxes"][j])[:3])
            if d < best_d:
                best_d, best_j = d, j
        if best_j >= 0 and best_d < dist_th:
            taken[fi].add(best_j)
            tp.append(1)
            fp.append(0)
            gt_box = np.asarray(gts[fi]["boxes"][best_j])
            errs["ate"].append(best_d)
            errs["ase"].append(1.0 - _aligned_iou(det_box, gt_box))
            errs["aoe"].append(_angle_diff(det_box[6], gt_box[6]))
        else:
            tp.append(0)
            fp.append(1)

    if npos == 0 or not rows:
        return {"ap": 0.0, "errs": errs, "npos": npos}
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / npos
    precision = tp / np.maximum(tp + fp, 1e-9)
    # monotone precision envelope from the high-recall end (the av2 SDK /
    # nuScenes protocol interpolation step) BEFORE sampling — raw precision
    # can dip locally and would otherwise bias the fallback AP low
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    rec_interp = np.linspace(0, 1, 100)
    prec_interp = np.interp(rec_interp, recall, precision, right=0)
    return {"ap": float(prec_interp.mean()), "errs": errs, "npos": npos}


def argo2_eval(det_annos, gt_annos, class_names, max_range=MAX_RANGE_M):
    """det_annos: per frame {boxes_lidar|boxes, name|names, score};
    gt_annos: per frame {boxes, names}.  Returns (result_str, dict) with
    per-class AP / ATE / ASE / AOE / CDS and their means."""
    dets = [{"boxes": np.asarray(d.get("boxes_lidar", d.get("boxes"))),
             "names": np.asarray(d.get("name", d.get("names", []))),
             "scores": np.asarray(d.get("score", d.get("scores", [])))}
            for d in det_annos]
    gts = [{"boxes": np.asarray(g.get("boxes", g.get("gt_boxes",
                                                     np.zeros((0, 7))))),
            "names": np.asarray(g.get("names", g.get("name", [])))}
           for g in gt_annos]

    res = {}
    for cls in class_names:
        aps = []
        tp_res = None
        for th in AFFINITY_THRESHOLDS_M:
            acc = accumulate_class(dets, gts, cls, th, max_range)
            aps.append(acc["ap"])
            if th == TP_THRESHOLD_M:
                tp_res = acc
        ap = float(np.mean(aps))
        e = tp_res["errs"]
        ate = float(np.mean(e["ate"])) if e["ate"] else NORM_ATE
        ase = float(np.mean(e["ase"])) if e["ase"] else NORM_ASE
        aoe = float(np.mean(e["aoe"])) if e["aoe"] else NORM_AOE
        cds = ap * np.mean([1 - min(ate / NORM_ATE, 1.0),
                            1 - min(ase / NORM_ASE, 1.0),
                            1 - min(aoe / NORM_AOE, 1.0)])
        res[cls] = {"AP": ap, "ATE": ate, "ASE": ase, "AOE": aoe,
                    "CDS": float(cds)}

    out = {}
    lines = ["--- Argoverse2 protocol (center-distance AP, CDS) ---"]
    for cls, r in res.items():
        lines.append(f"{cls}: AP {r['AP']:.4f} ATE {r['ATE']:.3f} "
                     f"ASE {r['ASE']:.3f} AOE {r['AOE']:.3f} "
                     f"CDS {r['CDS']:.4f}")
        for k, v in r.items():
            out[f"{cls}/{k}"] = v
    for k in ("AP", "ATE", "ASE", "AOE", "CDS"):
        out[f"mean/{k}"] = float(np.mean([r[k] for r in res.values()])) \
            if res else 0.0
    lines.append(f"mAP {out.get('mean/AP', 0):.4f}  "
                 f"mCDS {out.get('mean/CDS', 0):.4f}")
    return "\n".join(lines), out
