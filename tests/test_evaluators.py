"""Metric evaluators: KITTI R40 AP and nuScenes NDS/mAP sanity properties."""

import numpy as np

from q3d_tpu.datasets.kitti.kitti_eval import (get_official_eval_result,
                                               image_box_overlap)
from q3d_tpu.datasets.nuscenes.nuscenes_eval import nuscenes_eval


def _kitti_anno(boxes_cam, names, scores=None, height=50):
    n = len(names)
    bbox = np.tile([100.0, 100.0, 200.0, 100.0 + height], (n, 1))
    anno = {
        "name": np.asarray(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n),
        "alpha": np.zeros(n),
        "bbox": bbox,
        "dimensions": boxes_cam[:, 3:6] if n else np.zeros((0, 3)),
        "location": boxes_cam[:, 0:3] if n else np.zeros((0, 3)),
        "rotation_y": boxes_cam[:, 6] if n else np.zeros(0),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores)
    return anno


def _cam_box(x, z, l=4.0, h=1.5, w=1.8, ry=0.1):
    return [x, 1.0, z, l, h, w, ry]


def test_kitti_perfect_predictions_ap100():
    # the R40 protocol needs >= 41 attainable recall levels for AP ~ 100,
    # so use 60 GT objects across frames (official numba code behaves the
    # same with few GTs)
    rng = np.random.RandomState(0)
    gts, dts = [], []
    for f in range(30):
        boxes = np.asarray([_cam_box(f * 0.1, 10), _cam_box(5 + f * 0.1, 20)],
                           np.float32)
        gts.append(_kitti_anno(boxes, ["Car", "Car"]))
        dts.append(_kitti_anno(boxes, ["Car", "Car"],
                               scores=rng.uniform(0.5, 1.0, 2)))
    result_str, res = get_official_eval_result(gts, dts, ["Car"])
    assert res["Car_3d/moderate_R40"] > 95.0, res
    assert res["Car_bev/easy_R40"] > 95.0


def test_kitti_missed_detection_lowers_ap():
    rng = np.random.RandomState(1)
    gts, dts = [], []
    for f in range(30):
        boxes = np.asarray([_cam_box(f * 0.1, 10), _cam_box(5 + f * 0.1, 20)],
                           np.float32)
        gts.append(_kitti_anno(boxes, ["Car", "Car"]))
        # detect only the first of the two objects per frame (recall 0.5)
        dts.append(_kitti_anno(boxes[:1], ["Car"],
                               scores=rng.uniform(0.5, 1.0, 1)))
    _, res = get_official_eval_result(gts, dts, ["Car"])
    assert 30.0 < res["Car_3d/moderate_R40"] < 70.0, res


def test_kitti_false_positives_lower_precision():
    gt_boxes = np.asarray([_cam_box(0, 10)], np.float32)
    fp = np.asarray([_cam_box(0, 10), _cam_box(30, 40)], np.float32)
    gts = [_kitti_anno(gt_boxes, ["Car"]) for _ in range(3)]
    dts = [_kitti_anno(fp, ["Car", "Car"], scores=[0.9, 0.95])
           for _ in range(3)]
    _, res = get_official_eval_result(gts, dts, ["Car"])
    assert res["Car_3d/moderate_R40"] < 99.0


def test_kitti_dontcare_absorbs_fp():
    """Detections landing on DontCare regions are not false positives for
    the 2D bbox metric (reference eval.py:248-262 nstuff subtraction)."""
    gt_boxes = np.asarray([_cam_box(0, 10)], np.float32)
    dt_boxes = np.asarray([_cam_box(0, 10), _cam_box(30, 40)], np.float32)

    def frames(with_dc):
        gts, dts = [], []
        for _ in range(60):
            g = _kitti_anno(gt_boxes, ["Car"])
            if with_dc:
                g = _kitti_anno(
                    np.concatenate([gt_boxes, gt_boxes]), ["Car", "DontCare"])
                # DontCare 2D region far from the Car's bbox, matching dt#2
                g["bbox"] = np.asarray([[100, 100, 200, 150],
                                        [300, 300, 400, 350]], np.float64)
            d = _kitti_anno(dt_boxes, ["Car", "Car"],
                            scores=np.random.uniform(0.5, 1.0, 2))
            d["bbox"] = np.asarray([[100, 100, 200, 150],
                                    [300, 300, 400, 350]], np.float64)
            gts.append(g)
            dts.append(d)
        return gts, dts

    _, res_nodc = get_official_eval_result(*frames(False), ["Car"])
    _, res_dc = get_official_eval_result(*frames(True), ["Car"])
    # the off-GT detection is an fp without DontCare, absorbed with it
    assert res_dc["Car_bbox/easy_R40"] > res_nodc["Car_bbox/easy_R40"]
    assert res_dc["Car_bbox/easy_R40"] > 95.0


def test_image_box_overlap():
    a = np.asarray([[0, 0, 10, 10]], np.float64)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                   np.float64)
    ov = image_box_overlap(a, b)
    np.testing.assert_allclose(ov[0, 0], 1.0)
    np.testing.assert_allclose(ov[0, 1], 25.0 / 175.0)
    np.testing.assert_allclose(ov[0, 2], 0.0)


def _nusc_frame(boxes, names, scores=None):
    d = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 9),
         "names": np.asarray(names)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    return d


def test_nuscenes_perfect_nds():
    box = [1, 2, 0, 4, 2, 1.5, 0.3, 1.0, 0.5]
    gts = [_nusc_frame([box], ["car"])]
    dets = [_nusc_frame([box], ["car"], [0.9])]
    _, m = nuscenes_eval(dets, gts, ["car"])
    assert m["mAP"] > 0.99
    assert m["NDS"] > 0.99
    assert m["mATE"] < 1e-6 and m["mAOE"] < 1e-6


def test_nuscenes_distance_thresholds():
    box = [0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]
    shifted = [1.5, 0, 0, 4, 2, 1.5, 0.0, 0, 0]   # 1.5 m center error
    gts = [_nusc_frame([box], ["car"])]
    dets = [_nusc_frame([shifted], ["car"], [0.9])]
    _, m = nuscenes_eval(dets, gts, ["car"])
    # matches at 2m and 4m only -> AP averaged over 4 thresholds = 0.5
    assert 0.4 < m["AP_car"] < 0.6, m
    assert m["NDS"] < 0.9


def test_nuscenes_wrong_class_no_credit():
    box = [0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]
    gts = [_nusc_frame([box], ["car"])]
    dets = [_nusc_frame([box], ["truck"], [0.9])]
    _, m = nuscenes_eval(dets, gts, ["car", "truck"])
    assert m["AP_car"] == 0.0
