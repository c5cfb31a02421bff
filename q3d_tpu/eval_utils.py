"""Evaluation loop: jitted inference, recall stats, metric computation.

Parity with reference ``tools/eval_utils/eval_utils.py:22`` (``eval_one_epoch``
— batch loop with H2D copy, forward, recall accumulation via IoU, prediction
dicts, distributed merge, latency meter with warm-up skip, final
``dataset.evaluation``).  The per-frame ragged post-processing becomes
fixed-size arrays trimmed on host; the filesystem rank-merge becomes an
ordered in-memory gather (single process drives all local devices).
"""

import pickle
import time
from pathlib import Path

import numpy as np

from .models import load_data_to_device
from .parallel import make_eval_step
from .utils.common_utils import AverageMeter


def statistics_info(ret_arrays, gt_boxes_np, recall_thresh_list, metric):
    """Recall bookkeeping (reference eval_utils.py:12 +
    detector3d_template.generate_recall_record:286), host-side."""
    import jax.numpy as jnp
    from .ops.iou3d_nms import boxes_iou3d

    B = ret_arrays["final_boxes"].shape[0]
    for b in range(B):
        gts = gt_boxes_np[b]
        gts = gts[gts[:, -1] > 0][:, :7]
        metric["gt_num"] += len(gts)
        if len(gts) == 0:
            continue
        valid = ret_arrays["final_valid"][b].astype(bool)
        boxes = ret_arrays["final_boxes"][b][valid][:, :7]
        if len(boxes) == 0:
            continue
        iou = np.asarray(boxes_iou3d(jnp.asarray(gts, jnp.float32),
                                     jnp.asarray(boxes, jnp.float32)))
        best = iou.max(axis=1)
        for th in recall_thresh_list:
            metric[f"recall_rcnn_{th}"] += int((best > th).sum())
    return metric


def eval_one_epoch(model, variables, dataloader, dataset, class_names, cfg,
                   rules=None, logger=None, result_dir=None, save_to_file=False,
                   infer_time=False, compute_dtype=None):
    eval_step = make_eval_step(model, rules=rules)
    metric = {"gt_num": 0}
    thresh_list = list(cfg.MODEL.POST_PROCESSING.get("RECALL_THRESH_LIST",
                                                     [0.3, 0.5, 0.7]))
    for th in thresh_list:
        metric[f"recall_rcnn_{th}"] = 0

    det_annos = []
    time_meter = AverageMeter()
    n_batches = len(dataloader)
    for i, raw in enumerate(dataloader):
        batch = load_data_to_device(raw, compute_dtype=compute_dtype)
        t0 = time.perf_counter()
        out = eval_step(variables, batch)
        out["final_boxes"].block_until_ready()
        dt = time.perf_counter() - t0
        if i >= max(1, int(n_batches * 0.1)):   # warm-up skip (reference :40)
            time_meter.update(dt * 1000)
        host = {k: np.asarray(v, np.float32) if v.dtype != bool else np.asarray(v)
                for k, v in out.items()}
        if "gt_boxes" in raw:
            statistics_info(host, raw["gt_boxes"], thresh_list, metric)
        det_annos += dataset.generate_prediction_dicts(
            raw, host, class_names,
            output_path=result_dir if save_to_file else None)
        if logger and i % 20 == 0:
            logger.info(f"eval batch {i}/{n_batches} "
                        f"({time_meter.avg:.1f} ms/batch)")

    ret_dict = {}
    gt_num = max(metric["gt_num"], 1)
    for th in thresh_list:
        ret_dict[f"recall/rcnn_{th}"] = metric[f"recall_rcnn_{th}"] / gt_num
        if logger:
            logger.info(f"recall_rcnn_{th}: {ret_dict[f'recall/rcnn_{th}']:.4f}")
    if infer_time and logger:
        logger.info(f"mean inference time: {time_meter.avg:.2f} ms/batch")

    if result_dir is not None:
        result_dir = Path(result_dir)
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)

    result_str, result_dict = dataset.evaluation(
        det_annos, class_names,
        eval_metric=cfg.MODEL.POST_PROCESSING.get("EVAL_METRIC", "default"))
    if logger:
        logger.info(result_str)
    ret_dict.update(result_dict)
    ret_dict["infer_time_ms"] = time_meter.avg
    return ret_dict
