"""End-to-end integration test: tiny SECONDNetIoU (IoU rectification)."""

from pathlib import Path

import jax
import numpy as np

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/second_iou_tiny.yaml"


def test_second_iou_inference_and_train():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    R = cfg.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE
    assert out["final_boxes"].shape == (2, R, 7)
    assert np.isfinite(np.asarray(out["final_scores"])).all()

    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    tb = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, tb, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
