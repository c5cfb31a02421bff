"""End-to-end integration test: tiny PartA2 two-stage detector."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/parta2_tiny.yaml"


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    return cfg, dataset, loader, model, variables


def test_two_stage_inference(setup):
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))
    out = model.apply(variables, batch, train=False)
    R = cfg.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE
    assert out["final_boxes"].shape == (2, R, 7)
    assert bool(jnp.all(jnp.isfinite(out["final_boxes"])))


def test_two_stage_train_loss(setup):
    cfg, dataset, loader, model, variables = setup
    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    batch = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    # rpn + point seg + rcnn losses all folded in
    assert np.isfinite(float(out["loss"]))
    tb = out["tb_dict"]
    assert "rcnn_cls_loss" in tb and "point_cls_loss" in tb


def test_part_offsets_predicted_and_consumed(setup):
    """PartA2's defining component (reference point_intra_part_head.py):
    the part head emits [0,1]^3 offsets and the ROI head pools them."""
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))

    def run_to_point_head(m, b):
        b = dict(b)
        b = m.vfe(b, False)
        b = m.backbone_3d(b, False)
        b = m.map_to_bev_module(b, False)
        b = m.backbone_2d(b, False)
        b = m.dense_head(b, False)
        b = m.point_head(b, False)
        return b["point_part_offset"], b["point_cls_scores"]

    part, scores = model.apply(variables, batch, method=run_to_point_head)
    assert part.shape[-1] == 3
    assert bool(jnp.all((part >= 0) & (part <= 1)))
    assert scores.shape[0] == part.shape[0]


def test_part_loss_in_training(setup):
    cfg, dataset, loader, model, variables = setup
    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    batch = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    tb = out["tb_dict"]
    assert "point_part_loss" in tb, tb.keys()
    assert np.isfinite(float(tb["point_part_loss"]))
