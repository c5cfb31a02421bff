"""End-to-end integration test: tiny PV-RCNN++ (proposal-centric keypoints,
VectorPool aggregation, CenterHead proposals)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/pvrcnn_plusplus_tiny.yaml"


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    return cfg, dataset, loader, model, variables


def test_pvrcnn_pp_inference(setup):
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))
    out = model.apply(variables, batch, train=False)
    # proposals come straight from CenterHead NMS (1 head x POST_MAXSIZE)
    R = cfg.MODEL.DENSE_HEAD.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE
    assert out["final_boxes"].shape == (2, R, 7)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()
    assert out["keypoints"].shape == (2, cfg.MODEL.PFE.NUM_KEYPOINTS, 3)


def test_pvrcnn_pp_train_loss(setup):
    cfg, dataset, loader, model, variables = setup
    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    batch = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    tb = out["tb_dict"]
    assert "rcnn_cls_loss" in tb and "point_cls_loss" in tb
    assert "hm_loss_head_0" in tb


def test_spc_keypoints_near_proposals(setup):
    """SPC-sampled keypoints must lie near the proposal set when proposals
    exist."""
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))
    out = model.apply(variables, batch, train=False)
    rois = np.asarray(out["rois"])
    rv = np.asarray(out["roi_valid"])
    kps = np.asarray(out["keypoints"])
    for b in range(rois.shape[0]):
        if not rv[b].any():
            continue
        ctr = rois[b, rv[b], :3]
        half_diag = np.linalg.norm(rois[b, rv[b], 3:6], axis=-1) / 2
        d = np.linalg.norm(kps[b][:, None] - ctr[None], axis=-1)
        near = (d <= half_diag[None] + 1.6 + 1e-4).any(-1)
        # every keypoint is proposal-centric
        assert near.mean() > 0.95, near.mean()
