"""End-to-end integration test: tiny CenterPoint (sparse backbone) on
synthetic data."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/centerpoint_tiny.yaml"


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, dataset, loader, model, variables


def test_inference_shapes(setup):
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))
    out = model.apply(variables, batch, train=False)
    # 2 heads x POST_MAXSIZE 32 = 64 slots
    assert out["final_boxes"].shape == (2, 64, 7)
    assert out["final_scores"].shape == (2, 64)
    assert bool(jnp.all(out["final_labels"] >= 1))
    assert bool(jnp.all(jnp.isfinite(out["final_boxes"])))


def test_train_loss_finite(setup):
    cfg, dataset, loader, model, variables = setup
    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    batch = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss"]) > 0


def test_focal_backbone_swap(setup):
    """VoxelBackBone8xFocal drop-in (importance-gated sparse convs)."""
    cfg, dataset, loader, model, variables = setup
    cfg2 = cfg_from_yaml_file(str(CFG_PATH), EDict())
    cfg2.MODEL.BACKBONE_3D.NAME = "VoxelBackBone8xFocal"
    from q3d_tpu.models import build_network as bn
    m2 = bn(cfg2.MODEL, num_class=len(cfg2.CLASS_NAMES), dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    v2 = jax.jit(lambda k, b: m2.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)
    out = m2.apply(v2, batch, train=False)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()
