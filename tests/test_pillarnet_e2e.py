"""End-to-end integration test: tiny PillarNet (dynamic pillars + 2D sparse
backbone) on synthetic data."""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/pillarnet_tiny.yaml"


def test_pillarnet_inference():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    assert out["final_boxes"].shape == (2, 32, 7)
    assert bool(jnp.all(jnp.isfinite(out["final_boxes"])))
