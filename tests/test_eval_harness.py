"""Eval harness integration: eval_one_epoch with recall stats, result.pkl,
metric computation; plus the PTQ driver's quantized-eval path."""

from pathlib import Path

import numpy as np
import jax
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.eval_utils import eval_one_epoch

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/pointpillar_tiny.yaml"


def test_eval_one_epoch_full_loop(tmp_path):
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    cfg.DATA_CONFIG.NUM_FRAMES = 4
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)

    ret = eval_one_epoch(model, variables, loader, dataset, cfg.CLASS_NAMES,
                         cfg, result_dir=tmp_path, infer_time=True)
    assert "mAP" in ret
    assert "recall/rcnn_0.3" in ret
    assert (tmp_path / "result.pkl").exists()
    assert ret["infer_time_ms"] > 0


def test_eval_with_quant_rules(tmp_path):
    from q3d_tpu.quant.api import pointpillar_recipe
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    cfg.DATA_CONFIG.NUM_FRAMES = 2
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    ret = eval_one_epoch(model, variables, loader, dataset, cfg.CLASS_NAMES,
                         cfg, rules=pointpillar_recipe())
    assert "mAP" in ret
