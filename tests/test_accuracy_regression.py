"""Accuracy regression harness — the reference's entire test methodology
(SURVEY §4: metric regression through eval_one_epoch ending in official
metrics; reference tools/eval_utils/eval_utils.py:22) applied to the quant
deployment modes.

A tiny CenterPoint trained to convergence on the synthetic dataset is
committed at tests/fixtures/centerpoint_tiny_trained.pkl (produced by
`python tools/train.py --cfg_file .../centerpoint_tiny.yaml --epochs 150
--fix_random_seed`).  Each quant mode runs the full detection pipeline +
the nuScenes-protocol evaluator; INT8 deploy must hold the reference's
north-star bound (<= 1% relative NDS drop vs FP32 — BASELINE.md)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network
from q3d_tpu.eval_utils import eval_one_epoch
from q3d_tpu.utils.checkpoint import load_checkpoint

ROOT = Path(__file__).resolve().parent.parent
CKPT = Path(__file__).resolve().parent / "fixtures" / \
    "centerpoint_tiny_trained.pkl"

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="trained fixture checkpoint not present")


@pytest.fixture(scope="module")
def trained():
    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/synthetic_models/centerpoint_tiny.yaml"),
        EDict())
    cfg.MODEL.POST_PROCESSING.EVAL_METRIC = "nuscenes"
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    from q3d_tpu.models import load_data_to_device
    batch = load_data_to_device(next(iter(loader)))
    template = jax.jit(lambda k, b: model.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)
    variables, _, _, _ = load_checkpoint(str(CKPT), template)
    return cfg, dataset, loader, model, variables, batch


def _eval(cfg, dataset, loader, model, variables, rules=None):
    res = eval_one_epoch(model, variables, loader, dataset,
                         list(cfg.CLASS_NAMES), cfg, rules=rules)
    return res


def test_fp32_model_actually_detects(trained):
    """Guard against the r1 failure mode: quant tests on untrained models
    prove nothing.  The fixture must produce a real NDS."""
    cfg, dataset, loader, model, variables, _ = trained
    res = _eval(cfg, dataset, loader, model, variables)
    assert res["NDS"] > 0.4, res
    assert res["mAP"] > 0.3, res


@pytest.mark.parametrize("head_bf16", [False, True],
                         ids=["full", "head_bf16"])
def test_int8_deploy_nds_drop_within_1pct(trained, head_bf16):
    """North star (BASELINE.md): INT8 end-to-end with <= 1% relative NDS
    drop vs FP32 — with the bench recipe (first conv quantized too).
    head_bf16 = the r5 deployment recipe (dense head stays bf16 — measured
    faster than int8 on v5e and strictly more accurate)."""
    from q3d_tpu.quant.api import (int8_deploy_recipe, quantize_model,
                                   collect_stats, compute_amax)
    cfg, dataset, loader, model, variables, batch = trained
    fp = _eval(cfg, dataset, loader, model, variables)
    extra = ("dense_head.*",) if head_bf16 else ()
    rules = int8_deploy_recipe(residency=True, quantize_first_conv=True,
                               extra_no_list=extra)
    v8 = quantize_model(model, variables, rules, batch)
    v8 = collect_stats(model, v8, rules, [batch] * 2, num_batches=2,
                       loader_to_device=lambda b: b)
    v8 = compute_amax(v8, method="max")
    q = _eval(cfg, dataset, loader, model, v8, rules=rules)
    rel_drop = (fp["NDS"] - q["NDS"]) / max(fp["NDS"], 1e-9)
    assert rel_drop <= 0.01, (fp["NDS"], q["NDS"], rel_drop)


def test_dynamic_sq_nds_drop_small(trained):
    """Reference default mode: dynamic SmoothQuant fake-quant
    (quant_centerpoint.py:255-264, w8a8 alpha=0.5)."""
    from q3d_tpu.quant.api import centerpoint_recipe, quantize_model
    cfg, dataset, loader, model, variables, batch = trained
    fp = _eval(cfg, dataset, loader, model, variables)
    rules = centerpoint_recipe(sq=True, alpha=0.5, static=False)
    vq = quantize_model(model, variables, rules, batch)
    q = _eval(cfg, dataset, loader, model, vq, rules=rules)
    rel_drop = (fp["NDS"] - q["NDS"]) / max(fp["NDS"], 1e-9)
    assert rel_drop <= 0.02, (fp["NDS"], q["NDS"], rel_drop)


def test_static_entropy_nds_drop_small(trained):
    """Static PTQ with entropy amax (reference quantize.py:175-207)."""
    from q3d_tpu.quant.api import (centerpoint_recipe, quantize_model,
                                   collect_stats, compute_amax)
    cfg, dataset, loader, model, variables, batch = trained
    fp = _eval(cfg, dataset, loader, model, variables)
    rules = centerpoint_recipe(sq=False, static=True)
    vq = quantize_model(model, variables, rules, batch)
    vq = collect_stats(model, vq, rules, [batch] * 3, num_batches=3,
                       loader_to_device=lambda b: b)
    vq = compute_amax(vq, method="entropy")
    q = _eval(cfg, dataset, loader, model, vq, rules=rules)
    rel_drop = (fp["NDS"] - q["NDS"]) / max(fp["NDS"], 1e-9)
    assert rel_drop <= 0.03, (fp["NDS"], q["NDS"], rel_drop)
