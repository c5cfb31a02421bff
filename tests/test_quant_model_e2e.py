"""PTQ workflows end-to-end on the tiny CenterPoint: dynamic SmoothQuant,
static calibration (entropy amax), and true-int8 deploy."""

from pathlib import Path

import jax
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.quant import api as quant_api
from q3d_tpu.quant.rules import quant_rules_scope

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
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    fp_out = model.apply(variables, batch, train=False)
    return cfg, model, variables, batch, loader, fp_out


def test_dynamic_smoothquant_close_to_fp(setup):
    cfg, model, variables, batch, loader, fp_out = setup
    rules = quant_api.centerpoint_recipe(sq=True, alpha=0.5)
    with quant_rules_scope(rules):
        q_out = model.apply(variables, batch, train=False)
    fp = np.asarray(fp_out["final_scores"])
    q = np.asarray(q_out["final_scores"])
    assert np.isfinite(q).all()
    # scores of an untrained model are near-uniform; W8A8 must stay close
    assert np.abs(fp - q).mean() < 0.05


def test_static_calibration_on_model(setup):
    cfg, model, variables, batch, loader, fp_out = setup
    rules = quant_api.centerpoint_recipe(sq=False, static=True)
    qvars = quant_api.quantize_model(model, variables, rules, batch)
    assert "quant" in qvars
    qvars = quant_api.collect_stats(model, qvars, rules, iter(loader),
                                    num_batches=2)
    qvars = quant_api.compute_amax(qvars, method="percentile", percentile=99.9)
    amax_leaves = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(qvars["quant"])]
    assert any(a.max() > 0 for a in amax_leaves)
    with quant_rules_scope(rules):
        q_out = model.apply(
            {k: qvars[k] for k in ("params", "batch_stats", "quant")},
            batch, train=False)
    assert np.isfinite(np.asarray(q_out["final_scores"])).all()


def test_int8_deploy_on_model(setup):
    cfg, model, variables, batch, loader, fp_out = setup
    rules = quant_api.int8_deploy_recipe()
    with quant_rules_scope(rules):
        q_out = model.apply(variables, batch, train=False)
    q = np.asarray(q_out["final_scores"])
    fp = np.asarray(fp_out["final_scores"])
    assert np.isfinite(q).all()
    assert np.abs(fp - q).mean() < 0.05


def test_int8_residency_deploy(setup):
    """Static int8-residency deployment: calibrate, fold amax, run with
    features staying int8 across the sparse backbone (BN/ReLU/requant in
    the conv epilogues).  Must track the FP model as closely as the plain
    per-layer int8 path does."""
    cfg, model, variables, batch, loader, fp_out = setup
    rules = quant_api.int8_deploy_recipe(residency=True)
    qvars = quant_api.quantize_model(model, variables, rules, batch)
    qvars = quant_api.collect_stats(model, qvars, rules, iter(loader),
                                    num_batches=2)
    qvars = quant_api.compute_amax(qvars, method="max")
    with quant_rules_scope(rules):
        q_out = model.apply(
            {k: qvars[k] for k in qvars if k != "calib"}, batch, train=False)
    q = np.asarray(q_out["final_scores"])
    fp = np.asarray(fp_out["final_scores"])
    assert np.isfinite(q).all()
    assert np.abs(fp - q).mean() < 0.05
