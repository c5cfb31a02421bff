"""Mesh data parallelism on the virtual-CPU device grid: sharded inference
matches single-device results; sharded training step runs."""

from pathlib import Path

import jax
import numpy as np
import optax
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.parallel import (make_mesh, shard_batch, replicate,
                              make_train_step, make_eval_step, merge_results)

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/pointpillar_tiny.yaml"


@pytest.fixture(scope="module")
def built():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    batch = load_data_to_device(raw)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    return cfg, model, variables, raw


def test_sharded_eval_matches_single_device(built):
    cfg, model, variables, raw = built
    assert len(jax.devices()) >= 4, "conftest should provide 8 CPU devices"
    step = make_eval_step(model)
    single = step(variables, load_data_to_device(raw))

    mesh = make_mesh(4)
    sharded_batch = shard_batch(
        {k: v for k, v in raw.items()
         if k in ("voxels", "voxel_coords", "voxel_num_points", "gt_boxes")},
        mesh)
    sharded_batch["batch_size"] = raw["batch_size"]
    repl_vars = replicate(variables, mesh)
    sharded = step(repl_vars, sharded_batch)
    np.testing.assert_allclose(np.asarray(single["final_scores"]),
                               np.asarray(sharded["final_scores"]),
                               atol=1e-4, rtol=1e-3)


def test_sharded_train_step(built):
    cfg, model, variables, raw = built
    mesh = make_mesh(4)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx, mesh=mesh)
    batch = shard_batch(
        {k: v for k, v in raw.items()
         if k in ("voxels", "voxel_coords", "voxel_num_points", "gt_boxes")},
        mesh)
    batch["batch_size"] = raw["batch_size"]
    new_vars, opt_state, loss, tb = step(
        replicate(variables, mesh), replicate(opt_state, mesh), batch)
    assert np.isfinite(float(loss))


def test_merge_results_order():
    outs = [{"a": np.arange(4).reshape(2, 2)},
            {"a": np.arange(4, 8).reshape(2, 2)}]
    merged = merge_results(outs)
    np.testing.assert_array_equal(merged["a"],
                                  np.arange(8).reshape(4, 2))
