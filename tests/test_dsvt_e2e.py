"""End-to-end integration test: tiny DSVT (window attention) pipeline."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/dsvt_tiny.yaml"


def test_dsvt_inference():
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
    assert np.isfinite(np.asarray(out["final_boxes"])).all()


def test_window_partition_and_sets():
    from q3d_tpu.models.backbones_3d.dsvt import window_partition, build_sets
    coords = jnp.asarray(np.array(
        [[0, 0, 0], [0, 0, 1], [0, 11, 11], [0, 12, 12], [1, 0, 0],
         [-1, -1, -1]], np.int32))
    valid = coords[:, 0] >= 0
    win, inner = window_partition(coords, (24, 24), (12, 12), 0, valid)
    w = np.asarray(win)
    assert w[0] == w[1] == w[2]          # same 12x12 window
    assert w[3] != w[0]                  # next window
    assert w[4] != w[0]                  # different batch
    assert w[5] == -1                    # invalid
    gather, mask = build_sets(win, valid, set_size=4, num_sets_cap=8)
    g = np.asarray(gather)
    m = np.asarray(mask)
    # every valid voxel appears exactly once
    flat = g[m]
    assert sorted(flat.tolist()) == [0, 1, 2, 3, 4]
