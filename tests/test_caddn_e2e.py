"""End-to-end integration test: tiny CaDDN (monocular camera detector)."""

from pathlib import Path

import jax
import numpy as np

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/caddn_tiny.yaml"


def test_caddn_inference():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    rng = np.random.RandomState(0)
    H = W = 64
    raw["camera_imgs"] = rng.rand(2, H, W, 3).astype(np.float32)
    intr = np.zeros((2, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 40.0
    intr[:, 0, 2] = W / 2
    intr[:, 1, 2] = H / 2
    intr[:, 2, 2] = 1.0
    raw["camera_intrinsics"] = intr
    batch = load_data_to_device(raw)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    assert out["final_boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["final_boxes"])).all()
