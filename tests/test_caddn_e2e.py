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


def test_depth_bin_index_modes():
    """UD/LID/SID bin formulas (reference transform_utils.py:56 bin_depths).

    LID closed form: depth at bin-i lower edge d_min + bin_size/2*i*(i+1)
    maps exactly back to index i."""
    import jax.numpy as jnp
    from q3d_tpu.models.backbones_3d.vfe.image_vfe import depth_bin_index

    d_min, d_max, nb = 2.0, 46.8, 80
    # UD: uniform spacing
    ud = depth_bin_index(jnp.asarray([d_min, (d_min + d_max) / 2, d_max]),
                         "UD", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(ud), [0.0, nb / 2, nb], atol=1e-4)
    # LID: quadratic edge positions round-trip to integer indices
    bin_size = 2.0 * (d_max - d_min) / (nb * (1 + nb))
    idx = np.asarray([0, 1, 5, 40, 79], np.float64)
    edges = d_min + bin_size / 2.0 * idx * (idx + 1.0)
    lid = depth_bin_index(jnp.asarray(edges), "LID", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(lid), idx, atol=1e-3)
    # LID bins widen with depth => indices grow sub-linearly vs UD
    mid = depth_bin_index(jnp.asarray([(d_min + d_max) / 2]),
                          "LID", d_min, d_max, nb)
    assert float(mid[0]) > nb / 2          # early bins are narrower
    # SID endpoints
    sid = depth_bin_index(jnp.asarray([d_min, d_max]), "SID", d_min, d_max, nb)
    np.testing.assert_allclose(np.asarray(sid), [0.0, nb], atol=1e-3)
