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


def test_focal_use_img_gather_oracle():
    """Oracle for the use_img gating input (reference
    focal_sparse_conv.py:51-117): voxel centers project with K @ (T @ p),
    integer-truncated pixels gather the feature map, out-of-image voxels
    get exactly zero."""
    from q3d_tpu.models.backbones_3d.spconv_backbone_focal import \
        gather_image_features

    rng = np.random.RandomState(5)
    B, h, w, C = 2, 8, 12, 4
    feats = rng.randn(B, h, w, C).astype(np.float32)
    N = 32
    centers = rng.uniform(-5, 30, (N, 3)).astype(np.float32)
    bidx = rng.randint(0, B, N).astype(np.int32)
    valid = np.ones(N, bool)
    valid[-3:] = False
    # KITTI-ish lidar->cam + intrinsics (focal 8, center h/2, w/2)
    T = np.array([[0., -1., 0., 0.], [0., 0., -1., 0.],
                  [1., 0., 0., 0.], [0., 0., 0., 1.]], np.float32)
    l2c = np.broadcast_to(T, (B, 4, 4)).copy()
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 8.0
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    K[:, 2, 2] = 1.0

    got = np.asarray(gather_image_features(
        jnp.asarray(feats), jnp.asarray(centers), jnp.asarray(bidx),
        jnp.asarray(valid), jnp.asarray(l2c), jnp.asarray(K)))

    for i in range(N):
        p = T @ np.array([*centers[i], 1.0], np.float32)
        cam = p[:3]
        uvw = K[bidx[i]] @ cam
        z = max(uvw[2], 1e-3)
        u, v = int(uvw[0] / z), int(uvw[1] / z)   # trunc like .long()
        if valid[i] and cam[2] > 0 and 0 <= u < w and 0 <= v < h:
            np.testing.assert_allclose(got[i], feats[bidx[i], v, u],
                                       rtol=1e-6)
        else:
            np.testing.assert_array_equal(got[i], np.zeros(C, np.float32))


def test_focal_use_img_e2e(setup):
    """Focal backbone with USE_IMG runs end-to-end (importance gate fed by
    concat[image, voxel] features) and trains with the multimodal imp loss
    (reference spconv_backbone_focal.py:128-150,235-237)."""
    cfg, dataset, loader, model, variables = setup
    cfg2 = cfg_from_yaml_file(str(CFG_PATH), EDict())
    cfg2.MODEL.BACKBONE_3D.NAME = "VoxelBackBone8xFocal"
    cfg2.MODEL.BACKBONE_3D.USE_IMG = True
    from q3d_tpu.models import build_network as bn
    m2 = bn(cfg2.MODEL, num_class=len(cfg2.CLASS_NAMES), dataset=dataset)
    raw = next(iter(loader))
    rng = np.random.RandomState(0)
    H = W = 32
    raw["camera_imgs"] = rng.rand(2, H, W, 3).astype(np.float32)
    intr = np.zeros((2, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 20.0
    intr[:, 0, 2] = W / 2
    intr[:, 1, 2] = H / 2
    intr[:, 2, 2] = 1.0
    raw["camera_intrinsics"] = intr
    batch = load_data_to_device(raw)
    v2 = jax.jit(lambda k, b: m2.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)
    # the multimodal focal conv must exist in the param tree
    assert "conv_focal_multimodal" in v2["params"]["backbone_3d"]
    out = m2.apply(v2, batch, train=False)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()
    out_t, _ = m2.apply(v2, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out_t["loss"]))
