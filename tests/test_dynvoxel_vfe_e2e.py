"""DynamicVoxelVFE: coords oracle + CenterPoint e2e integration.

Reference parity target: ``pcdet/models/backbones_3d/vfe/dynamic_voxel_vfe.py``
(torch_scatter scatter-mean/max over dynamic voxel keys).
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device

CFG = (Path(__file__).resolve().parents[1]
       / "tools/cfgs/synthetic_models/centerpoint_dynvoxel_tiny.yaml")


def _build(batch_size=2):
    cfg = cfg_from_yaml_file(str(CFG), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    return cfg, dataset, loader, model


@pytest.mark.fast
def test_dynamic_voxel_vfe_coords_match_numpy_oracle():
    cfg, dataset, loader, model = _build()
    raw = next(iter(loader))
    batch = load_data_to_device(raw)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    # run just the VFE
    out = model.apply(variables, dict(batch),
                      method=lambda m, b: m.vfe(b, False))
    coords = np.asarray(out["voxel_coords"])        # (B, V, 3) [z, y, x]
    feats = np.asarray(out["voxel_features"])

    pc_min = np.asarray(dataset.point_cloud_range[:3])
    vsz = np.asarray(dataset.voxel_size)
    gsz = np.asarray([int(g) for g in dataset.grid_size])
    for b in range(coords.shape[0]):
        pts = np.asarray(raw["points"][b])
        m = np.asarray(raw["points_mask"][b]).astype(bool)
        c = np.floor((pts[m, :3] - pc_min) / vsz).astype(np.int64)
        ok = ((c >= 0) & (c < gsz)).all(axis=1)
        expected = {tuple(r) for r in c[ok][:, ::-1]}   # -> (z, y, x)
        got_valid = coords[b][coords[b][:, 0] >= 0]
        got = {tuple(r) for r in got_valid}
        assert got == expected
        # padded rows carry zero features
        pad = coords[b][:, 0] < 0
        assert np.all(feats[b][pad] == 0.0)
    assert np.isfinite(feats).all()


def test_dynamic_voxel_vfe_centerpoint_e2e():
    cfg, dataset, loader, model = _build()
    raw = next(iter(loader))
    batch = load_data_to_device(raw)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    out = model.apply(variables, batch, train=False)
    assert out["final_boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["final_boxes"])).all()


def test_masked_batchnorm_excludes_padded_rows():
    """ADVICE r3: train-mode BN statistics must exclude padded rows.
    MaskedBatchNorm on [real; garbage-masked] rows == BatchNorm on the
    real rows alone (params AND running stats), and the variable tree is
    interchangeable with BatchNorm's."""
    import jax
    import jax.numpy as jnp
    from q3d_tpu.models.layers import BatchNorm, MaskedBatchNorm

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(20, 8).astype(np.float32))
    junk = jnp.asarray(1e3 * rng.randn(12, 8).astype(np.float32))
    x = jnp.concatenate([real, junk])
    mask = jnp.concatenate([jnp.ones(20, bool), jnp.zeros(12, bool)])

    mbn = MaskedBatchNorm()
    vars_m = mbn.init(jax.random.PRNGKey(0), x, mask, train=True)
    bn = BatchNorm()
    vars_b = bn.init(jax.random.PRNGKey(0), real, train=True)
    # identical variable tree (checkpoint-interchangeable)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, vars_m, vars_b))

    y_m, mut_m = mbn.apply(vars_m, x, mask, train=True,
                           mutable=["batch_stats"])
    y_b, mut_b = bn.apply(vars_b, real, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_m[:20]), np.asarray(y_b),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut_m["batch_stats"]["bn"]["mean"]),
        np.asarray(mut_b["batch_stats"]["bn"]["mean"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut_m["batch_stats"]["bn"]["var"]),
        np.asarray(mut_b["batch_stats"]["bn"]["var"]), rtol=1e-3, atol=1e-4)

    # eval mode uses running stats and ignores the mask entirely
    y_e = mbn.apply(mut_m | {"params": vars_m["params"]}, x, None,
                    train=False)
    assert np.isfinite(np.asarray(y_e)).all()
