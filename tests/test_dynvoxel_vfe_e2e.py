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
