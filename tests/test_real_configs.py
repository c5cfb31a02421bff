"""Build-validate every real-data model config (reference
tools/cfgs/{kitti,nuscenes,waymo,once,lyft}_models): the network must
construct from the cfg and its full forward must trace at the dataset's
true grid geometry (jax.eval_shape — catches wiring/shape errors without
paying a CPU compile of a waymo-sized BEV pyramid)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.models import build_network
from q3d_tpu.models.detectors.detector3d_template import DatasetInfo

ROOT = Path(__file__).resolve().parent.parent
CFG_DIR = ROOT / "tools/cfgs"

REAL_CFGS = sorted(
    str(p.relative_to(CFG_DIR))
    for fam in ("kitti_models", "nuscenes_models", "waymo_models",
                "once_models", "lyft_models")
    for p in (CFG_DIR / fam).glob("*.yaml"))


def _dataset_info(cfg):
    dc = cfg.DATA_CONFIG
    pcr = np.asarray(dc.POINT_CLOUD_RANGE, np.float64)
    vs = None
    for step in dc.DATA_PROCESSOR:
        if step.NAME == "transform_points_to_voxels":
            vs = np.asarray(step.VOXEL_SIZE, np.float64)
    assert vs is not None
    grid = np.round((pcr[3:6] - pcr[0:3]) / vs).astype(int)
    nfeat = len(dc.POINT_FEATURE_ENCODING.used_feature_list)
    return DatasetInfo(
        class_names=tuple(cfg.CLASS_NAMES),
        num_point_features=nfeat,
        grid_size=tuple(int(g) for g in grid),
        point_cloud_range=tuple(float(v) for v in pcr),
        voxel_size=tuple(float(v) for v in vs)), nfeat


@pytest.mark.parametrize("rel", REAL_CFGS)
def test_real_config_builds_and_traces(rel):
    cfg = cfg_from_yaml_file(str(CFG_DIR / rel), EDict())
    info, nfeat = _dataset_info(cfg)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=info)

    B, V, P = 1, 512, 5
    rng = np.random.RandomState(0)
    nz, ny, nx = info.grid_size[2], info.grid_size[1], info.grid_size[0]
    coords = np.stack([rng.randint(0, nz, (B, V)),
                       rng.randint(0, ny, (B, V)),
                       rng.randint(0, nx, (B, V))], axis=-1)
    batch = {
        "voxels": jnp.asarray(rng.randn(B, V, P, nfeat), jnp.float32),
        "voxel_coords": jnp.asarray(coords, jnp.int32),
        "voxel_num_points": jnp.full((B, V), P, jnp.int32),
        "batch_size": B,
    }
    shapes = jax.eval_shape(
        lambda k, b: model.init(k, b, train=False), jax.random.PRNGKey(0),
        batch)
    assert "params" in shapes
