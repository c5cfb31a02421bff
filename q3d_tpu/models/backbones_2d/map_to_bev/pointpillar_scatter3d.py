"""PointPillarScatter3d — scatter flattened pillars into a (possibly
multi-z) dense BEV canvas (reference ``map_to_bev/pointpillar_scatter.py``
PointPillarScatter3d variant; used by DSVT/PillarNet pipelines)."""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PointPillarScatter3d(nn.Module):
    model_cfg: Any
    grid_size: Tuple[int, int, int]

    @property
    def num_bev_features(self):
        return int(self.model_cfg.NUM_BEV_FEATURES)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["pillar_features"]          # (P, C) flattened
        coords = batch_dict["pillar_coords"]           # (P, 3) [b, y, x]
        B = int(batch_dict.get("pillar_batch_size",
                               batch_dict["points"].shape[0]))
        nx, ny, nz = (int(g) for g in self.grid_size)
        valid = coords[:, 0] >= 0
        flat = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
        flat = jnp.where(valid, flat, B * ny * nx).astype(jnp.int32)
        canvas = jnp.zeros((B * ny * nx + 1, feats.shape[1]), feats.dtype)
        canvas = canvas.at[flat].set(feats)[:-1]
        batch_dict["spatial_features"] = canvas.reshape(B, ny, nx, -1)
        batch_dict["spatial_features_stride"] = 1
        return batch_dict
