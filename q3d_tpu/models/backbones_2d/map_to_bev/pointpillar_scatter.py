"""PointPillarScatter — scatter pillar features into a dense BEV canvas.

Parity with reference ``map_to_bev/pointpillar_scatter.py:14-38``.  The CUDA
scatter-into-zeros becomes one XLA scatter (``.at[...].set``) into an
(ny·nx + 1)-slot canvas whose last slot swallows padding pillars — static
shapes, no host sync.  Output is NHWC (B, ny, nx, C).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Tuple[int, int, int]   # [nx, ny, nz]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        pillar_features = batch_dict["pillar_features"]   # (B, V, C)
        coords = batch_dict["voxel_coords"]               # (B, V, 3) [z, y, x]
        nx, ny, nz = int(self.grid_size[0]), int(self.grid_size[1]), int(self.grid_size[2])
        assert nz == 1, "PointPillarScatter requires a single z bin"
        B, V, C = pillar_features.shape
        valid = coords[:, :, 0] >= 0
        flat_idx = coords[:, :, 1] * nx + coords[:, :, 2]  # y * nx + x
        flat_idx = jnp.where(valid, flat_idx, ny * nx).astype(jnp.int32)
        canvas = jnp.zeros((B, ny * nx + 1, C), pillar_features.dtype)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
        canvas = canvas.at[b_idx, flat_idx].set(pillar_features)
        canvas = canvas[:, :ny * nx].reshape(B, ny, nx, C)
        batch_dict["spatial_features"] = canvas
        batch_dict["spatial_features_stride"] = 1
        return batch_dict
