"""DynamicMeanVFE — scatter-mean of raw points into voxels on device.

Parity with reference ``vfe/dynamic_mean_vfe.py`` (torch_scatter
``scatter_mean`` over voxel keys); here sort + segment-sum in pure XLA with a
fixed voxel capacity, producing the same (voxel_features, voxel_coords)
contract as MeanVFE so downstream sparse backbones are agnostic to which VFE
ran.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _dynamic_mean_one(points, valid, voxel_size, pc_range, grid_size, max_voxels):
    pc_min = jnp.asarray(pc_range[0:3], jnp.float32)
    vsz = jnp.asarray(voxel_size, jnp.float32)
    gsz = jnp.asarray(grid_size, jnp.int32)
    coords = jnp.floor((points[:, 0:3] - pc_min) / vsz).astype(jnp.int32)
    ok = ((coords >= 0) & (coords < gsz)).all(axis=1) & valid
    key = ((coords[:, 2] * gsz[1] + coords[:, 1]) * gsz[0] + coords[:, 0])
    BIG = jnp.int32(2 ** 30)
    key = jnp.where(ok, key, BIG)
    order = jnp.argsort(key)
    key_s, pts_s, coords_s = key[order], points[order], coords[order]
    new_seg = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
    new_seg = new_seg & (key_s != BIG)
    vid = jnp.where(key_s == BIG, max_voxels,
                    jnp.minimum(jnp.cumsum(new_seg) - 1, max_voxels))
    fsum = jnp.zeros((max_voxels + 1, points.shape[1]), jnp.float32).at[vid].add(pts_s)
    cnt = jnp.zeros(max_voxels + 1, jnp.int32).at[vid].add(1)
    feats = fsum[:max_voxels] / jnp.clip(cnt[:max_voxels, None].astype(jnp.float32), 1, None)
    out_coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    out_coords = out_coords.at[jnp.where(new_seg, vid, max_voxels)].set(
        coords_s[:, ::-1])[:max_voxels]
    count = jnp.where(out_coords[:, 0] >= 0, cnt[:max_voxels], 0)
    return feats * (count[:, None] > 0), out_coords, count


class DynamicMeanVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    grid_size: Tuple[int, int, int]
    max_voxels: int = 60000

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]          # (B, N, C)
        mask = batch_dict["points_mask"]       # (B, N)
        feats, coords, counts = jax.vmap(
            lambda p, m: _dynamic_mean_one(p, m, self.voxel_size,
                                           self.point_cloud_range,
                                           self.grid_size, self.max_voxels)
        )(points, mask)
        batch_dict["voxel_features"] = feats
        batch_dict["voxel_coords"] = coords
        batch_dict["voxel_num_points"] = counts
        return batch_dict
