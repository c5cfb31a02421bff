"""MeanVFE — mean of points per voxel (reference vfe/mean_vfe.py:14-31)."""

import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        voxels = batch_dict["voxels"]              # (B, V, P, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        P = voxels.shape[2]
        mask = (jnp.arange(P)[None, None, :] < num_points[..., None])
        summed = (voxels * mask[..., None]).sum(axis=2)
        denom = jnp.clip(num_points[..., None].astype(voxels.dtype), 1.0, None)
        batch_dict["voxel_features"] = summed / denom   # (B, V, C)
        return batch_dict
