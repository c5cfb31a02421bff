"""PointNet2MSG — multi-scale-grouping PointNet++ encoder/decoder on raw
points.

Parity with reference ``backbones_3d/pointnet2_backbone.py:9`` (PointNet2MSG):
SA stages (FPS downsample + MSG ball-query grouping + shared MLP + max-pool)
followed by FP stages (three_nn inverse-distance upsampling) back to the full
point set; emits per-point features for PointHeadBox / PointRCNN.

Built entirely from the static-shape primitives in
``q3d_tpu/ops/pointnet2_utils.py``.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2_utils import (farthest_point_sample, ball_query,
                                    group_points, three_nn, three_interpolate,
                                    index_points)
from ..layers import Linear, BatchNorm, relu


class _GroupMLP(nn.Module):
    mlps: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, mask, train=False):
        # x: (B, M, S, C); mask: (B, M, S)
        for i, c in enumerate(self.mlps):
            B, M, S, C = x.shape
            x = Linear(c, use_bias=False, name=f"mlp{i}")(x)
            x = BatchNorm(name=f"norm{i}")(
                x.reshape(B * M * S, c), train).reshape(B, M, S, c)
            x = relu(x)
        x = jnp.where(mask[..., None], x, -jnp.inf)
        x = x.max(axis=2)
        return jnp.where(jnp.isfinite(x), x, 0.0)


class PointNet2MSG(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int] = (1, 1, 1)
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    point_cloud_range: Tuple[float, ...] = ()

    @property
    def num_point_features(self):
        return int(self.model_cfg.FP_MLPS[0][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        points = batch_dict["points"]                 # (B, N, C)
        mask = batch_dict["points_mask"]
        B, N, _ = points.shape
        xyz = points[:, :, :3]
        feats = points[:, :, 3:]

        sa_cfg = cfg.SA_CONFIG
        xyz_list, feat_list, mask_list = [xyz], [feats], [mask]
        for si in range(len(sa_cfg.NPOINTS)):
            npoint = int(sa_cfg.NPOINTS[si])
            idx = farthest_point_sample(xyz_list[-1], npoint,
                                        valid=mask_list[-1])
            new_xyz = index_points(xyz_list[-1], idx)
            new_mask = index_points(
                mask_list[-1][..., None], idx)[..., 0]
            grouped_feats = []
            for gi, (radius, nsample, mlps) in enumerate(zip(
                    sa_cfg.RADIUS[si], sa_cfg.NSAMPLE[si], sa_cfg.MLPS[si])):
                gidx, in_mask = ball_query(float(radius), int(nsample),
                                           xyz_list[-1], new_xyz,
                                           mask_list[-1])
                g_xyz = group_points(xyz_list[-1], gidx) \
                    - new_xyz[:, :, None, :]
                g = jnp.concatenate(
                    [g_xyz, group_points(feat_list[-1], gidx)], -1) \
                    if feat_list[-1].shape[-1] else g_xyz
                grouped_feats.append(_GroupMLP(
                    tuple(mlps), name=f"sa{si}_g{gi}")(g, in_mask, train))
            xyz_list.append(new_xyz)
            feat_list.append(jnp.concatenate(grouped_feats, -1))
            mask_list.append(new_mask)

        # FP decoder: deepest -> shallowest
        fp_mlps = list(cfg.FP_MLPS)
        cur_feats = feat_list[-1]
        for fi in range(len(fp_mlps) - 1, -1, -1):
            unknown = xyz_list[fi]
            known = xyz_list[fi + 1]
            dist, nn_idx = three_nn(unknown, known,
                                    known_valid=mask_list[fi + 1])
            interp = three_interpolate(cur_feats, nn_idx, dist)
            skip = feat_list[fi]
            x = jnp.concatenate([interp, skip], -1) if skip.shape[-1] \
                else interp
            for mi, c in enumerate(fp_mlps[fi]):
                Bx, Nx, Cx = x.shape
                x = Linear(c, use_bias=False, name=f"fp{fi}_mlp{mi}")(x)
                x = BatchNorm(name=f"fp{fi}_norm{mi}")(
                    x.reshape(Bx * Nx, c), train).reshape(Bx, Nx, c)
                x = relu(x)
            cur_feats = x

        b_col = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, N, 1))
        b_col = jnp.where(mask[..., None], b_col, -1)
        batch_dict["point_features"] = cur_feats.reshape(B * N, -1)
        batch_dict["point_coords"] = jnp.concatenate(
            [b_col.astype(jnp.float32), xyz], -1).reshape(B * N, 4)
        batch_dict["point_xyz_batched"] = xyz
        return batch_dict
