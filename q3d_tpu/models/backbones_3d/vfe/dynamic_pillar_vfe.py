"""DynamicPillarVFE — pillar features straight from raw points (no fixed
points-per-pillar cap).

Parity with reference ``vfe/dynamic_pillar_vfe.py`` (torch_scatter
scatter-mean/max): per-point features [xyz(i), cluster offset, center
offset] -> PFN linear+BN+ReLU per point -> segment-MAX into pillars.
Implemented as sort + segment ops over linearized pillar keys; outputs the
flattened (B*P, C) ``pillar_features`` + (B*P, 3) [b, y, x]
``pillar_coords`` contract the sparse-2D backbones consume.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import Linear, MaskedBatchNorm, relu


class DynamicPillarVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    grid_size: Tuple[int, int, int]
    max_pillars: int = 30000

    def get_output_feature_dim(self):
        return list(self.model_cfg.NUM_FILTERS)[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]            # (B, N, C)
        pmask = batch_dict["points_mask"]        # (B, N)
        B, N, C = points.shape
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        P = self.max_pillars

        pts = points.reshape(B * N, C)
        b_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
        cx = jnp.floor((pts[:, 0] - x0) / vx).astype(jnp.int32)
        cy = jnp.floor((pts[:, 1] - y0) / vy).astype(jnp.int32)
        ok = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
              & pmask.reshape(-1))
        key = (b_idx * ny + cy) * nx + cx
        BIG = jnp.int32(2 ** 30)
        key = jnp.where(ok, key, BIG)

        order = jnp.argsort(key)
        key_s = key[order]
        pts_s = pts[order]
        new_seg = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
        new_seg = new_seg & (key_s != BIG)
        pid = jnp.where(key_s == BIG, P, jnp.minimum(jnp.cumsum(new_seg) - 1, P))

        # pillar means for cluster offsets
        psum = jnp.zeros((P + 1, 3), jnp.float32).at[pid].add(pts_s[:, :3])
        pcnt = jnp.zeros(P + 1, jnp.int32).at[pid].add(1)
        pmean = psum / jnp.clip(pcnt[:, None].astype(jnp.float32), 1, None)
        f_cluster = pts_s[:, :3] - pmean[pid]

        cx_s = cx[order]
        cy_s = cy[order]
        f_center = jnp.stack([
            pts_s[:, 0] - (cx_s.astype(jnp.float32) * vx + x0 + vx / 2),
            pts_s[:, 1] - (cy_s.astype(jnp.float32) * vy + y0 + vy / 2),
        ], axis=1)
        feats = [pts_s, f_cluster, f_center] \
            if self.model_cfg.get("USE_ABSLOTE_XYZ", True) \
            else [pts_s[:, 3:], f_cluster, f_center]
        if self.model_cfg.get("WITH_DISTANCE", False):
            feats.append(jnp.linalg.norm(pts_s[:, :3], axis=1, keepdims=True))
        x = jnp.concatenate(feats, axis=1)
        x = x * (pid < P)[:, None]

        for i, out_ch in enumerate(self.model_cfg.NUM_FILTERS):
            x = Linear(out_ch, use_bias=False, name=f"pfn_linear_{i}")(x)
            # masked BN: exclude pid == P padded rows from batch stats
            x = MaskedBatchNorm(name=f"pfn_norm_{i}")(x, pid < P, train)
            x = relu(x)
        pooled = jnp.full((P + 1, x.shape[1]), -jnp.inf, x.dtype).at[pid].max(x)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)[:P]

        coords = jnp.full((P + 1, 3), -1, jnp.int32)
        byx = jnp.stack([b_idx[order], cy_s, cx_s], axis=1)
        coords = coords.at[jnp.where(new_seg, pid, P)].set(byx)[:P]
        batch_dict["pillar_features"] = pooled
        batch_dict["pillar_coords"] = coords
        batch_dict["pillar_batch_size"] = B          # static (from shape)
        return batch_dict
