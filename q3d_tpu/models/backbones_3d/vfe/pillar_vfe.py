"""PillarVFE — PointPillars feature net (reference vfe/pillar_vfe.py:8-123).

Per-pillar features [xyz(i), cluster offset, center offset(, dist)] -> masked
PFN layers (Linear -> BN -> ReLU -> max over points).  Matches the reference's
exact masking semantics: padded point slots are zeroed BEFORE the linear layer
and still participate in BN + max afterwards (checkpoint-parity requirement).

TPU notes: the big (B·V·P, C_in)×(C_in, C_out) linear is exactly an MXU GEMM;
the reference's 50k-row chunking workaround (pillar_vfe.py:29-35) is
unnecessary under XLA and intentionally absent.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...layers import Linear, BatchNorm, relu


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, P, C)
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = Linear(out_ch, use_bias=not self.use_norm, name="linear")(x)
        if self.use_norm:
            n, p, c = x.shape
            x = BatchNorm(name="norm")(x.reshape(n * p, c), train).reshape(n, p, c)
        x = relu(x)
        x_max = jnp.max(x, axis=1, keepdims=True)
        if self.last_layer:
            return x_max
        return jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=2)


class PillarVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]

    def get_output_feature_dim(self):
        return list(self.model_cfg.NUM_FILTERS)[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        voxels = batch_dict["voxels"]                   # (B, V, P, C)
        num_points = batch_dict["voxel_num_points"]     # (B, V)
        coords = batch_dict["voxel_coords"]             # (B, V, 3) [z, y, x]
        B, V, P, C = voxels.shape
        vf = voxels.reshape(B * V, P, C)
        npts = num_points.reshape(B * V).astype(vf.dtype)
        czyx = coords.reshape(B * V, 3).astype(vf.dtype)

        points_mean = vf[:, :, :3].sum(axis=1, keepdims=True) \
            / jnp.clip(npts, 1.0, None)[:, None, None]
        f_cluster = vf[:, :, :3] - points_mean

        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]
        f_center = jnp.stack([
            vf[:, :, 0] - (czyx[:, 2][:, None] * vx + x_off),
            vf[:, :, 1] - (czyx[:, 1][:, None] * vy + y_off),
            vf[:, :, 2] - (czyx[:, 0][:, None] * vz + z_off),
        ], axis=-1)

        if self.model_cfg.USE_ABSLOTE_XYZ:
            feats = [vf, f_cluster, f_center]
        else:
            feats = [vf[..., 3:], f_cluster, f_center]
        if self.model_cfg.WITH_DISTANCE:
            feats.append(jnp.linalg.norm(vf[:, :, :3], axis=2, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        mask = (jnp.arange(P)[None, :] < npts[:, None]).astype(features.dtype)
        features = features * mask[..., None]

        num_filters = list(self.model_cfg.NUM_FILTERS)
        for i, out_ch in enumerate(num_filters):
            features = PFNLayer(out_ch, self.model_cfg.USE_NORM,
                                last_layer=(i == len(num_filters) - 1),
                                name=f"pfn_layers_{i}")(features, train)
        batch_dict["pillar_features"] = features.reshape(B, V, -1)  # (B, V, F)
        return batch_dict
