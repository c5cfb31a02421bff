"""DynamicVoxelVFE — learned per-point features pooled into 3D voxels.

Parity with reference ``vfe/dynamic_voxel_vfe.py`` (106 LoC,
torch_scatter): per-point features [xyz(+i), cluster offset from the
voxel's point mean, center offset from the voxel center] -> PFNLayerV2
stack (linear+BN+ReLU, segment-MAX pooled) -> one feature row per occupied
voxel.  The last PFN layer's segment max IS the voxel feature (reference
``PFNLayerV2.forward`` with ``last_layer=True``).

TPU design: fixed voxel capacity + sort/segment ops per batch element
(static shapes for XLA), emitting the (B, V, C) ``voxel_features`` /
(B, V, 3) [z, y, x] ``voxel_coords`` contract shared with MeanVFE so the
sparse backbones are agnostic to which VFE ran.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import Linear, MaskedBatchNorm, relu


class DynamicVoxelVFE(nn.Module):
    model_cfg: Any
    num_point_features: int
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    grid_size: Tuple[int, int, int]
    max_voxels: int = 60000

    def get_output_feature_dim(self):
        return list(self.model_cfg.NUM_FILTERS)[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]            # (B, N, C)
        pmask = batch_dict["points_mask"]        # (B, N)
        B, N, C = points.shape
        V = self.max_voxels
        pc_min = jnp.asarray(self.point_cloud_range[0:3], jnp.float32)
        vsz = jnp.asarray(self.voxel_size, jnp.float32)
        gsz = jnp.asarray([int(g) for g in self.grid_size], jnp.int32)

        def prep_one(pts, valid):
            """Per-sample segment layout: sorted points, voxel ids, coords."""
            coords = jnp.floor((pts[:, 0:3] - pc_min) / vsz).astype(jnp.int32)
            ok = ((coords >= 0) & (coords < gsz)).all(axis=1) & valid
            key = ((coords[:, 2] * gsz[1] + coords[:, 1]) * gsz[0]
                   + coords[:, 0])
            BIG = jnp.int32(2 ** 30)
            key = jnp.where(ok, key, BIG)
            order = jnp.argsort(key)
            key_s, pts_s, coords_s = key[order], pts[order], coords[order]
            new_seg = jnp.concatenate(
                [jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
            new_seg = new_seg & (key_s != BIG)
            vid = jnp.where(key_s == BIG, V,
                            jnp.minimum(jnp.cumsum(new_seg) - 1, V))
            # voxel point-mean for cluster offsets
            fsum = jnp.zeros((V + 1, 3), jnp.float32).at[vid].add(pts_s[:, :3])
            cnt = jnp.zeros(V + 1, jnp.int32).at[vid].add(1)
            vmean = fsum / jnp.clip(cnt[:, None].astype(jnp.float32), 1, None)
            f_cluster = pts_s[:, :3] - vmean[vid]
            f_center = pts_s[:, :3] - (
                coords_s.astype(jnp.float32) * vsz + pc_min + vsz / 2)
            out_coords = jnp.full((V + 1, 3), -1, jnp.int32)
            out_coords = out_coords.at[jnp.where(new_seg, vid, V)].set(
                coords_s[:, ::-1])[:V]                      # [z, y, x]
            count = jnp.where(out_coords[:, 0] >= 0, cnt[:V], 0)
            return pts_s, f_cluster, f_center, vid, out_coords, count

        pts_s, f_cluster, f_center, vid, out_coords, counts = jax.vmap(
            prep_one)(points, pmask)

        feats = [pts_s, f_cluster, f_center] \
            if self.model_cfg.get("USE_ABSLOTE_XYZ", True) \
            else [pts_s[:, :, 3:], f_cluster, f_center]
        if self.model_cfg.get("WITH_DISTANCE", False):
            feats.append(jnp.linalg.norm(pts_s[:, :, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = x * (vid < V)[..., None]

        num_filters = list(self.model_cfg.NUM_FILTERS)
        for i, out_ch in enumerate(num_filters):
            # PFNLayerV2: linear -> BN -> ReLU on points; non-last layers
            # concat the segment max back onto each point
            x = Linear(out_ch, use_bias=False, name=f"pfn_linear_{i}")(
                x.reshape(B * N, -1)).reshape(B, N, out_ch)
            # masked BN: padded / out-of-range rows (vid == V) are
            # excluded from the batch statistics (the reference computes
            # stats on the compacted point list — ADVICE r3)
            x = MaskedBatchNorm(name=f"pfn_norm_{i}")(
                x.reshape(B * N, -1), (vid < V).reshape(B * N),
                train).reshape(B, N, out_ch)
            x = relu(x)

            def seg_max(xb, vb):
                m = jnp.full((V + 1, xb.shape[1]), -jnp.inf, xb.dtype)
                m = m.at[vb].max(xb)
                return jnp.where(jnp.isfinite(m), m, 0.0)

            pooled = jax.vmap(seg_max)(x, vid)              # (B, V+1, C)
            if i < len(num_filters) - 1:
                x = jnp.concatenate(
                    [x, jnp.take_along_axis(pooled, vid[..., None],
                                            axis=1)], axis=-1)
        voxel_feats = pooled[:, :V]
        voxel_feats = voxel_feats * (counts[..., None] > 0)

        batch_dict["voxel_features"] = voxel_feats
        batch_dict["voxel_coords"] = out_coords
        batch_dict["voxel_num_points"] = counts
        return batch_dict
