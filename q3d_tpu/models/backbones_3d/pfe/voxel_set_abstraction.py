"""VoxelSetAbstraction — keypoint feature extraction for PV-RCNN.

Parity with reference ``backbones_3d/pfe/voxel_set_abstraction.py`` (~450
LoC): FPS keypoints from raw points, PointNet++ set abstraction around each
keypoint over (a) raw points, (b) multi-scale sparse-conv voxel centers,
(c) bilinear BEV features; concatenated + fused to
``point_features``/``point_coords`` for the PV-RCNN head.

All gathers/queries are the static-shape pointnet2 ops
(``q3d_tpu/ops/pointnet2_utils.py``) — no stacked-batch CUDA kernels.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops.pointnet2_utils import ball_query, group_points, \
    farthest_point_sample
from ....utils import common_utils
from ...layers import Linear, BatchNorm, relu


class _SAMLPBlock(nn.Module):
    """Grouped-feature MLP + masked max-pool (one radius group)."""
    mlps: Tuple[int, ...]

    @nn.compact
    def __call__(self, grouped, in_mask, train=False):
        # grouped: (B, K, S, C); in_mask: (B, K, S)
        x = grouped
        for i, c in enumerate(self.mlps):
            B, K, S, C = x.shape
            x = Linear(c, use_bias=False, name=f"mlp{i}")(x)
            x = BatchNorm(name=f"norm{i}")(
                x.reshape(B * K * S, c), train).reshape(B, K, S, c)
            x = relu(x)
        x = jnp.where(in_mask[..., None], x, -jnp.inf)
        x = x.max(axis=2)
        return jnp.where(jnp.isfinite(x), x, 0.0)


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    num_bev_features: int = 256
    num_rawpoint_features: int = 4

    @property
    def num_point_features(self):
        return int(self.model_cfg.NUM_OUTPUT_FEATURES)

    def _sample_keypoints(self, points, mask, batch_dict):
        n_kp = int(self.model_cfg.NUM_KEYPOINTS)
        if (self.model_cfg.get("SAMPLE_METHOD", "FPS") == "SPC"
                and "rois" in batch_dict):
            from .vector_pool_aggregation import \
                sectorized_proposal_centric_sampling
            spc = self.model_cfg.SPC_SAMPLING
            roi_valid = batch_dict.get(
                "roi_valid", batch_dict.get(
                    "final_valid",
                    jnp.ones(batch_dict["rois"].shape[:2], bool)))
            return sectorized_proposal_centric_sampling(
                points[:, :, :3], mask, batch_dict["rois"][..., :7],
                roi_valid, n_kp, int(spc.NUM_SECTORS),
                float(spc.SAMPLE_RADIUS_WITH_ROI))
        idx = farthest_point_sample(points[:, :, :3], n_kp, valid=mask)
        return jax.vmap(lambda p, i: p[i])(points[:, :, :3], idx)  # (B, K, 3)

    def _neighbor_valid(self, sa, xyz, base_mask, batch_dict):
        """Optionally restrict neighbors to points near proposals
        (reference FILTER_NEIGHBOR_WITH_ROI)."""
        if not sa.get("FILTER_NEIGHBOR_WITH_ROI", False) \
                or "rois" not in batch_dict:
            return base_mask
        from .vector_pool_aggregation import points_near_rois
        roi_valid = batch_dict.get(
            "roi_valid", batch_dict.get(
                "final_valid", jnp.ones(batch_dict["rois"].shape[:2], bool)))
        near = points_near_rois(xyz, batch_dict["rois"][..., :7], roi_valid,
                                float(sa.RADIUS_OF_NEIGHBOR_WITH_ROI))
        has_roi = roi_valid.any(-1, keepdims=True)
        return base_mask & jnp.where(has_roi, near, True)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        points = batch_dict["points"]               # (B, N, C)
        pmask = batch_dict["points_mask"]
        B = points.shape[0]
        keypoints = self._sample_keypoints(points, pmask, batch_dict)

        feats = []
        sources = list(cfg.FEATURES_SOURCE)
        if "bev" in sources:
            bev = batch_dict["spatial_features"]               # (B, H, W, C)
            stride = batch_dict.get("spatial_features_stride", 8)
            xs = (keypoints[..., 0] - self.point_cloud_range[0]) \
                / self.voxel_size[0] / stride
            ys = (keypoints[..., 1] - self.point_cloud_range[1]) \
                / self.voxel_size[1] / stride
            feats.append(_bilinear(bev, xs, ys))               # (B, K, Cb)

        if "raw_points" in sources:
            sa = cfg.SA_LAYER["raw_points"]
            raw_feats = points[:, :, 3:]
            if sa.get("NAME", "") == "VectorPoolAggregationModuleMSG":
                from .vector_pool_aggregation import VectorPoolAggregationMSG
                vmask = self._neighbor_valid(sa, points[:, :, :3], pmask,
                                             batch_dict)
                feats.append(VectorPoolAggregationMSG(sa, name="vp_raw")(
                    points[:, :, :3], raw_feats, keypoints, vmask, train))
            else:
                grouped_list = []
                for radius, nsample, mlps in zip(sa["POOL_RADIUS"],
                                                 sa["NSAMPLE"], sa["MLPS"]):
                    idx, in_mask = ball_query(float(radius), int(nsample),
                                              points[:, :, :3], keypoints,
                                              pmask)
                    g_xyz = group_points(points[:, :, :3], idx) \
                        - keypoints[:, :, None, :]
                    g = jnp.concatenate(
                        [g_xyz, group_points(raw_feats, idx)], -1)
                    grouped_list.append(_SAMLPBlock(
                        tuple(mlps),
                        name=f"sa_raw_r{str(radius).replace('.','_')}")(
                        g, in_mask, train))
                feats.append(jnp.concatenate(grouped_list, axis=-1))

        ms = batch_dict.get("multi_scale_3d_features", {})
        for src in sources:
            if src not in ms:
                continue
            st = ms[src]
            stride = batch_dict["multi_scale_3d_strides"][src]
            centers = common_utils.get_voxel_centers(
                st.indices[:, 1:], stride, self.voxel_size,
                self.point_cloud_range)                        # (Nv, 3)
            v_b = st.indices[:, 0]
            sa = cfg.SA_LAYER[src]
            # split flattened voxels back per batch sample (static cap)
            cap = st.capacity // B
            xyz_b, feat_b, mask_b = _regroup(centers, st.features, v_b,
                                             st.valid, B, cap)
            if sa.get("NAME", "") == "VectorPoolAggregationModuleMSG":
                from .vector_pool_aggregation import VectorPoolAggregationMSG
                vmask = self._neighbor_valid(sa, xyz_b, mask_b, batch_dict)
                feats.append(VectorPoolAggregationMSG(sa, name=f"vp_{src}")(
                    xyz_b, feat_b, keypoints, vmask, train))
                continue
            grouped_list = []
            for radius, nsample, mlps in zip(sa["POOL_RADIUS"], sa["NSAMPLE"],
                                             sa["MLPS"]):
                idx, in_mask = ball_query(float(radius), int(nsample),
                                          xyz_b, keypoints, mask_b)
                g_xyz = group_points(xyz_b, idx) - keypoints[:, :, None, :]
                g = jnp.concatenate([g_xyz, group_points(feat_b, idx)], -1)
                grouped_list.append(_SAMLPBlock(
                    tuple(mlps),
                    name=f"sa_{src}_r{str(radius).replace('.','_')}")(
                    g, in_mask, train))
            feats.append(jnp.concatenate(grouped_list, axis=-1))

        kp_feats = jnp.concatenate(feats, axis=-1)             # (B, K, Ct)
        out = Linear(cfg.NUM_OUTPUT_FEATURES, use_bias=False,
                     name="vsa_point_feature_fusion")(kp_feats)
        out = relu(BatchNorm(name="fusion_norm")(
            out.reshape(-1, out.shape[-1]), train)).reshape(out.shape)

        K = keypoints.shape[1]
        b_col = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, K, 1))
        batch_dict["point_features"] = out.reshape(B * K, -1)
        batch_dict["point_features_before_fusion"] = kp_feats.reshape(B * K, -1)
        batch_dict["point_coords"] = jnp.concatenate(
            [b_col.astype(jnp.float32), keypoints], -1).reshape(B * K, 4)
        batch_dict["keypoints"] = keypoints
        return batch_dict


def _bilinear(bev, xs, ys):
    """bev: (B, H, W, C); xs/ys: (B, K) grid coords -> (B, K, C)."""
    B, H, W, C = bev.shape
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
    wx = jnp.clip(xs - x0, 0, 1)[..., None]
    wy = jnp.clip(ys - y0, 0, 1)[..., None]

    def gat(yy, xx):
        return jax.vmap(lambda m, a, b: m[a, b])(bev, yy, xx)

    v00 = gat(y0, x0)
    v01 = gat(y0, x0 + 1)
    v10 = gat(y0 + 1, x0)
    v11 = gat(y0 + 1, x0 + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def _regroup(centers, features, batch_idx, valid, B, cap):
    """Flattened (Nv, ...) voxels -> per-sample (B, cap, ...) with masks."""
    from ....ops.ingroup_inds import ingroup_inds
    rank = ingroup_inds(batch_idx.astype(jnp.int32), valid)
    slot = jnp.where(valid & (rank < cap),
                     batch_idx.astype(jnp.int32) * cap + rank, B * cap)
    xyz = jnp.zeros((B * cap + 1, 3), centers.dtype).at[slot].set(centers)
    fts = jnp.zeros((B * cap + 1, features.shape[1]), features.dtype) \
        .at[slot].set(features)
    msk = jnp.zeros(B * cap + 1, bool).at[slot].set(valid)
    return (xyz[:-1].reshape(B, cap, 3), fts[:-1].reshape(B, cap, -1),
            msk[:-1].reshape(B, cap))
