"""VoxelRCNNHead — multi-scale sparse-voxel ROI grid pooling.

Parity with reference ``roi_heads/voxelrcnn_head.py`` (262 LoC): ROI grid
points gather neighboring voxel features from several sparse-conv scales
(the reference's voxel-query neighbor lookup becomes a radius ball query
over voxel centers — same neighborhoods at radius ≈ voxel diagonal), pooled
with shared MLPs, then FC cls/reg refinement via RoIHeadTemplate.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2_utils import ball_query, group_points
from ...utils import common_utils
from ..layers import Linear, BatchNorm, relu
from .roi_head_template import RoIHeadTemplate
from .pvrcnn_head import roi_grid_points
from ..backbones_3d.pfe.voxel_set_abstraction import _SAMLPBlock, _regroup


class VoxelRCNNHead(RoIHeadTemplate):
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = ()

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        rois = batch_dict["rois"][..., :7]
        roi_labels = batch_dict["roi_labels"].astype(jnp.int32)
        if train:
            sampled = self.assign_targets(rois, roi_labels,
                                          batch_dict["gt_boxes"])
            rois = sampled[0]
        B, R = rois.shape[:2]
        g = int(cfg.ROI_GRID_POOL.GRID_SIZE)
        grid = roi_grid_points(rois, g)                    # (B, R*g^3, 3)

        ms = batch_dict["multi_scale_3d_features"]
        strides = batch_dict["multi_scale_3d_strides"]
        pooled_list = []
        for src, pool_cfg in cfg.ROI_GRID_POOL.POOL_LAYERS.items():
            st = ms[src]
            centers = common_utils.get_voxel_centers(
                st.indices[:, 1:], strides[src], self.voxel_size,
                self.point_cloud_range)
            cap = st.capacity // B
            xyz_b, feat_b, mask_b = _regroup(centers, st.features,
                                             st.indices[:, 0], st.valid, B, cap)
            for radius, nsample, mlps in zip(pool_cfg["POOL_RADIUS"],
                                             pool_cfg["NSAMPLE"],
                                             pool_cfg["MLPS"]):
                r = float(radius)
                idx, in_mask = ball_query(r, int(nsample), xyz_b, grid, mask_b)
                g_xyz = group_points(xyz_b, idx) - grid[:, :, None, :]
                gfe = jnp.concatenate([g_xyz, group_points(feat_b, idx)], -1)
                pooled_list.append(_SAMLPBlock(
                    tuple(mlps),
                    name=f"pool_{src}_r{str(r).replace('.', '_')}")(
                    gfe, in_mask, train))
        pooled = jnp.concatenate(pooled_list, -1)
        x = pooled.reshape(B * R, -1)

        for i, c in enumerate(cfg.SHARED_FC):
            x = Linear(c, use_bias=False, name=f"shared_fc_{i}")(x)
            x = BatchNorm(name=f"shared_norm_{i}")(x, train)
            x = relu(x)
        cls_x = x
        for i, c in enumerate(cfg.CLS_FC):
            cls_x = relu(Linear(c, name=f"cls_fc_{i}")(cls_x))
        cls_preds = Linear(1, name="cls_out")(cls_x).reshape(B, R)
        reg_x = x
        for i, c in enumerate(cfg.REG_FC):
            reg_x = relu(Linear(c, name=f"reg_fc_{i}")(reg_x))
        box_preds = Linear(self._coder().code_size, name="reg_out")(
            reg_x).reshape(B, R, -1)

        if train:
            cls_loss, reg_loss = self.get_loss(cls_preds, box_preds, sampled)
            total = cls_loss + reg_loss
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + total
            batch_dict.setdefault("tb_dict", {}).update(
                {"rcnn_cls_loss": cls_loss, "rcnn_reg_loss": reg_loss})
        else:
            refined = self.decode_boxes(rois, box_preds)
            scores = jax.nn.sigmoid(cls_preds)
            batch_dict["final_boxes"] = refined
            batch_dict["final_scores"] = scores * batch_dict.get(
                "roi_scores", jnp.ones_like(scores))
            batch_dict["final_labels"] = roi_labels
            batch_dict["final_valid"] = batch_dict.get("roi_valid",
                                                       scores > 0.1)
        return batch_dict
