"""PVRCNNHead — keypoint-pooled ROI refinement.

Parity with reference ``roi_heads/pvrcnn_head.py``: 6x6x6 ROI grid points,
ball-query aggregation of VSA keypoint features around each grid point
(ROI_GRID_POOL.SA config), flattened grid features -> shared FC -> IoU-guided
cls + canonical box regression (losses/targets from RoIHeadTemplate).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2_utils import ball_query, group_points
from ...utils import common_utils
from ..layers import Linear, BatchNorm, relu
from .roi_head_template import RoIHeadTemplate
from ..backbones_3d.pfe.voxel_set_abstraction import _SAMLPBlock


def roi_grid_points(rois, grid_size):
    """(B, R, 7) -> (B, R*g^3, 3) world-frame grid points."""
    B, R = rois.shape[:2]
    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1)
    local = local[None, None] * rois[:, :, None, 3:6]          # (B,R,g3,3)
    shape = local.shape
    rot = common_utils.rotate_points_along_z(
        local.reshape(B * R, -1, 3), rois[..., 6].reshape(-1))
    return (rot.reshape(shape) + rois[:, :, None, 0:3]).reshape(B, -1, 3)


class PVRCNNHead(RoIHeadTemplate):
    grid_size: int = 6

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

        kp = batch_dict["keypoints"]                           # (B, K, 3)
        kp_feats = batch_dict["point_features"].reshape(B, kp.shape[1], -1)
        if "point_cls_scores" in batch_dict:
            w = batch_dict["point_cls_scores"].reshape(B, kp.shape[1], 1)
            kp_feats = kp_feats * w

        grid = roi_grid_points(rois, g)                        # (B, R*g3, 3)
        sa = cfg.ROI_GRID_POOL
        if sa.get("NAME", "") == "VectorPoolAggregationModuleMSG":
            # PV-RCNN++: vector-pool grid aggregation over keypoints
            from ..backbones_3d.pfe.vector_pool_aggregation import \
                VectorPoolAggregationMSG
            pooled = VectorPoolAggregationMSG(sa, name="vp_grid_pool")(
                kp, kp_feats, grid, None, train)               # (B, R*g3, C)
        else:
            pooled_list = []
            for radius, nsample, mlps in zip(sa.POOL_RADIUS, sa.NSAMPLE,
                                             sa.MLPS):
                idx, in_mask = ball_query(float(radius), int(nsample), kp,
                                          grid)
                g_xyz = group_points(kp, idx) - grid[:, :, None, :]
                gfe = jnp.concatenate(
                    [g_xyz, group_points(kp_feats, idx)], -1)
                pooled_list.append(_SAMLPBlock(
                    tuple(mlps),
                    name=f"pool_r{str(radius).replace('.','_')}")(
                    gfe, in_mask, train))
            pooled = jnp.concatenate(pooled_list, -1)          # (B, R*g3, Cp)
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
