"""SECONDHead — BEV-feature IoU estimation head (SECONDNetIoU).

Parity with reference ``roi_heads/second_head.py`` (177-LoC detector family):
bilinearly samples rotated ROI grid points from the 2D BEV feature map, runs
FC stacks to predict each ROI's IoU with GT, which then RECTIFIES the
first-stage scores (score^(1-w) * iou^w) before class-specific NMS.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import common_utils
from ..layers import Linear, BatchNorm, relu
from .roi_head_template import RoIHeadTemplate
from ..backbones_3d.pfe.voxel_set_abstraction import _bilinear


class SECONDHead(RoIHeadTemplate):
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
        bev = batch_dict["spatial_features_2d"]           # (B, H, W, C)
        down = batch_dict["spatial_features"].shape[1] // bev.shape[1]
        stride = batch_dict.get("spatial_features_stride", 1) * max(down, 1)

        # rotated 2D grid points inside each ROI footprint
        lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
        gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
        local = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                           jnp.zeros(g * g)], -1)         # (g2, 3)
        local = local[None, None] * jnp.concatenate(
            [rois[:, :, None, 3:5], jnp.ones_like(rois[:, :, None, :1])], -1)
        shape = local.shape
        rot = common_utils.rotate_points_along_z(
            local.reshape(B * R, -1, 3), rois[..., 6].reshape(-1))
        world = rot.reshape(shape)[..., :2] + rois[:, :, None, 0:2]
        xs = (world[..., 0].reshape(B, -1) - self.point_cloud_range[0]) \
            / self.voxel_size[0] / stride
        ys = (world[..., 1].reshape(B, -1) - self.point_cloud_range[1]) \
            / self.voxel_size[1] / stride
        pooled = _bilinear(bev, xs, ys).reshape(B * R, -1)

        x = pooled
        for i, c in enumerate(cfg.SHARED_FC):
            x = Linear(c, use_bias=False, name=f"shared_fc_{i}")(x)
            x = BatchNorm(name=f"shared_norm_{i}")(x, train)
            x = relu(x)
        iou_x = x
        for i, c in enumerate(cfg.IOU_FC):
            iou_x = relu(Linear(c, name=f"iou_fc_{i}")(iou_x))
        iou_preds = Linear(1, name="iou_out")(iou_x).reshape(B, R)

        if train:
            s_rois, s_gt, cls_t, reg_valid, s_labels = sampled
            # iou regression target = actual roi-gt IoU encoded into cls_t
            bce = jnp.clip(iou_preds, 0, None) - iou_preds * cls_t \
                + jnp.log1p(jnp.exp(-jnp.abs(iou_preds)))
            iou_loss = bce.mean() \
                * cfg.LOSS_CONFIG.LOSS_WEIGHTS["rcnn_cls_weight"]
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + iou_loss
            batch_dict.setdefault("tb_dict", {})["rcnn_iou_loss"] = iou_loss
        else:
            iou = jax.nn.sigmoid(iou_preds)
            w = float(cfg.get("IOU_WEIGHT", 0.5))
            roi_scores = batch_dict.get("roi_scores",
                                        jnp.ones_like(iou))
            rectified = jnp.power(jnp.clip(roi_scores, 1e-6, 1.0), 1 - w) \
                * jnp.power(jnp.clip(iou, 1e-6, 1.0), w)
            batch_dict["final_boxes"] = rois
            batch_dict["final_scores"] = rectified
            batch_dict["final_labels"] = roi_labels
            batch_dict["final_valid"] = batch_dict.get("roi_valid",
                                                       rectified > 0.1)
        return batch_dict
