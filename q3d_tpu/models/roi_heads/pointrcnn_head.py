"""PointRCNNHead — in-ROI raw-point pooling + mini-PointNet refinement.

Parity with reference ``roi_heads/pointrcnn_head.py``: roipoint_pool3d
gathers each ROI's points (+ per-point features, fg score), canonical
transform into the ROI frame, a small PointNet encoder (shared MLP +
max-pool), then FC cls/reg with RoIHeadTemplate targets/losses.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roipoint_pool3d import roipoint_pool3d
from ...utils import common_utils
from ..layers import Linear, BatchNorm, relu
from .roi_head_template import RoIHeadTemplate


class PointRCNNHead(RoIHeadTemplate):

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

        xyz = batch_dict["point_xyz_batched"]             # (B, N, 3)
        feats = batch_dict["point_features"].reshape(B, xyz.shape[1], -1)
        if "point_cls_scores" in batch_dict:
            scores = batch_dict["point_cls_scores"].reshape(B, xyz.shape[1], 1)
            feats = jnp.concatenate([feats, scores], -1)
        S = int(cfg.ROI_POINT_POOL.NUM_SAMPLED_POINTS)
        pooled, empty = roipoint_pool3d(xyz, feats, rois, S)  # (B,R,S,3+C)

        # canonical transform (reference pointrcnn_head canonical_transform)
        local = pooled[..., :3] - rois[:, :, None, :3]
        flat = local.reshape(B * R, S, 3)
        rot = common_utils.rotate_points_along_z(
            flat, -rois[..., 6].reshape(-1)).reshape(B, R, S, 3)
        x = jnp.concatenate([rot, pooled[..., 3:]], -1)
        x = x * (1 - empty)[..., None, None]

        x = x.reshape(B * R, S, -1)
        for i, c in enumerate(cfg.SHARED_FC):
            BR, Sx, Cx = x.shape
            x = Linear(c, use_bias=False, name=f"pn_mlp{i}")(x)
            x = BatchNorm(name=f"pn_norm{i}")(
                x.reshape(BR * Sx, c), train).reshape(BR, Sx, c)
            x = relu(x)
        x = x.max(axis=1)                                  # (B*R, C)

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
