"""PartA2FCHead — part-aware ROI pooling + FC refinement.

Parity with reference ``roi_heads/partA2_head.py``: pools the UNet's
stride-1 point features into a per-ROI voxel grid with ``roiaware_pool3d``
(MAX pooling), and — when the PointIntraPartOffsetHead ran — AVG-pools the
per-point part features (part offset 3 + seg score 1), with offsets zeroed
below ``SEG_MASK_SCORE_THRESH`` (reference ``partA2_head.py:121-151``).
Both pooled grids are flattened and fused before the shared FC stack into
IoU-guided cls + canonical-frame box regression (the reference runs two
small sparse convs first; at these grid sizes a dense FC fusion is the
TPU-friendly equivalent).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roiaware_pool3d import roiaware_pool3d
from ...utils import common_utils
from ..layers import Linear, BatchNorm, relu
from .roi_head_template import RoIHeadTemplate


class PartA2FCHead(RoIHeadTemplate):
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = ()

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        rois = batch_dict["rois"][..., :7]                 # (B, R, 7)
        roi_labels = batch_dict["roi_labels"].astype(jnp.int32)
        pt_feats = batch_dict["point_features"]            # (B*V, C)
        pt_coords = batch_dict["point_coords"]             # (B*V, 4) bzyx

        if train:
            sampled = self.assign_targets(rois, roi_labels,
                                          batch_dict["gt_boxes"])
            rois = sampled[0]                              # (B, S, 7)

        B, R = rois.shape[:2]
        pool_cfg = cfg.get("ROI_GRID_POOL", None) or cfg.ROI_AWARE_POOL
        grid = int(pool_cfg.get("GRID_SIZE", pool_cfg.get("POOL_SIZE", 12)))
        xyz = common_utils.get_voxel_centers(
            pt_coords[:, 1:], 1, self.voxel_size, self.point_cloud_range)
        bidx = pt_coords[:, 0]

        part_feats = None
        if "point_part_offset" in batch_dict:
            seg_score = batch_dict["point_cls_scores"][:, None]
            offset = batch_dict["point_part_offset"]
            thresh = float(cfg.get("SEG_MASK_SCORE_THRESH", 0.3))
            offset = jnp.where(seg_score < thresh,
                               jnp.zeros_like(offset), offset)
            part_feats = jnp.concatenate(
                [offset, seg_score], axis=-1).astype(pt_feats.dtype)

        def pool_one(b):
            mask = (bidx == b)[:, None].astype(pt_feats.dtype)
            pooled = roiaware_pool3d(rois[b], xyz, pt_feats * mask,
                                     out_size=grid, pool_method="max")
            if part_feats is None:
                return pooled                               # (R, g, g, g, C)
            pooled_part = roiaware_pool3d(rois[b], xyz, part_feats * mask,
                                          out_size=grid, pool_method="avg")
            return jnp.concatenate([pooled, pooled_part], axis=-1)

        pooled = jnp.stack([pool_one(b) for b in range(B)])  # (B,R,g,g,g,C')
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
            batch_dict["final_valid"] = batch_dict.get(
                "roi_valid", scores > 0.1)
        return batch_dict
