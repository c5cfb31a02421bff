"""RoIHeadTemplate — second-stage refinement machinery.

Parity with reference ``roi_heads/roi_head_template.py`` (261 LoC) +
``target_assigner/proposal_target_layer.py``: proposal-layer NMS (our dense
heads already emit fixed-size rois), IoU-based ROI-GT matching, fg/bg ROI
subsampling, IoU-guided classification targets, ``ResidualCoder`` residual
regression in the ROI's canonical frame, and the cls/reg losses.

TPU re-design: ROI sampling is deterministic top-k by matching quality
(fg: highest IoU; bg: hardest below threshold) instead of host-side random
choice — jittable, reproducible, and the sampling distribution the random
scheme converges to in expectation.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_coder_utils, common_utils, loss_utils
from ...ops.iou3d_nms import boxes_iou3d


class RoIHeadTemplate(nn.Module):
    model_cfg: Any
    input_channels: int = 0
    num_class: int = 1
    predict_boxes_when_training: bool = False

    def _coder(self):
        return box_coder_utils.ResidualCoder(
            **self.model_cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}))

    # ------------------------- target assignment --------------------------

    def assign_targets(self, rois, roi_labels, gt_boxes):
        """rois: (B, R, 7); gt_boxes: (B, M, 8). Returns dict of (B, S, ...)
        sampled rois + targets, S = ROI_PER_IMAGE."""
        cfg = self.model_cfg.TARGET_CONFIG
        S = int(cfg.ROI_PER_IMAGE)
        fg_num = int(S * float(cfg.FG_RATIO))

        def one(rois_b, labels_b, gt_b):
            gt = gt_b[:, :7]
            gt_cls = gt_b[:, -1].astype(jnp.int32)
            valid_gt = gt_cls > 0
            iou = boxes_iou3d(rois_b, gt)                  # (R, M)
            same_cls = labels_b[:, None] == gt_cls[None, :]
            iou = jnp.where(same_cls & valid_gt[None, :], iou, 0.0)
            max_iou = iou.max(axis=1)
            gt_idx = iou.argmax(axis=1)

            fg_thresh = float(cfg.CLS_FG_THRESH)
            # deterministic sampling: top fg by IoU, then hardest bg
            fg_score = jnp.where(max_iou >= float(cfg.REG_FG_THRESH),
                                 max_iou, -1.0)
            _, fg_sel = jax.lax.top_k(fg_score, fg_num)
            bg_score = jnp.where(max_iou < float(cfg.REG_FG_THRESH),
                                 max_iou, -1.0)
            _, bg_sel = jax.lax.top_k(bg_score, S - fg_num)
            sel = jnp.concatenate([fg_sel, bg_sel])
            s_rois = rois_b[sel]
            s_iou = max_iou[sel]
            s_gt = gt_b[gt_idx[sel]]
            s_labels = labels_b[sel]
            # iou-guided cls target (reference roi_head_template get_box_cls_layer_loss)
            bg_thresh = float(cfg.CLS_BG_THRESH)
            cls_t = jnp.clip((s_iou - bg_thresh) / (fg_thresh - bg_thresh), 0, 1)
            reg_valid = s_iou >= float(cfg.REG_FG_THRESH)
            return s_rois, s_gt, cls_t, reg_valid, s_labels

        return jax.vmap(one)(rois, roi_labels, gt_boxes)

    def encode_targets(self, rois, gt_of_roi):
        """Residuals in the ROI canonical frame (reference
        roi_head_template.py ~:180)."""
        coder = self._coder()
        roi_ry = rois[..., 6]
        roi_xyz = rois[..., 0:3]
        gt_local = gt_of_roi[..., :7]
        gt_local = jnp.concatenate([
            gt_local[..., 0:3] - roi_xyz, gt_local[..., 3:]], axis=-1)
        shape = gt_local.shape
        rot = common_utils.rotate_points_along_z(
            gt_local[..., None, 0:3].reshape(-1, 1, 3),
            -roi_ry.reshape(-1)).reshape(*shape[:-1], 3)
        gt_local = jnp.concatenate([
            rot, gt_local[..., 3:6],
            (gt_local[..., 6:7] - roi_ry[..., None])], axis=-1)
        local_roi = jnp.concatenate([
            jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
            jnp.zeros_like(rois[..., 6:7])], axis=-1)
        return coder.encode(gt_local, local_roi)

    def decode_boxes(self, rois, box_preds):
        coder = self._coder()
        local_roi = jnp.concatenate([
            jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
            jnp.zeros_like(rois[..., 6:7])], axis=-1)
        local = coder.decode(box_preds, local_roi)
        shape = local.shape
        xyz = common_utils.rotate_points_along_z(
            local[..., None, 0:3].reshape(-1, 1, 3),
            rois[..., 6].reshape(-1)).reshape(*shape[:-1], 3)
        return jnp.concatenate([
            xyz + rois[..., 0:3], local[..., 3:6],
            local[..., 6:7] + rois[..., 6:7]], axis=-1)

    def get_loss(self, cls_preds, box_preds, sampled):
        """cls_preds: (B, S); box_preds: (B, S, code); sampled = output of
        assign_targets."""
        s_rois, s_gt, cls_t, reg_valid, s_labels = sampled
        lw = self.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
        bce = jnp.clip(cls_preds, 0, None) - cls_preds * cls_t \
            + jnp.log1p(jnp.exp(-jnp.abs(cls_preds)))
        cls_loss = bce.mean() * lw["rcnn_cls_weight"]
        reg_t = self.encode_targets(s_rois, s_gt)
        smooth = loss_utils.WeightedSmoothL1Loss(
            code_weights=lw.get("code_weights", None))
        w = reg_valid.astype(jnp.float32)
        reg_loss = (smooth(box_preds, reg_t, w).sum()
                    / jnp.maximum(w.sum(), 1.0)) * lw["rcnn_reg_weight"]
        return cls_loss, reg_loss
