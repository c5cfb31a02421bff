"""Anchor-head shared machinery: anchors, decode, dir handling, losses.

Parity with reference ``dense_heads/anchor_head_template.py:11`` (275 LoC):
anchor generation, AxisAlignedTargetAssigner hookup, sin-difference heading
regression, direction-bin classification, focal cls + smooth-L1 reg losses,
``generate_predicted_boxes`` with direction-bin correction.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder_utils, common_utils, loss_utils
from .target_assigner.anchor_generator import generate_anchors_from_cfg
from .target_assigner.axis_aligned_target_assigner import AxisAlignedTargetAssigner


class AnchorHeadTemplate(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Tuple[str, ...]
    grid_size: Tuple[int, int, int]
    point_cloud_range: Tuple[float, ...]
    predict_boxes_when_training: bool = True

    def _setup_common(self):
        cfg = self.model_cfg
        self.use_multihead = cfg.get("USE_MULTIHEAD", False)
        coder_cfg = cfg.get("BOX_CODER_CONFIG", {})
        self.box_coder = getattr(box_coder_utils, cfg.get("BOX_CODER", "ResidualCoder"))(
            num_dir_bins=cfg.get("NUM_DIR_BINS", 6), **coder_cfg)
        anchors, self.num_anchors_per_location = generate_anchors_from_cfg(
            cfg.ANCHOR_GENERATOR_CONFIG, np.asarray(self.grid_size),
            self.point_cloud_range,
            anchor_ndim=max(self.box_coder.code_size, 7))
        self.anchors_list = anchors            # per-class (nz,ny,nx,Ns,Nr,7)
        self.target_assigner = AxisAlignedTargetAssigner(
            cfg, self.class_names, box_coder=self.box_coder,
            match_height=cfg.TARGET_ASSIGNER_CONFIG.get("MATCH_HEIGHT", False)) \
            if cfg.get("TARGET_ASSIGNER_CONFIG", None) is not None else None

    def flat_anchors(self):
        """(Na, 7): per-class grids concatenated along the size axis then
        flattened — the exact order of reference cat(anchors, dim=-3).view."""
        cat = np.concatenate(self.anchors_list, axis=-3)
        return jnp.asarray(cat.reshape(-1, cat.shape[-1]))

    # ----------------------------- decode --------------------------------

    def generate_predicted_boxes(self, batch_size, cls_preds, box_preds,
                                 dir_cls_preds=None):
        """cls/box/dir preds: (B, H, W, A*D) NHWC -> flat (B, Na, ...) decoded."""
        cfg = self.model_cfg
        anchors = self.flat_anchors()                        # (Na, 7)
        na = anchors.shape[0]
        batch_cls = cls_preds.reshape(batch_size, na, -1)
        batch_box = box_preds.reshape(batch_size, na, -1)
        batch_box = self.box_coder.decode(batch_box, anchors[None])
        if dir_cls_preds is not None:
            dir_offset = cfg.DIR_OFFSET
            dir_limit_offset = cfg.DIR_LIMIT_OFFSET
            dir_preds = dir_cls_preds.reshape(batch_size, na, -1)
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / cfg.NUM_DIR_BINS
            dir_rot = common_utils.limit_period(
                batch_box[..., 6] - dir_offset, dir_limit_offset, period)
            rot = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
            batch_box = batch_box.at[..., 6].set(rot)
        return batch_cls, batch_box

    # ----------------------------- losses --------------------------------

    @staticmethod
    def add_sin_difference(boxes1, boxes2, dim=6):
        """sin(a-b) heading residual trick (reference :~196)."""
        rad_pred = jnp.sin(boxes1[..., dim]) * jnp.cos(boxes2[..., dim])
        rad_tg = jnp.cos(boxes1[..., dim]) * jnp.sin(boxes2[..., dim])
        b1 = jnp.concatenate([boxes1[..., :dim], rad_pred[..., None],
                              boxes1[..., dim + 1:]], axis=-1)
        b2 = jnp.concatenate([boxes2[..., :dim], rad_tg[..., None],
                              boxes2[..., dim + 1:]], axis=-1)
        return b1, b2

    def get_direction_target(self, reg_targets, one_hot=True):
        cfg = self.model_cfg
        anchors = self.flat_anchors()[None]
        rot_gt = reg_targets[..., 6] + anchors[..., 6]
        offset_rot = common_utils.limit_period(rot_gt - cfg.DIR_OFFSET, 0, 2 * np.pi)
        dir_cls = jnp.clip((offset_rot / (2 * np.pi / cfg.NUM_DIR_BINS)).astype(jnp.int32),
                           0, cfg.NUM_DIR_BINS - 1)
        if one_hot:
            return jax.nn.one_hot(dir_cls, cfg.NUM_DIR_BINS, dtype=reg_targets.dtype)
        return dir_cls

    def get_loss(self, forward_ret):
        cfg = self.model_cfg
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        cls_preds = forward_ret["cls_preds"]
        box_preds = forward_ret["box_preds"]
        labels = forward_ret["box_cls_labels"]               # (B, Na)
        reg_targets = forward_ret["box_reg_targets"]
        reg_weights = forward_ret["reg_weights"]
        B = cls_preds.shape[0]
        na = labels.shape[1]

        cared = labels >= 0
        positives = labels > 0
        cls_weights = (cared & (labels == 0)).astype(jnp.float32) \
            + positives.astype(jnp.float32)
        pos_norm = jnp.maximum(positives.sum(axis=1, keepdims=True), 1.0)
        cls_weights = cls_weights / pos_norm

        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1,
                                 dtype=cls_preds.dtype)[..., 1:]
        cls_flat = cls_preds.reshape(B, na, self.num_class)
        cls_loss = loss_utils.sigmoid_focal_cls_loss(
            cls_flat, one_hot, cls_weights).sum() / B * lw["cls_weight"]

        box_flat = box_preds.reshape(B, na, -1)
        box_p, box_t = self.add_sin_difference(box_flat, reg_targets)
        smooth_l1 = loss_utils.WeightedSmoothL1Loss(
            code_weights=lw.get("code_weights", None))
        loc_loss = smooth_l1(box_p, box_t, reg_weights).sum() / B * lw["loc_weight"]

        total = cls_loss + loc_loss
        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        if "dir_cls_preds" in forward_ret and forward_ret["dir_cls_preds"] is not None:
            dir_targets = self.get_direction_target(reg_targets)
            dir_logits = forward_ret["dir_cls_preds"].reshape(B, na, -1)
            weights = positives.astype(jnp.float32)
            weights = weights / jnp.maximum(weights.sum(-1, keepdims=True), 1.0)
            dir_loss = loss_utils.weighted_cross_entropy(
                dir_logits, dir_targets, weights).sum() / B * lw["dir_weight"]
            total = total + dir_loss
            tb["rpn_loss_dir"] = dir_loss
        tb["rpn_loss"] = total
        return total, tb
