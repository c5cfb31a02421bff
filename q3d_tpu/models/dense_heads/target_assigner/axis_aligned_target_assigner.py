"""Axis-aligned anchor-GT matching, jittable with padded GT.

Parity with reference
``dense_heads/target_assigner/axis_aligned_target_assigner.py:8`` (210 LoC):
per-class nearest-BEV IoU matching with matched/unmatched thresholds, forced
assignment of each GT's best anchor, ignore region between thresholds.

TPU re-design: the reference loops over variable-length per-class GT lists on
the host; here everything is one fixed-shape (Na, M) IoU computed on device,
with class identity enforced by masking, so target assignment jits into the
training step (no host sync per batch).
"""

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import box_utils
from ....ops.iou3d_nms import boxes_iou3d


class AxisAlignedTargetAssigner:
    def __init__(self, model_cfg, class_names, box_coder,
                 match_height=False):
        cfg = model_cfg.TARGET_ASSIGNER_CONFIG
        self.box_coder = box_coder
        self.match_height = match_height
        self.class_names = list(class_names)
        self.anchor_class_names = [c["class_name"]
                                   for c in model_cfg.ANCHOR_GENERATOR_CONFIG]
        self.matched_thresholds = {c["class_name"]: c["matched_threshold"]
                                   for c in model_cfg.ANCHOR_GENERATOR_CONFIG}
        self.unmatched_thresholds = {c["class_name"]: c["unmatched_threshold"]
                                     for c in model_cfg.ANCHOR_GENERATOR_CONFIG}
        self.pos_fraction = cfg.get("POS_FRACTION", None)
        self.norm_by_num_examples = cfg.get("NORM_BY_NUM_EXAMPLES", False)

    def assign_targets(self, all_anchors: List[np.ndarray], gt_boxes_with_classes):
        """all_anchors: per-class (nz,ny,nx,Ns,Nr,C) arrays;
        gt_boxes_with_classes: (B, M, 8) padded with zeros.

        Returns dict of (B, Na_total, ...) targets.
        """
        anchors_flat = []
        anchor_cls_ids = []
        matched_t = []
        unmatched_t = []
        for name, anch in zip(self.anchor_class_names, all_anchors):
            a = anch.reshape(-1, anch.shape[-1])
            anchors_flat.append(a)
            cls_id = self.class_names.index(name) + 1
            anchor_cls_ids.append(np.full(a.shape[0], cls_id, np.int32))
            matched_t.append(np.full(a.shape[0], self.matched_thresholds[name],
                                     np.float32))
            unmatched_t.append(np.full(a.shape[0], self.unmatched_thresholds[name],
                                       np.float32))
        anchors = jnp.asarray(np.concatenate(anchors_flat, axis=0))     # (Na, 7)
        anchor_cls = jnp.asarray(np.concatenate(anchor_cls_ids))
        m_thresh = jnp.asarray(np.concatenate(matched_t))
        u_thresh = jnp.asarray(np.concatenate(unmatched_t))

        def assign_one(gt):
            return self._assign_single(anchors, anchor_cls, m_thresh, u_thresh, gt)

        return jax.vmap(assign_one)(gt_boxes_with_classes)

    def _assign_single(self, anchors, anchor_cls, m_thresh, u_thresh, gt):
        gt_boxes = gt[:, :7]
        gt_cls = gt[:, -1].astype(jnp.int32)
        gt_valid = gt_cls > 0
        if self.match_height:
            iou = boxes_iou3d(anchors[:, :7], gt_boxes)
        else:
            iou = box_utils.boxes3d_nearest_bev_iou(anchors[:, :7], gt_boxes)
        same_cls = anchor_cls[:, None] == gt_cls[None, :]
        iou = jnp.where(same_cls & gt_valid[None, :], iou, -1.0)        # (Na, M)

        anchor_best_gt = jnp.argmax(iou, axis=1)
        anchor_best_iou = jnp.max(iou, axis=1)
        gt_best_iou = jnp.max(iou, axis=0)                              # (M,)
        # force-match: anchors tying a gt's best iou (> 0)
        force = (iou == gt_best_iou[None, :]) & (gt_best_iou[None, :] > 0) \
            & gt_valid[None, :]
        force_any = force.any(axis=1)
        force_gt = jnp.argmax(force, axis=1)

        matched = anchor_best_iou >= m_thresh
        assigned_gt = jnp.where(force_any & ~matched, force_gt, anchor_best_gt)
        fg = matched | force_any
        bg = (anchor_best_iou < u_thresh) & ~fg

        labels = jnp.where(fg, gt_cls[assigned_gt], jnp.where(bg, 0, -1))
        matched_boxes = gt_boxes[assigned_gt]
        reg_targets = self.box_coder.encode(matched_boxes, anchors[:, :7])
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        reg_weights = fg.astype(jnp.float32)
        if self.norm_by_num_examples:
            num_examples = jnp.maximum((labels >= 0).sum(), 1.0)
            reg_weights = reg_weights / num_examples
        else:
            reg_weights = reg_weights / jnp.maximum(fg.sum(), 1.0)
        return {
            "box_cls_labels": labels,
            "box_reg_targets": reg_targets,
            "reg_weights": reg_weights,
            "matched_gt_boxes": jnp.where(fg[:, None], matched_boxes, 0.0),
        }
