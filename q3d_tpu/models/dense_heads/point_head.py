"""Point-wise heads: foreground segmentation + box regression.

Parity with reference ``dense_heads/point_head_simple.py`` /
``point_head_box.py`` (+ ``point_head_template.py``): MLP over per-point (or
per-voxel) features, focal segmentation loss with targets from
points-inside-gt-boxes (extended-box ignore ring), and PointResidualCoder box
regression for PointHeadBox.  Consumes UNetV2's stride-1 ``point_features`` /
``point_coords`` (bzyx voxel indices -> world centers).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_coder_utils, common_utils, loss_utils
from ...ops.roiaware_pool3d import points_in_boxes_jax
from ..layers import Linear, BatchNorm, relu


class _MLP(nn.Module):
    channels: Tuple[int, ...]
    out_channels: int

    @nn.compact
    def __call__(self, x, train=False):
        for i, c in enumerate(self.channels):
            x = Linear(c, use_bias=False, name=f"fc{i}")(x)
            x = BatchNorm(name=f"norm{i}")(x, train)
            x = relu(x)
        return Linear(self.out_channels, name="out")(x)


class PointHeadTemplate(nn.Module):
    model_cfg: Any
    num_class: int
    input_channels: int = 0
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = ()
    predict_boxes_when_training: bool = False

    def _point_xyz(self, batch_dict):
        coords = batch_dict["point_coords"]
        # UNet emits integer (b, z, y, x) voxel indices; VSA emits float
        # (b, x, y, z) world coords (reference convention)
        if jnp.issubdtype(coords.dtype, jnp.floating):
            return coords[:, 1:4], coords[:, 0].astype(jnp.int32)
        xyz = common_utils.get_voxel_centers(
            coords[:, 1:], 1, self.voxel_size, self.point_cloud_range)
        return xyz, coords[:, 0]

    def assign_targets(self, xyz, batch_idx, gt_boxes, extra_width=(0.2, 0.2, 0.2)):
        """Per-point class targets: inside gt -> class id; inside enlarged gt
        (ignore ring) -> -1; else 0 (reference point_head_template
        assign_stack_targets)."""
        from ...utils import box_utils
        B, M = gt_boxes.shape[:2]

        def one(b):
            mask = batch_idx == b
            boxes = gt_boxes[b]
            idx = points_in_boxes_jax(xyz, boxes[:, :7])
            big = box_utils.enlarge_box3d(boxes[:, :7], extra_width)
            idx_big = points_in_boxes_jax(xyz, big)
            valid_box = boxes[:, -1] > 0
            safe = jnp.clip(idx, 0, M - 1)
            cls = jnp.where((idx >= 0) & valid_box[safe],
                            boxes[safe, -1].astype(jnp.int32), 0)
            ignored = (idx < 0) & (idx_big >= 0) & valid_box[jnp.clip(idx_big, 0, M - 1)]
            cls = jnp.where(ignored, -1, cls)
            return jnp.where(mask, cls, 0), jnp.where(mask, safe, 0)

        labels = jnp.zeros(xyz.shape[0], jnp.int32)
        box_idx = jnp.zeros(xyz.shape[0], jnp.int32)
        for b in range(B):
            l, bi = one(b)
            take = batch_idx == b
            labels = jnp.where(take, l, labels)
            box_idx = jnp.where(take, bi, box_idx)
        return labels, box_idx


class PointHeadSimple(PointHeadTemplate):
    """Foreground score head (reference point_head_simple.py; used by PV-RCNN
    keypoint weighting)."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["point_features"]
        cls_logits = _MLP(tuple(self.model_cfg.CLS_FC), self.num_class,
                          name="cls_layers")(feats, train)
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_logits).max(-1)
        if train:
            xyz, bidx = self._point_xyz(batch_dict)
            labels, _ = self.assign_targets(xyz, bidx, batch_dict["gt_boxes"])
            valid = batch_dict["point_coords"][:, 0] >= 0
            cared = (labels >= 0) & valid
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None),
                                     self.num_class + 1)[..., 1:]
            pos = (labels > 0) & valid
            w = cared.astype(jnp.float32) / jnp.maximum(pos.sum(), 1.0)
            loss = loss_utils.sigmoid_focal_cls_loss(
                cls_logits[None], one_hot[None], w[None]).sum() \
                * self.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS["point_cls_weight"]
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + loss
            batch_dict.setdefault("tb_dict", {})["point_cls_loss"] = loss
        return batch_dict


class PointHeadBox(PointHeadTemplate):
    """Per-point classification + box regression (reference
    point_head_box.py; PointRCNN first stage)."""

    def setup(self):
        cfg = self.model_cfg
        target_cfg = cfg.TARGET_CONFIG
        self.box_coder = getattr(box_coder_utils, target_cfg.BOX_CODER)(
            **target_cfg.get("BOX_CODER_CONFIG", {}))
        self.cls_layers = _MLP(tuple(cfg.CLS_FC), self.num_class,
                               name="cls_layers")
        self.box_layers = _MLP(tuple(cfg.REG_FC), self.box_coder.code_size,
                               name="box_layers")

    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["point_features"]
        cls_logits = self.cls_layers(feats, train)
        box_preds = self.box_layers(feats, train)
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_logits).max(-1)
        xyz, bidx = self._point_xyz(batch_dict)
        if train:
            labels, box_idx = self.assign_targets(xyz, bidx,
                                                  batch_dict["gt_boxes"])
            valid = batch_dict["point_coords"][:, 0] >= 0
            pos = (labels > 0) & valid
            cared = (labels >= 0) & valid
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None),
                                     self.num_class + 1)[..., 1:]
            w = cared.astype(jnp.float32) / jnp.maximum(pos.sum(), 1.0)
            cls_loss = loss_utils.sigmoid_focal_cls_loss(
                cls_logits[None], one_hot[None], w[None]).sum() \
                * self.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS["point_cls_weight"]
            gt_flat = batch_dict["gt_boxes"].reshape(
                -1, batch_dict["gt_boxes"].shape[-1])
            # gather matched gt boxes: flat index = b * M + box_idx
            M = batch_dict["gt_boxes"].shape[1]
            gt_of_point = gt_flat[bidx.astype(jnp.int32) * M + box_idx]
            targets = self.box_coder.encode(
                gt_of_point[:, :7], xyz, jnp.clip(labels, 1, None))
            diff = jnp.abs(box_preds - targets) * pos[:, None]
            box_loss = diff.sum() / jnp.maximum(pos.sum(), 1.0) \
                * self.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS["point_box_weight"]
            total = cls_loss + box_loss
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + total
            batch_dict.setdefault("tb_dict", {}).update(
                {"point_cls_loss": cls_loss, "point_box_loss": box_loss})
        if not train or self.predict_boxes_when_training:
            pred_classes = cls_logits.argmax(-1) + 1
            boxes = self.box_coder.decode(box_preds, xyz, pred_classes)
            batch_dict["point_box_preds"] = boxes
            batch_dict["point_cls_preds"] = cls_logits
        return batch_dict


class PointIntraPartOffsetHead(PointHeadTemplate):
    """Part-A2's intra-object part-location head (reference
    ``dense_heads/point_intra_part_head.py``): per-point foreground
    classification + regression of the point's normalized position INSIDE
    its object box ("part offset" in [0, 1]^3, canonical frame).

    Training: focal seg loss + BCE part loss on foreground points
    (``point_head_template.py:157-169``); part targets are the rotated
    box-local coordinates / dims + 0.5 (``:114-122``).
    Inference: emits ``point_cls_scores`` and sigmoid ``point_part_offset``
    consumed by PartA2FCHead's part-aware ROI pooling.
    """

    def setup(self):
        cfg = self.model_cfg
        self.cls_layers = _MLP(tuple(cfg.CLS_FC), self.num_class,
                               name="cls_layers")
        self.part_reg_layers = _MLP(tuple(cfg.PART_FC), 3,
                                    name="part_reg_layers")
        target_cfg = cfg.get("TARGET_CONFIG", {})
        if target_cfg.get("BOX_CODER", None) is not None:
            self.box_coder = getattr(box_coder_utils, target_cfg.BOX_CODER)(
                **target_cfg.get("BOX_CODER_CONFIG", {}))
            self.box_layers = _MLP(tuple(cfg.REG_FC),
                                   self.box_coder.code_size,
                                   name="box_layers")
        else:
            self.box_layers = None

    def _part_targets(self, xyz, bidx, box_idx, labels, gt_boxes):
        """(N, 3) part labels for fg points: canonical-frame location
        normalized into [0, 1]."""
        M = gt_boxes.shape[1]
        gt_flat = gt_boxes.reshape(-1, gt_boxes.shape[-1])
        gt_of_point = gt_flat[bidx.astype(jnp.int32) * M + box_idx]
        rel = xyz - gt_of_point[:, 0:3]
        rel = common_utils.rotate_points_along_z(
            rel[:, None, :], -gt_of_point[:, 6])[:, 0, :]
        part = rel / jnp.clip(gt_of_point[:, 3:6], 1e-4, None) + 0.5
        return jnp.where((labels > 0)[:, None],
                         jnp.clip(part, 0.0, 1.0), 0.0)

    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["point_features"]
        cls_logits = self.cls_layers(feats, train)
        part_logits = self.part_reg_layers(feats, train)
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_logits).max(-1)
        batch_dict["point_part_offset"] = jax.nn.sigmoid(part_logits)
        if self.box_layers is not None:
            box_preds = self.box_layers(feats, train)
        if train:
            lw = self.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
            xyz, bidx = self._point_xyz(batch_dict)
            labels, box_idx = self.assign_targets(
                xyz, bidx, batch_dict["gt_boxes"],
                extra_width=tuple(self.model_cfg.get(
                    "TARGET_CONFIG", {}).get("GT_EXTRA_WIDTH",
                                             (0.2, 0.2, 0.2))))
            valid = batch_dict["point_coords"][:, 0] >= 0
            cared = (labels >= 0) & valid
            pos = (labels > 0) & valid
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None),
                                     self.num_class + 1)[..., 1:]
            w = cared.astype(jnp.float32) / jnp.maximum(pos.sum(), 1.0)
            cls_loss = loss_utils.sigmoid_focal_cls_loss(
                cls_logits[None], one_hot[None], w[None]).sum() \
                * lw["point_cls_weight"]
            part_targets = self._part_targets(xyz, bidx, box_idx, labels,
                                              batch_dict["gt_boxes"])
            part_prob = jnp.clip(jax.nn.sigmoid(part_logits), 1e-6, 1 - 1e-6)
            bce = -(part_targets * jnp.log(part_prob)
                    + (1 - part_targets) * jnp.log(1 - part_prob))
            part_loss = (bce.sum(-1) * pos.astype(jnp.float32)).sum() \
                / (3.0 * jnp.maximum(pos.sum(), 1.0)) * lw["point_part_weight"]
            total = cls_loss + part_loss
            if self.box_layers is not None:
                M = batch_dict["gt_boxes"].shape[1]
                gt_flat = batch_dict["gt_boxes"].reshape(
                    -1, batch_dict["gt_boxes"].shape[-1])
                gt_of_point = gt_flat[bidx.astype(jnp.int32) * M + box_idx]
                targets = self.box_coder.encode(
                    gt_of_point[:, :7], xyz, jnp.clip(labels, 1, None))
                diff = jnp.abs(box_preds - targets) * pos[:, None]
                box_loss = diff.sum() / jnp.maximum(pos.sum(), 1.0) \
                    * lw.get("point_box_weight", 1.0)
                total = total + box_loss
                batch_dict.setdefault("tb_dict", {})["point_box_loss"] = \
                    box_loss
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + total
            batch_dict.setdefault("tb_dict", {}).update(
                {"point_cls_loss": cls_loss, "point_part_loss": part_loss})
        return batch_dict
