"""Loss functions (pure JAX, jittable).

Capability parity with reference ``pcdet/utils/loss_utils.py`` (649 LoC):
sigmoid focal cls loss (:10), weighted smooth-L1 (:76), weighted L1,
cross-entropy (:183), CenterNet gaussian focal + reg losses (:335,:397) and
their sparse-tensor variants (:422-563), corner loss (:211), IoU-rectified L1
(:611).  All functions take explicit weight tensors and return per-element
losses so callers control the reduction, matching the reference's semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np


def sigmoid_focal_cls_loss(pred, target, weights, alpha=0.25, gamma=2.0):
    """Sigmoid focal loss (RetinaNet form, reference SigmoidFocalClassificationLoss).

    pred: (B, N, C) raw logits; target: (B, N, C) one-hot; weights: (B, N) or
    (B, N, C). Returns (B, N, C).
    """
    pred_sigmoid = jax.nn.sigmoid(pred)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    # numerically-stable BCE with logits
    bce = jnp.clip(pred, 0, None) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = focal_weight * bce
    if weights.ndim == 2 or (weights.ndim + 1 == pred.ndim):
        weights = weights[..., None]
    return loss * weights


def smooth_l1_loss(diff, beta=1.0 / 9.0):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


class WeightedSmoothL1Loss:
    """Reference WeightedSmoothL1Loss: optional per-code weights, (B,N) weights."""

    def __init__(self, beta=1.0 / 9.0, code_weights=None):
        self.beta = beta
        self.code_weights = (np.asarray(code_weights, np.float32)
                             if code_weights is not None else None)

    def __call__(self, pred, target, weights=None):
        target = jnp.where(jnp.isnan(target), pred, target)
        diff = pred - target
        if self.code_weights is not None:
            diff = diff * jnp.asarray(self.code_weights)
        loss = smooth_l1_loss(diff, self.beta)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


class WeightedL1Loss:
    def __init__(self, code_weights=None):
        self.code_weights = (np.asarray(code_weights, np.float32)
                             if code_weights is not None else None)

    def __call__(self, pred, target, weights=None):
        diff = pred - target
        if self.code_weights is not None:
            diff = diff * jnp.asarray(self.code_weights)
        loss = jnp.abs(diff)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


def weighted_cross_entropy(pred, target, weights):
    """pred: (B, N, C) logits, target: (B, N, C) one-hot, weights: (B, N)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    loss = -(target * logp).sum(-1)
    return loss * weights


# --------------------------------------------------------------------------
# CenterNet-style losses
# --------------------------------------------------------------------------

def _neg_loss(pred, gt, mask=None):
    """Modified gaussian focal loss (CornerNet/CenterNet form).

    pred: sigmoid heatmap (B, C, H, W) or (B, N, C); gt: same shape with
    gaussian-splatted targets; positives are cells with gt == 1.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)
    pred = jnp.clip(pred, 1e-4, 1 - 1e-4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds
    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
    num_pos = pos_inds.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


class FocalLossCenterNet:
    """Reference loss_utils.FocalLossCenterNet (:335)."""

    def __call__(self, out, target, mask=None):
        return _neg_loss(out, target, mask=mask)


class RegLossCenterNet:
    """L1 regression at gathered heatmap-peak locations
    (reference loss_utils.RegLossCenterNet:397).

    pred: (B, C, H, W) or already-gathered (B, K, C); ind: (B, K) flat spatial
    indices; mask: (B, K); target: (B, K, C).
    """

    @staticmethod
    def _gather_feat(feat, ind):
        # feat: (B, H*W, C), ind: (B, K) -> (B, K, C)
        return jnp.take_along_axis(feat, ind[..., None], axis=1)

    def __call__(self, pred, mask, ind, target):
        if pred.ndim == 4:
            b, c = pred.shape[0], pred.shape[1]
            feat = pred.reshape(b, c, -1).transpose(0, 2, 1)  # (B, HW, C)
            pred = self._gather_feat(feat, ind)
        m = mask[..., None].astype(pred.dtype)
        loss = jnp.abs(pred * m - target * m)
        return loss.sum() / jnp.maximum(m.sum(), 1e-4)


class FocalLossSparse:
    """Gaussian focal loss over (N, C) sparse voxel heatmaps
    (reference loss_utils.FocalLossSparse:422)."""

    def __call__(self, pred, gt, valid=None):
        pos_inds = (gt == 1.0).astype(pred.dtype)
        neg_inds = (gt < 1.0).astype(pred.dtype)
        if valid is not None:
            v = valid[..., None].astype(pred.dtype)
            pos_inds = pos_inds * v
            neg_inds = neg_inds * v
        neg_weights = jnp.power(1.0 - gt, 4)
        pred = jnp.clip(pred, 1e-4, 1 - 1e-4)
        pos_loss = (jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds).sum()
        neg_loss = (jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds).sum()
        num_pos = pos_inds.sum()
        return jnp.where(num_pos == 0, -neg_loss,
                         -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


class RegLossSparse:
    """L1 regression over gathered sparse-voxel predictions
    (reference loss_utils.RegLossSparse:463)."""

    def __call__(self, pred, mask, ind, target):
        # pred: (N, C) voxel predictions; ind: (B, K) indices into N;
        # mask: (B, K); target: (B, K, C)
        gathered = pred[ind]                                  # (B, K, C)
        m = mask[..., None].astype(pred.dtype)
        loss = jnp.abs(gathered * m - target * m)
        return loss.sum() / jnp.maximum(m.sum(), 1e-4)


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """Corner-distance loss with heading-flip minimum (reference :211).

    pred_boxes/gt_boxes: (N, 7) -> (N,) per-box loss.
    """
    from . import box_utils
    pred_corners = box_utils.boxes_to_corners_3d(pred_boxes)
    gt_corners = box_utils.boxes_to_corners_3d(gt_boxes)
    gt_flip = jnp.concatenate([gt_boxes[:, 0:6],
                               (gt_boxes[:, 6:7] + np.pi)], axis=-1)
    gt_corners_flip = box_utils.boxes_to_corners_3d(gt_flip)
    d = jnp.linalg.norm(pred_corners - gt_corners, axis=-1)
    d_flip = jnp.linalg.norm(pred_corners - gt_corners_flip, axis=-1)
    corner_dist = jnp.minimum(d, d_flip)
    return smooth_l1_loss(corner_dist, beta=1.0).mean(axis=1)


class IouRegLossSparse:
    """DIoU-style rectification loss on decoded sparse boxes
    (reference loss_utils.IouRegLossSparse:638, simplified to axis-aligned
    center-distance DIoU like the reference's bbox3d_overlaps_diou)."""

    def __call__(self, box_pred, mask, ind, box_gt):
        pred = box_pred[ind]                                  # (B, K, 7)
        m = mask.astype(box_pred.dtype)
        diou = _boxes3d_diou(pred.reshape(-1, pred.shape[-1]),
                             box_gt.reshape(-1, box_gt.shape[-1]))
        loss = (1.0 - diou.reshape(m.shape)) * m
        return loss.sum() / jnp.maximum(m.sum(), 1e-4)


def _boxes3d_diou(boxes_a, boxes_b):
    """Axis-aligned 3D DIoU between paired boxes (N, 7)."""
    min_a = boxes_a[:, 0:3] - boxes_a[:, 3:6] / 2
    max_a = boxes_a[:, 0:3] + boxes_a[:, 3:6] / 2
    min_b = boxes_b[:, 0:3] - boxes_b[:, 3:6] / 2
    max_b = boxes_b[:, 0:3] + boxes_b[:, 3:6] / 2
    inter = jnp.clip(jnp.minimum(max_a, max_b) - jnp.maximum(min_a, min_b), 0, None)
    vol_i = inter.prod(-1)
    vol_a = boxes_a[:, 3:6].prod(-1)
    vol_b = boxes_b[:, 3:6].prod(-1)
    iou = vol_i / jnp.clip(vol_a + vol_b - vol_i, 1e-6, None)
    center_d2 = ((boxes_a[:, 0:3] - boxes_b[:, 0:3]) ** 2).sum(-1)
    hull = jnp.maximum(max_a, max_b) - jnp.minimum(min_a, min_b)
    diag2 = (hull ** 2).sum(-1)
    return iou - center_d2 / jnp.clip(diag2, 1e-6, None)


def compute_fg_mask(gt_boxes2d, shape, downsample_factor=1):
    """Foreground pixel mask from 2D box labels (reference
    ``loss_utils.compute_fg_mask:237``, vectorized — the reference loops
    boxes and slices; XLA wants one broadcast compare).

    gt_boxes2d: (B, N, 4) [u1, v1, u2, v2] in full-resolution pixels
    (zero rows = padding); shape: (B, H, W) of the downsampled depth map.
    Box corners are floored/ceiled AFTER the downsample divide, matching
    the reference order."""
    b, h, w = shape
    boxes = gt_boxes2d / downsample_factor
    u1 = jnp.floor(boxes[..., 0])
    v1 = jnp.floor(boxes[..., 1])
    u2 = jnp.ceil(boxes[..., 2])
    v2 = jnp.ceil(boxes[..., 3])
    live = (gt_boxes2d[..., 2] > gt_boxes2d[..., 0]) & \
           (gt_boxes2d[..., 3] > gt_boxes2d[..., 1])        # (B, N)
    uu = jnp.arange(w, dtype=boxes.dtype)
    vv = jnp.arange(h, dtype=boxes.dtype)
    in_u = (uu[None, None, :] >= u1[..., None]) & \
           (uu[None, None, :] < u2[..., None])              # (B, N, W)
    in_v = (vv[None, None, :] >= v1[..., None]) & \
           (vv[None, None, :] < v2[..., None])              # (B, N, H)
    fg = jnp.einsum("bnh,bnw->bhw",
                    (in_v & live[..., None]).astype(jnp.float32),
                    in_u.astype(jnp.float32)) > 0
    return fg


def bin_depths_target(depth_map, mode, depth_min, depth_max, num_bins):
    """Depth map [m] -> integer bin target with the out-of-range overflow
    bin (reference ``transform_utils.bin_depths:56`` with target=True):
    indices outside [0, num_bins] or non-finite land in bin num_bins."""
    from ..models.backbones_3d.vfe.image_vfe import depth_bin_index
    idx = depth_bin_index(depth_map, mode, depth_min, depth_max, num_bins)
    bad = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx)
    return jnp.where(bad, num_bins, idx).astype(jnp.int32)


def focal_loss_sparse_labels(logits, target, alpha=0.25, gamma=2.0):
    """Per-pixel multi-class focal loss, kornia ``FocalLoss`` semantics
    (reduction='none', scalar alpha): -alpha * (1 - p_t)^gamma * log p_t
    over integer class targets.  logits (..., C); target (...) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    return -alpha * (1.0 - pt) ** gamma * logpt


def ddn_loss(depth_logits, depth_maps, gt_boxes2d, disc_cfg, weight=3.0,
             alpha=0.25, gamma=2.0, fg_weight=13.0, bg_weight=1.0,
             downsample_factor=1):
    """Depth-distribution-network loss (reference
    ``ffn/ddn_loss/ddn_loss.py:1-75`` + ``balancer.py:1-50``): bin the
    lidar-derived depth map into D+1 classes (incl. overflow), per-pixel
    focal CE against the DDN logits, then foreground/background balancing
    from 2D boxes.  Both partial sums divide by the TOTAL pixel count
    (reference Balancer: num_pixels = fg + bg), so the result equals
    mean(loss * per-pixel weights).

    depth_logits: (B, H, W, D+1) — channels-last (reference is NCHW).
    Returns (scalar loss, tb_dict)."""
    target = bin_depths_target(depth_maps, **disc_cfg)
    loss = focal_loss_sparse_labels(depth_logits, target, alpha, gamma)
    fg = compute_fg_mask(gt_boxes2d, loss.shape, downsample_factor)
    fgf = fg.astype(loss.dtype)
    num_pixels = float(np.prod(loss.shape))
    fg_loss = (loss * fgf).sum() * fg_weight / num_pixels
    bg_loss = (loss * (1.0 - fgf)).sum() * bg_weight / num_pixels
    total = (fg_loss + bg_loss) * weight
    return total, {"ddn_loss": total, "fg_loss": fg_loss, "bg_loss": bg_loss}
