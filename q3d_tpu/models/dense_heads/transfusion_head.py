"""TransFusionHead — query-based transformer detection head (LiDAR branch).

Parity with reference ``dense_heads/transfusion_head.py:53-479``: dense
heatmap proposal init with max-pool peak NMS (``predict:151-219``), top-
``NUM_PROPOSALS`` query selection with class embedding, one
``TransformerDecoderLayer`` of cross-attention over the flattened BEV map,
Conv1d ``SeparateHead_Transfusion`` branches, Hungarian-matched training loss
(``target_assigner/hungarian_assigner.py:55`` via a host callback to scipy),
and query-score decode (``decode_bbox:397`` / ``get_bboxes:455``) — no NMS.

The decoder runs on (B, P=200, C) queries vs (B, H·W, C) keys — one batched
MXU attention; the reference's permute dances disappear with the NHWC layout.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils
from ..layers import Conv2d, Conv1d, BatchNorm, relu
from ..model_utils import centernet_utils
from ..model_utils.transfusion_utils import (TransformerDecoderLayer,
                                             clip_sigmoid)


class SeparateHeadTransfusion(nn.Module):
    """Conv1d branch stack over queries (reference transfusion_head.py:15-51)."""
    sep_head_dict: Any
    head_conv: int = 64
    init_bias: float = -2.19
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, P, C)
        out = {}
        for name, spec in self.sep_head_dict.items():
            y = x
            for k in range(int(spec["num_conv"]) - 1):
                y = Conv1d(self.head_conv, 1, use_bias=self.use_bias,
                           name=f"{name}_{k}")(y)
                B, P, C = y.shape
                y = BatchNorm(epsilon=1e-5, momentum=0.1,
                              name=f"{name}_{k}_norm")(
                    y.reshape(B * P, C), train).reshape(B, P, C)
                y = relu(y)
            bias_init = self.init_bias if "heatmap" in name else 0.0
            # final 1x1 conv == Linear over the channel dim
            y = Conv1d(int(spec["out_channels"]), 1, use_bias=True,
                       name=f"{name}_out")(y)
            out[name] = y
        return out


class TransFusionHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Tuple[str, ...]
    grid_size: Tuple[int, int, int]
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]
    predict_boxes_when_training: bool = False

    def setup(self):
        cfg = self.model_cfg
        self.feature_map_stride = cfg.TARGET_ASSIGNER_CONFIG.get(
            "FEATURE_MAP_STRIDE", 8)
        self.dataset_name = cfg.TARGET_ASSIGNER_CONFIG.get("DATASET", "nuScenes")
        hidden = cfg.HIDDEN_CHANNEL
        self.hidden = hidden
        self.num_proposals = cfg.NUM_PROPOSALS
        self.nms_kernel_size = cfg.NMS_KERNEL_SIZE
        bias = cfg.get("USE_BIAS_BEFORE_NORM", False)

        self.shared_conv = Conv2d(hidden, 3, 1, 1, name="shared_conv")
        self.hm_block_conv = Conv2d(hidden, 3, 1, 1, use_bias=bias,
                                    name="heatmap_head_conv")
        self.hm_block_norm = BatchNorm(epsilon=1e-5, momentum=0.1,
                                       name="heatmap_head_norm")
        self.hm_out = Conv2d(self.num_class, 3, 1, 1, bias_init=-2.19,
                             name="heatmap_head_out")
        self.class_encoding = Conv1d(hidden, 1, name="class_encoding")
        self.decoder = TransformerDecoderLayer(
            hidden, cfg.NUM_HEADS, cfg.FFN_CHANNEL, cfg.DROPOUT,
            cfg.ACTIVATION, name="decoder")
        heads = {k: dict(v) for k, v in cfg.SEPARATE_HEAD_CFG.HEAD_DICT.items()}
        heads["heatmap"] = {"out_channels": self.num_class,
                            "num_conv": cfg.NUM_HM_CONV}
        self.prediction_head = SeparateHeadTransfusion(
            sep_head_dict=heads, head_conv=64, use_bias=bias,
            name="prediction_head")

    # ------------------------------ core ----------------------------------

    def predict(self, bev, train: bool = False):
        """bev: (B, H, W, C_in) -> res dict with (B, P, ...) predictions."""
        B, H, W, _ = bev.shape
        lidar_feat = self.shared_conv(bev)                    # (B, H, W, hidden)
        feat_flat = lidar_feat.reshape(B, H * W, self.hidden)

        x = relu(self.hm_block_norm(self.hm_block_conv(lidar_feat), train))
        dense_heatmap = self.hm_out(x)                        # (B, H, W, C)
        heatmap = jax.lax.stop_gradient(jax.nn.sigmoid(dense_heatmap))

        # peak NMS: 3x3 max-pool, border zeroed (reference :165-176)
        pad = self.nms_kernel_size // 2
        pooled = jax.lax.reduce_window(
            heatmap, -jnp.inf, jax.lax.max,
            (1, self.nms_kernel_size, self.nms_kernel_size, 1),
            (1, 1, 1, 1), "VALID")
        local_max = jnp.zeros_like(heatmap)
        local_max = local_max.at[:, pad:H - pad, pad:W - pad, :].set(pooled)
        # small-object classes keep k=1 (their own value)
        small_cls = []
        if self.dataset_name == "nuScenes" and self.num_class > 9:
            small_cls = [8, 9]
        elif self.dataset_name == "Waymo" and self.num_class > 2:
            small_cls = [1, 2]
        for c in small_cls:
            local_max = local_max.at[..., c].set(heatmap[..., c])
        heatmap = heatmap * (heatmap == local_max)

        # top proposals over (class, position), class-major like the reference
        hm_cm = heatmap.reshape(B, H * W, self.num_class).transpose(0, 2, 1)
        flat = hm_cm.reshape(B, -1)                           # (B, C*HW)
        _, top_idx = jax.lax.top_k(flat, self.num_proposals)
        top_class = top_idx // (H * W)                        # (B, P)
        top_spatial = top_idx % (H * W)

        query_feat = jnp.take_along_axis(feat_flat, top_spatial[..., None],
                                         axis=1)              # (B, P, hidden)
        one_hot = jax.nn.one_hot(top_class, self.num_class, dtype=bev.dtype)
        query_feat = query_feat + self.class_encoding(one_hot)

        ys = (top_spatial // W).astype(bev.dtype) + 0.5
        xs = (top_spatial % W).astype(bev.dtype) + 0.5
        query_pos = jnp.stack([xs, ys], axis=-1)              # (B, P, 2) xy
        gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
        gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
        bev_pos = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
        bev_pos = jnp.broadcast_to(bev_pos[None], (B, H * W, 2)).astype(bev.dtype)

        query_feat = self.decoder(query_feat, feat_flat, query_pos, bev_pos,
                                  train)
        res = self.prediction_head(query_feat, train)
        res["center"] = res["center"] + query_pos
        res["query_heatmap_score"] = jnp.take_along_axis(
            hm_cm.transpose(0, 2, 1), top_spatial[..., None], axis=1)  # (B,P,C)
        res["dense_heatmap"] = dense_heatmap
        res["query_labels"] = top_class
        return res

    def decode_boxes(self, res):
        """(B, P, ...) -> boxes (B, P, 7/9); world units."""
        center = res["center"]
        xs = center[..., 0] * self.feature_map_stride * self.voxel_size[0] \
            + self.point_cloud_range[0]
        ys = center[..., 1] * self.feature_map_stride * self.voxel_size[1] \
            + self.point_cloud_range[1]
        dim = jnp.exp(res["dim"])
        rot = jnp.arctan2(res["rot"][..., 0], res["rot"][..., 1])  # (sin, cos)
        parts = [xs[..., None], ys[..., None], res["height"], dim,
                 rot[..., None]]
        if "vel" in res:
            parts.append(res["vel"])
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------ loss ----------------------------------

    def compute_loss(self, res, gt_boxes):
        """Hungarian-matched set loss (reference loss:~250-380)."""
        cfg = self.model_cfg
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        boxes = self.decode_boxes(res)                        # (B, P, 7/9)
        cls_logits = res["heatmap"]                           # (B, P, C)
        scores = jax.nn.sigmoid(jax.lax.stop_gradient(cls_logits))
        B, P = boxes.shape[:2]
        M = gt_boxes.shape[1]

        def assign_host(score_b, boxes_b, gt_b):
            from scipy.optimize import linear_sum_assignment
            gt_valid = gt_b[:, -1] > 0
            n_gt = int(gt_valid.sum())
            assigned = np.full(P, -1, np.int32)
            if n_gt == 0:
                return assigned
            gt = gt_b[:n_gt]
            cls_ids = gt[:, -1].astype(np.int32) - 1
            # cost = cls + center-l2 (simplified from cls/reg/iou costs)
            cls_cost = -score_b[:, cls_ids]                    # (P, n_gt)
            d = np.linalg.norm(boxes_b[:, None, :2] - gt[None, :, :2], axis=-1)
            cost = 0.15 * cls_cost + 0.25 * d
            row, col = linear_sum_assignment(cost)
            assigned[row] = col.astype(np.int32)
            return assigned

        assigned = jax.vmap(
            lambda s, b, g: jax.pure_callback(
                assign_host, jax.ShapeDtypeStruct((P,), jnp.int32),
                s, b, g, vmap_method="sequential"))(scores, boxes, gt_boxes)

        matched = assigned >= 0                                # (B, P)
        safe_assigned = jnp.clip(assigned, 0, M - 1)
        gt_matched = jnp.take_along_axis(gt_boxes, safe_assigned[..., None],
                                         axis=1)               # (B, P, 8+)
        labels = jnp.where(matched, gt_matched[..., -1].astype(jnp.int32) - 1,
                           self.num_class)
        one_hot = jax.nn.one_hot(labels, self.num_class + 1)[..., :-1]
        cls_weights = jnp.ones((B, P)) / jnp.maximum(matched.sum(), 1)
        cls_loss = loss_utils.sigmoid_focal_cls_loss(
            cls_logits, one_hot, cls_weights,
            alpha=cfg.LOSS_CONFIG.LOSS_CLS.alpha,
            gamma=cfg.LOSS_CONFIG.LOSS_CLS.gamma).sum() * lw["cls_weight"]

        # bbox L1 in encoded space
        preds = jnp.concatenate(
            [res["center"], res["height"], res["dim"], res["rot"]]
            + ([res["vel"]] if "vel" in res else []), axis=-1)
        tx = (gt_matched[..., 0] - self.point_cloud_range[0]) \
            / (self.feature_map_stride * self.voxel_size[0])
        ty = (gt_matched[..., 1] - self.point_cloud_range[1]) \
            / (self.feature_map_stride * self.voxel_size[1])
        tgt = jnp.concatenate([
            tx[..., None], ty[..., None], gt_matched[..., 2:3],
            jnp.log(jnp.clip(gt_matched[..., 3:6], 1e-6, None)),
            jnp.sin(gt_matched[..., 6:7]), jnp.cos(gt_matched[..., 6:7]),
            gt_matched[..., 7:preds.shape[-1] - 8 + 7],
        ], axis=-1)
        m = matched[..., None].astype(preds.dtype)
        bbox_loss = (jnp.abs(preds - tgt) * m).sum() \
            / jnp.maximum(m.sum(), 1.0) * lw["bbox_weight"]

        # dense heatmap focal loss vs gaussian targets
        H = res["dense_heatmap"].shape[1]
        W = res["dense_heatmap"].shape[2]

        def one_hm(gt_b):
            cx = (gt_b[:, 0] - self.point_cloud_range[0]) / self.voxel_size[0] \
                / self.feature_map_stride
            cy = (gt_b[:, 1] - self.point_cloud_range[1]) / self.voxel_size[1] \
                / self.feature_map_stride
            dx = gt_b[:, 3] / self.voxel_size[0] / self.feature_map_stride
            dy = gt_b[:, 4] / self.voxel_size[1] / self.feature_map_stride
            r = jnp.maximum(centernet_utils.gaussian_radius(
                dx, dy, self.model_cfg.TARGET_ASSIGNER_CONFIG.GAUSSIAN_OVERLAP)
                .astype(jnp.int32),
                self.model_cfg.TARGET_ASSIGNER_CONFIG.MIN_RADIUS)
            valid = (gt_b[:, -1] > 0) & (dx > 0) & (dy > 0)
            return centernet_utils.splat_gaussians(
                jnp.stack([cx, cy], 1), r,
                gt_b[:, -1].astype(jnp.int32) - 1, valid, self.num_class, H, W)

        hm_target = jax.vmap(one_hm)(gt_boxes)                 # (B, C, H, W)
        hm_pred = clip_sigmoid(res["dense_heatmap"]).transpose(0, 3, 1, 2)
        hm_loss = loss_utils.FocalLossCenterNet()(hm_pred, hm_target) \
            * lw["hm_weight"]

        total = cls_loss + bbox_loss + hm_loss
        return total, {"trans_cls_loss": cls_loss, "trans_bbox_loss": bbox_loss,
                       "trans_hm_loss": hm_loss}

    # ----------------------------- forward --------------------------------

    def __call__(self, batch_dict, train: bool = False):
        res = self.predict(batch_dict["spatial_features_2d"], train)
        if train:
            loss, tb = self.compute_loss(res, batch_dict["gt_boxes"])
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + loss
            batch_dict["tb_dict"] = {**batch_dict.get("tb_dict", {}), **tb}
        if not train or self.predict_boxes_when_training:
            pp = self.model_cfg.POST_PROCESSING
            boxes = self.decode_boxes(res)
            one_hot = jax.nn.one_hot(res["query_labels"], self.num_class)
            score = jax.nn.sigmoid(res["heatmap"]) \
                * res["query_heatmap_score"] * one_hot
            final_scores = score.max(axis=-1)
            final_labels = score.argmax(axis=-1) + 1
            lim = jnp.asarray(list(pp.POST_CENTER_RANGE))
            valid = final_scores > pp.SCORE_THRESH
            valid &= (boxes[..., :3] >= lim[:3]).all(-1)
            valid &= (boxes[..., :3] <= lim[3:6]).all(-1)
            batch_dict["final_boxes"] = boxes
            batch_dict["final_scores"] = final_scores
            batch_dict["final_labels"] = final_labels
            batch_dict["final_valid"] = valid
        return batch_dict
