"""Detector3DTemplate — topological module-slot builder + generic post-processing.

Parity with reference ``detectors/detector3d_template.py:14`` (415 LoC): the
8-slot builder (vfe, backbone_3d, map_to_bev, pfe, backbone_2d, dense_head,
point_head, roi_head), sigmoid+NMS ``post_processing:178``, and recall
bookkeeping (here in ``q3d_tpu.utils.eval_utils`` host-side).  Checkpoint
loading with spconv layout adaptation lives in
``q3d_tpu.utils.checkpoint`` (reference ``:330-415``).

TPU re-design: the whole forward INCLUDING decode + NMS is one jittable
function over static-shape batches; post-processing returns fixed-size
(B, POST_MAX) arrays with validity masks instead of per-frame ragged lists.
"""

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..model_utils import model_nms_utils


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    """Static dataset facts a model build needs (replaces passing the torch
    dataset object into build_network)."""
    class_names: Tuple[str, ...]
    num_point_features: int
    grid_size: Tuple[int, int, int]            # [nx, ny, nz]
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]
    depth_downsample_factor: Optional[int] = None


class Detector3DTemplate(nn.Module):
    model_cfg: Any
    num_class: int
    dataset: DatasetInfo

    @property
    def class_names(self):
        return self.dataset.class_names

    # ---------------------------------------------------------------- build
    def build_networks(self):
        """Construct the cfg-driven module list; returns (modules, info)."""
        from .. import builder as B

        info = {
            "num_rawpoint_features": self.dataset.num_point_features,
            "num_point_features": self.dataset.num_point_features,
            "grid_size": self.dataset.grid_size,
            "point_cloud_range": self.dataset.point_cloud_range,
            "voxel_size": self.dataset.voxel_size,
            "depth_downsample_factor": self.dataset.depth_downsample_factor,
        }
        modules = {}
        cfg = self.model_cfg

        if cfg.get("VFE", None) is not None:
            vfe = B.build_vfe(cfg.VFE, info, self.dataset)
            info["num_point_features"] = vfe.get_output_feature_dim()
            modules["vfe"] = vfe
        if cfg.get("BACKBONE_3D", None) is not None:
            b3d = B.build_backbone_3d(cfg.BACKBONE_3D, info, self.dataset)
            info["num_point_features"] = b3d.num_point_features
            info["backbone_channels"] = getattr(b3d, "backbone_channels", None)
            modules["backbone_3d"] = b3d
        if cfg.get("MAP_TO_BEV", None) is not None:
            m2b = B.build_map_to_bev(cfg.MAP_TO_BEV, info, self.dataset)
            info["num_bev_features"] = m2b.num_bev_features if hasattr(
                m2b, "num_bev_features") else cfg.MAP_TO_BEV.NUM_BEV_FEATURES
            modules["map_to_bev_module"] = m2b
        if cfg.get("BACKBONE_2D", None) is not None:
            b2d = B.build_backbone_2d(cfg.BACKBONE_2D,
                                      info.get("num_bev_features", 0))
            info["num_bev_features"] = b2d.num_bev_features
            modules["backbone_2d"] = b2d
        if cfg.get("PFE", None) is not None:
            pfe = B.build_pfe(cfg.PFE, info, self.dataset)
            info["num_point_features"] = pfe.num_point_features
            modules["pfe"] = pfe
        if cfg.get("DENSE_HEAD", None) is not None:
            modules["dense_head"] = B.build_dense_head(
                cfg.DENSE_HEAD, info, self.dataset, self.num_class,
                predict_boxes_when_training=cfg.get("ROI_HEAD", None) is not None)
        if cfg.get("POINT_HEAD", None) is not None:
            modules["point_head"] = B.build_point_head(
                cfg.POINT_HEAD, info, self.dataset, self.num_class,
                predict_boxes_when_training=cfg.get("ROI_HEAD", None) is not None)
        if cfg.get("ROI_HEAD", None) is not None:
            modules["roi_head"] = B.build_roi_head(
                cfg.ROI_HEAD, info, self.dataset, self.num_class)
        return modules, info

    # ---------------------------------------------------------- proposals
    def proposal_layer(self, batch_dict, nms_config):
        """First-stage proposals for two-stage detectors: per-sample NMS over
        the dense head's decoded boxes -> fixed-size (B, R) rois
        (reference roi_head_template.proposal_layer)."""
        from ..model_utils import model_nms_utils

        cls_preds = batch_dict["batch_cls_preds"]          # (B, Na, C)
        box_preds = batch_dict["batch_box_preds"]
        if not batch_dict.get("cls_preds_normalized", False):
            cls_preds = jax.nn.sigmoid(cls_preds)

        def one(scores, boxes):
            max_scores = jnp.max(scores, axis=-1)
            labels = jnp.argmax(scores, axis=-1) + 1
            idx, valid = model_nms_utils.class_agnostic_nms(
                max_scores, boxes[:, :7], nms_config)
            return boxes[idx][:, :7], max_scores[idx], labels[idx], valid

        rois, roi_scores, roi_labels, roi_valid = jax.vmap(one)(
            cls_preds, box_preds)
        batch_dict["rois"] = rois
        batch_dict["roi_scores"] = roi_scores
        batch_dict["roi_labels"] = roi_labels
        batch_dict["roi_valid"] = roi_valid
        batch_dict["has_class_labels"] = True
        return batch_dict

    # ------------------------------------------------------------ inference
    def post_processing(self, batch_dict):
        """Generic sigmoid + NMS (reference :178-284), static shapes."""
        post_cfg = self.model_cfg.POST_PROCESSING
        nms_cfg = post_cfg.NMS_CONFIG
        cls_preds = batch_dict["batch_cls_preds"]           # (B, Na, C)
        box_preds = batch_dict["batch_box_preds"]           # (B, Na, 7+)
        if not batch_dict.get("cls_preds_normalized", False):
            cls_preds = jax.nn.sigmoid(cls_preds)

        if nms_cfg.get("MULTI_CLASSES_NMS", False):
            def one(scores, boxes):
                idx, valid, s = model_nms_utils.multi_classes_nms(
                    scores, boxes, nms_cfg, post_cfg.SCORE_THRESH)
                # flatten class-wise results into one ranked list
                C, P = idx.shape
                labels = jnp.broadcast_to(jnp.arange(1, C + 1)[:, None], (C, P))
                flat_s = jnp.where(valid, s, -1.0).reshape(-1)
                k = nms_cfg.NMS_POST_MAXSIZE
                top_s, top_i = jax.lax.top_k(flat_s, k)
                sel = idx.reshape(-1)[top_i]
                return (boxes[sel], top_s, labels.reshape(-1)[top_i],
                        top_s > 0)
        else:
            def one(scores, boxes):
                max_scores = jnp.max(scores, axis=-1)
                labels = jnp.argmax(scores, axis=-1) + 1
                idx, valid = model_nms_utils.class_agnostic_nms(
                    max_scores, boxes[:, :7], nms_cfg,
                    post_cfg.get("SCORE_THRESH", None))
                return (boxes[idx], max_scores[idx], labels[idx], valid)

        final_boxes, final_scores, final_labels, final_valid = jax.vmap(one)(
            cls_preds, box_preds)
        batch_dict["final_boxes"] = final_boxes
        batch_dict["final_scores"] = final_scores
        batch_dict["final_labels"] = final_labels
        batch_dict["final_valid"] = final_valid
        return batch_dict
