"""PointRCNN detector (reference ``detectors/point_rcnn.py``): PointNet2MSG
-> PointHeadBox (per-point proposals) -> PointRCNNHead refinement.

Proposals come from the point head's decoded per-point boxes, NMS'd into
fixed-size rois via the shared proposal machinery.
"""

import jax
import jax.numpy as jnp

from .detector3d_template import Detector3DTemplate


class PointRCNN(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.backbone_3d = modules["backbone_3d"]
        self.point_head = modules["point_head"]
        self.roi_head = modules["roi_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.point_head(batch_dict, train)

        # per-point boxes -> (B, N, ...) batched proposals
        B, N, _ = batch_dict["point_xyz_batched"].shape
        box_preds = batch_dict["point_box_preds"].reshape(B, N, -1)
        cls_preds = batch_dict["point_cls_preds"].reshape(B, N, -1)
        valid = (batch_dict["point_coords"][:, 0] >= 0).reshape(B, N)
        batch_dict["batch_box_preds"] = box_preds
        batch_dict["batch_cls_preds"] = jnp.where(valid[..., None], cls_preds,
                                                  -1e4)
        batch_dict["cls_preds_normalized"] = False
        nms_key = "TRAIN" if train else "TEST"
        batch_dict = self.proposal_layer(
            batch_dict, self.model_cfg.ROI_HEAD.NMS_CONFIG[nms_key])
        batch_dict = self.roi_head(batch_dict, train)
        return batch_dict
