"""PV-RCNN++ detector (reference ``detectors/pv_rcnn_plusplus.py``):
MeanVFE -> VoxelBackBone8x -> HeightCompression -> BaseBEVBackbone ->
CenterHead proposals FIRST, then proposal-centric VoxelSetAbstraction
(SPC keypoint sampling + VectorPool aggregation) -> PointHeadSimple ->
PVRCNNHead (VectorPool ROI grid pooling).

The reference re-runs NMS in ``roi_head.proposal_layer``; here the
CenterHead's own decode+NMS output (``rois``/``roi_scores``/``roi_labels``,
set because ``predict_boxes_when_training``) IS the proposal set — same
boxes, one NMS pass."""

import jax

from .detector3d_template import Detector3DTemplate


class PVRCNNPlusPlus(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.map_to_bev_module = modules["map_to_bev_module"]
        self.backbone_2d = modules["backbone_2d"]
        self.dense_head = modules["dense_head"]
        self.pfe = modules["pfe"]
        self.point_head = modules.get("point_head", None)
        self.roi_head = modules["roi_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.map_to_bev_module(batch_dict, train)
        batch_dict = self.backbone_2d(batch_dict, train)
        # proposals before keypoint sampling (PV-RCNN++ ordering)
        batch_dict = self.dense_head(batch_dict, train)
        if "final_valid" in batch_dict and "roi_valid" not in batch_dict:
            batch_dict["roi_valid"] = batch_dict["final_valid"]
        # proposals are detached in the reference (second stage must not
        # backprop into first-stage box decoding through the pooling coords)
        for k in ("rois", "roi_scores"):
            if k in batch_dict:
                batch_dict[k] = jax.lax.stop_gradient(batch_dict[k])
        batch_dict = self.pfe(batch_dict, train)
        if self.point_head is not None:
            batch_dict = self.point_head(batch_dict, train)
        batch_dict = self.roi_head(batch_dict, train)
        return batch_dict
