"""SECONDNetIoU detector (reference ``detectors/second_net_iou.py``):
SECOND first stage + SECONDHead IoU rectification + class-specific NMS."""

from .detector3d_template import Detector3DTemplate


class SECONDNetIoU(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.map_to_bev_module = modules["map_to_bev_module"]
        self.backbone_2d = modules["backbone_2d"]
        self.dense_head = modules["dense_head"]
        self.roi_head = modules["roi_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.map_to_bev_module(batch_dict, train)
        batch_dict = self.backbone_2d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        nms_key = "TRAIN" if train else "TEST"
        batch_dict = self.proposal_layer(
            batch_dict, self.model_cfg.ROI_HEAD.NMS_CONFIG[nms_key])
        batch_dict = self.roi_head(batch_dict, train)
        return batch_dict
