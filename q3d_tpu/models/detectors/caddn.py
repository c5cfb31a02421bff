"""CaDDN detector (reference ``detectors/caddn.py``): monocular camera ->
ImageVFE (depth-distribution lifting) -> Conv2DCollapse -> BaseBEVBackbone ->
AnchorHeadSingle."""

from .detector3d_template import Detector3DTemplate


class CaDDN(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.map_to_bev_module = modules["map_to_bev_module"]
        self.backbone_2d = modules["backbone_2d"]
        self.dense_head = modules["dense_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.map_to_bev_module(batch_dict, train)
        batch_dict = self.backbone_2d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        if train:
            return batch_dict
        return self.post_processing(batch_dict)
