"""PillarNet detector (reference ``detectors/pillarnet.py``):
DynamicPillarVFE -> PillarBackBone8x (sparse 2D) -> BaseBEVBackboneV1 ->
CenterHead."""

from .detector3d_template import Detector3DTemplate


class PillarNet(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.backbone_2d = modules["backbone_2d"]
        self.dense_head = modules["dense_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.backbone_2d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        return batch_dict
