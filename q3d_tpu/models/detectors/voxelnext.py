"""VoxelNeXt detector (reference ``detectors/voxelnext.py``): MeanVFE ->
VoxelResBackBone8xVoxelNeXt -> VoxelNeXtHead — fully sparse, no dense BEV."""

from .detector3d_template import Detector3DTemplate


class VoxelNeXt(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.dense_head = modules["dense_head"]

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        return batch_dict
