"""MPPNet detector (reference ``detectors/mppnet.py``): a pure second-stage
refinement model — per-frame first-stage proposals (``roi_boxes``) and the
multi-frame point cloud come from the dataset; the MPPNetHead builds
trajectories, crops points, and refines.  The reference's module_list only
contains the roi_head too (mppnet.py:18-21)."""

from .detector3d_template import Detector3DTemplate


class MPPNet(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.roi_head = modules["roi_head"]

    def __call__(self, batch_dict, train: bool = False):
        return self.roi_head(batch_dict, train)


class MPPNetE2E(MPPNet):
    """Streaming variant (reference ``detectors/mppnet_e2e.py`` +
    ``mppnet_memory_bank_e2e.py``).  Functional re-design of the reference's
    stateful memory bank: the caller carries the rolling per-frame geometry
    feature bank in the batch as ``bank_feats`` (B, T-1, R, P, C); the head
    then crops + pools ONLY the current frame, reuses cached features for
    past frames (gathered through the trajectory matching table), and emits
    the rolled bank as ``bank_feats_out`` for the next step.  Past-frame
    proposals ride the same ``roi_boxes`` (B, T, R, C) layout, rolled
    host-side with scores/labels (reference memory_rois/labels/scores,
    mppnet_e2e.py:47-62)."""
    pass
