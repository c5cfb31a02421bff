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
    ``mppnet_memory_bank_e2e.py``): instead of re-cropping all T frames each
    step, a rolling memory of past per-frame proposals is carried in the
    batch under the same ``roi_boxes`` layout — feature-bank caching is a
    host-side concern here (the jitted program is identical), so the head is
    shared."""
    pass
