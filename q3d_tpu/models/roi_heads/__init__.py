from .roi_head_template import RoIHeadTemplate  # noqa: F401
from .parta2_head import PartA2FCHead  # noqa: F401
from .pvrcnn_head import PVRCNNHead  # noqa: F401
from .pointrcnn_head import PointRCNNHead  # noqa: F401
from .voxelrcnn_head import VoxelRCNNHead  # noqa: F401
from .second_head import SECONDHead  # noqa: F401
from .mppnet_head import MPPNetHead  # noqa: F401

__all__ = {
    "MPPNetHead": MPPNetHead,
    "RoIHeadTemplate": RoIHeadTemplate,
    "PartA2FCHead": PartA2FCHead,
    "PVRCNNHead": PVRCNNHead,
    "PointRCNNHead": PointRCNNHead,
    "VoxelRCNNHead": VoxelRCNNHead,
    "SECONDHead": SECONDHead,
}
