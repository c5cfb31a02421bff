from .detector3d_template import Detector3DTemplate, DatasetInfo  # noqa: F401
from .pointpillar import PointPillar  # noqa: F401
from .centerpoint import CenterPoint  # noqa: F401
from .second_net import SECONDNet  # noqa: F401
from .voxelnext import VoxelNeXt  # noqa: F401
from .transfusion import TransFusion  # noqa: F401
from .pillarnet import PillarNet  # noqa: F401
from .parta2_net import PartA2Net  # noqa: F401
from .pv_rcnn import PVRCNN  # noqa: F401
from .point_rcnn import PointRCNN  # noqa: F401
from .voxel_rcnn import VoxelRCNN  # noqa: F401
from .second_net_iou import SECONDNetIoU  # noqa: F401
from .bevfusion import BevFusion  # noqa: F401
from .caddn import CaDDN  # noqa: F401
from .pv_rcnn_plusplus import PVRCNNPlusPlus  # noqa: F401
from .mppnet import MPPNet, MPPNetE2E  # noqa: F401

__all__ = {
    "Detector3DTemplate": Detector3DTemplate,
    "PointPillar": PointPillar,
    "CenterPoint": CenterPoint,
    "SECONDNet": SECONDNet,
    "VoxelNeXt": VoxelNeXt,
    "TransFusion": TransFusion,
    "PillarNet": PillarNet,
    "PartA2Net": PartA2Net,
    "PVRCNN": PVRCNN,
    "PointRCNN": PointRCNN,
    "VoxelRCNN": VoxelRCNN,
    "SECONDNetIoU": SECONDNetIoU,
    "BevFusion": BevFusion,
    "CaDDN": CaDDN,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "MPPNet": MPPNet,
    "MPPNetE2E": MPPNetE2E,
}


def register(name, cls):
    __all__[name] = cls
