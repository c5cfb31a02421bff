from .anchor_head_single import AnchorHeadSingle  # noqa: F401
from .anchor_head_multi import AnchorHeadMulti  # noqa: F401
from .center_head import CenterHead  # noqa: F401
from .voxelnext_head import VoxelNeXtHead  # noqa: F401
from .transfusion_head import TransFusionHead  # noqa: F401
from .point_head import (PointHeadSimple, PointHeadBox,  # noqa: F401
                         PointIntraPartOffsetHead)

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "AnchorHeadMulti": AnchorHeadMulti,
    "CenterHead": CenterHead,
    "VoxelNeXtHead": VoxelNeXtHead,
    "TransFusionHead": TransFusionHead,
    "PointHeadSimple": PointHeadSimple,
    "PointHeadBox": PointHeadBox,
    "PointIntraPartOffsetHead": PointIntraPartOffsetHead,
}


def register(name, cls):
    __all__[name] = cls
