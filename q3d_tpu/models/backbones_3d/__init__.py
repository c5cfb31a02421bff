from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x  # noqa: F401
from .spconv_backbone_voxelnext import VoxelResBackBone8xVoxelNeXt  # noqa: F401
from .spconv_unet import UNetV2  # noqa: F401
from .spconv_backbone_2d import PillarBackBone8x, PillarRes18BackBone8x  # noqa: F401
from .dsvt import DSVT  # noqa: F401
from .pointnet2_backbone import PointNet2MSG  # noqa: F401
from .spconv_backbone_focal import VoxelBackBone8xFocal  # noqa: F401
