from .mean_vfe import MeanVFE  # noqa: F401
from .pillar_vfe import PillarVFE  # noqa: F401
from .dynamic_mean_vfe import DynamicMeanVFE  # noqa: F401
from .dynamic_pillar_vfe import DynamicPillarVFE  # noqa: F401
from .dynamic_voxel_vfe import DynamicVoxelVFE  # noqa: F401
from .image_vfe import ImageVFE  # noqa: F401
