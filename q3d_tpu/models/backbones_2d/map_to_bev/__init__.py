from .height_compression import HeightCompression  # noqa: F401
from .pointpillar_scatter import PointPillarScatter  # noqa: F401
from .conv2d_collapse import Conv2DCollapse  # noqa: F401
from .pointpillar_scatter3d import PointPillarScatter3d  # noqa: F401
