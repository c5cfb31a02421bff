# sparse 3D backbones land with the sparse-conv engine
try:
    from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x  # noqa: F401
except ImportError:  # engine not built yet
    VoxelBackBone8x = VoxelResBackBone8x = None
