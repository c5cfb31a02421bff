from .sparse_tensor import SparseConvTensor  # noqa: F401
from .engine import (subm_gather_indices, sparse_conv_downsample,  # noqa: F401
                     gather_conv, inverse_conv_indices)
from .modules import (SubMConv3d, SparseConv3d, SparseInverseConv3d,  # noqa: F401
                      SubMConv2d, SparseConv2d, SparseBatchNorm)
