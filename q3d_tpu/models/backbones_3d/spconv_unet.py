"""UNetV2 — sparse encoder/decoder with inverse convs (PartA2 backbone).

Parity with reference ``backbones_3d/spconv_unet.py:49`` (``UNetV2``):
VoxelBackBone8x-style encoder + a decoder that walks back up through
``SparseInverseConv3d`` lateral merges, emitting per-voxel ``point_features``
at stride 1 for the point-wise segmentation head, plus the stride-8 encoded
tensor for the BEV pipeline.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.spconv import (SparseConvTensor, SubMConv3d, SparseInverseConv3d,
                           SparseBatchNorm)
from .spconv_backbone import _SparseConvBNReLU, _make_input_tensor


class _UpBlock(nn.Module):
    """Decoder stage: merge lateral + bottom, transform, inverse-conv up
    (reference UNetV2.UR_block_forward)."""
    out_channels: int
    indice_key: str

    @nn.compact
    def __call__(self, x_bottom, x_lateral, target_indices, target_spatial,
                 stride, padding, kernel, cache, train=False):
        # channel-align bottom features then fuse with the lateral skip
        m = SubMConv3d(x_lateral.num_channels, 3, 1, 1,
                       indice_key=self.indice_key + "_m", name="conv_m")(
            x_bottom, cache)
        m = SparseBatchNorm(name="norm_m")(m, train)
        m = m.replace_feature(jnp.maximum(m.features, 0.0))
        fused = m.replace_feature(m.features + x_lateral.features)
        t = SubMConv3d(x_lateral.num_channels, 3, 1, 1,
                       indice_key=self.indice_key + "_t", name="conv_t")(
            fused, cache)
        t = SparseBatchNorm(name="norm_t")(t, train)
        t = t.replace_feature(jnp.maximum(t.features, 0.0))
        up = SparseInverseConv3d(self.out_channels, kernel, stride, padding,
                                 name="inv_conv")(
            t, target_indices, target_spatial, cache)
        up = SparseBatchNorm(name="norm_up")(up, train)
        return up.replace_feature(jnp.maximum(up.features, 0.0))


class UNetV2(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = ()

    num_point_features: int = 16

    @property
    def sparse_shape(self):
        nx, ny, nz = self.grid_size
        return (int(nz) + 1, int(ny), int(nx))

    @property
    def backbone_channels(self):
        return {"x_conv1": 16, "x_conv2": 32, "x_conv3": 64, "x_conv4": 64}

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cache = dict(batch_dict.get("rulebooks", {}))
        cache["__host_keys__"] = frozenset(batch_dict.get("rulebooks", {}))
        st = _make_input_tensor(batch_dict, self.sparse_shape)
        x = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                              name="conv_input")(st, cache, train)
        x1 = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                               name="conv1_0")(x, cache, train)
        x2 = x1
        for blk in [_SparseConvBNReLU(32, 3, 2, 1, "spconv", "spconv2",
                                      name="conv2_0"),
                    _SparseConvBNReLU(32, 3, 1, 1, "subm", "subm2",
                                      name="conv2_1")]:
            x2 = blk(x2, cache, train)
        x3 = x2
        for blk in [_SparseConvBNReLU(64, 3, 2, 1, "spconv", "spconv3",
                                      name="conv3_0"),
                    _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm3",
                                      name="conv3_1")]:
            x3 = blk(x3, cache, train)
        x4 = x3
        for blk in [_SparseConvBNReLU(64, 3, 2, (0, 1, 1), "spconv", "spconv4",
                                      name="conv4_0"),
                    _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm4",
                                      name="conv4_1")]:
            x4 = blk(x4, cache, train)

        last_pad = self.model_cfg.get("last_pad", 0)
        out = _SparseConvBNReLU(128, (3, 1, 1), (2, 1, 1), last_pad, "spconv",
                                "spconv_down2", name="conv_out")(x4, cache, train)

        # decoder: 8x -> 4x -> 2x -> 1x with inverse convs
        u3 = _UpBlock(64, "up4", name="up4")(
            x4, x4, x3.indices, x3.spatial_shape, 2, (0, 1, 1), 3, cache, train)
        u2 = _UpBlock(32, "up3", name="up3")(
            u3, x3, x2.indices, x2.spatial_shape, 2, 1, 3, cache, train)
        u1 = _UpBlock(16, "up2", name="up2")(
            u2, x2, x1.indices, x1.spatial_shape, 2, 1, 3, cache, train)
        u0 = SubMConv3d(16, 3, 1, 1, indice_key="subm1", name="conv5")(
            u1, cache)
        u0 = SparseBatchNorm(name="norm5")(u0, train)
        u0 = u0.replace_feature(jnp.maximum(u0.features, 0.0))

        batch_dict["encoded_spconv_tensor"] = out
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["point_features"] = u0.features           # (B*V, 16)
        batch_dict["point_coords"] = u0.indices              # (B*V, 4) bzyx
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4}
        return batch_dict
