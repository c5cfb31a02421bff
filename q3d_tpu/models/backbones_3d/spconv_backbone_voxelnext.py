"""VoxelNeXt backbone — fully sparse, no BEV densify.

Parity with reference ``backbones_3d/spconv_backbone_voxelnext.py:69-225``
(``VoxelResBackBone8xVoxelNeXt``): residual stages to stride 8 plus extra
conv5/conv6 downsamples whose voxels are rescaled (indices x2 / x4) and
row-concatenated into the stride-8 set, then z is dropped by summing features
that share a (b, y, x) BEV cell (``bev_out``), followed by a sparse 2D
conv_out + shared_conv.  Our ``bev_out`` is one sort + segment-sum with a
static output capacity.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.spconv import (SparseConvTensor, SubMConv2d, SparseConv2d,
                           SparseBatchNorm)
from ...ops.spconv.sparse_tensor import BIG_KEY
from .spconv_backbone import (_SparseConvBNReLU, SparseBasicBlock,
                              _make_input_tensor)


def bev_sum_pool(st: SparseConvTensor, out_capacity=None):
    """Collapse z: sum features sharing a (b, y, x) cell -> 2D sparse tensor
    (reference bev_out, spconv_backbone_voxelnext.py:151-168)."""
    _, H, W = (int(s) for s in st.spatial_shape)
    M = out_capacity or st.capacity
    bidx = st.indices[:, 0].astype(jnp.int32)
    key = (bidx * H + st.indices[:, 2]) * W + st.indices[:, 3]
    key = jnp.where(st.valid, key, BIG_KEY)
    order = jnp.argsort(key)
    key_s = key[order]
    feat_s = st.features[order]
    first = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
    first = first & (key_s != BIG_KEY)
    seg = jnp.cumsum(first) - 1
    seg = jnp.where(key_s == BIG_KEY, M, jnp.minimum(seg, M))
    feats = jnp.zeros((M + 1, st.num_channels), st.features.dtype) \
        .at[seg].add(feat_s)[:M]
    out_keys = jnp.full(M + 1, BIG_KEY, jnp.int32).at[
        jnp.where(first, seg, M)].set(key_s)[:M]
    b = out_keys // (H * W)
    y = (out_keys // W) % H
    x = out_keys % W
    indices = jnp.stack([jnp.where(out_keys == BIG_KEY, -1, b),
                         jnp.where(out_keys == BIG_KEY, -1, y),
                         jnp.where(out_keys == BIG_KEY, -1, x)], axis=1)
    return SparseConvTensor(features=feats, indices=indices.astype(jnp.int32),
                            spatial_shape=(H, W), batch_size=st.batch_size,
                            sorted_rows=True)


class _Sparse2dConvBNReLU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    conv_type: str = "spconv"
    use_bias: bool = False

    @nn.compact
    def __call__(self, st, cache, train=False):
        if self.conv_type == "subm":
            st = SubMConv2d(self.out_channels, self.kernel_size, 1, self.padding,
                            use_bias=self.use_bias, name="conv")(st, cache)
        else:
            st = SparseConv2d(self.out_channels, self.kernel_size, self.stride,
                              self.padding, use_bias=self.use_bias,
                              name="conv")(st, cache)
        st = SparseBatchNorm(name="norm")(st, train)
        return st.replace_feature(jnp.maximum(st.features, 0.0))


class VoxelResBackBone8xVoxelNeXt(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]
    voxel_size: Tuple[float, float, float] = (0.075, 0.075, 0.2)
    point_cloud_range: Tuple[float, ...] = ()

    @property
    def sparse_shape(self):
        nx, ny, nz = self.grid_size
        return (int(nz) + 1, int(ny), int(nx))

    @property
    def num_point_features(self):
        return int(self.model_cfg.get("OUT_CHANNEL", 128))

    @property
    def backbone_channels(self):
        ch = list(self.model_cfg.get("CHANNELS", [16, 32, 64, 128, 128]))
        return {"x_conv1": ch[0], "x_conv2": ch[1], "x_conv3": ch[2],
                "x_conv4": ch[3]}

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        ks = list(cfg.get("SPCONV_KERNEL_SIZES", [3, 3, 3, 3]))
        ch = list(cfg.get("CHANNELS", [16, 32, 64, 128, 128]))
        out_ch = int(cfg.get("OUT_CHANNEL", 128))
        cache = dict(batch_dict.get("rulebooks", {}))
        cache["__host_keys__"] = frozenset(batch_dict.get("rulebooks", {}))
        st = _make_input_tensor(batch_dict, self.sparse_shape)
        x = _SparseConvBNReLU(ch[0], 3, 1, 1, "subm", "subm1",
                              name="conv_input")(st, cache, train)
        x1 = SparseBasicBlock(ch[0], "res1", name="conv1_0")(x, cache, train)
        x1 = SparseBasicBlock(ch[0], "res1", name="conv1_1")(x1, cache, train)

        x2 = _SparseConvBNReLU(ch[1], ks[0], 2, ks[0] // 2, "spconv", "spconv2",
                               name="conv2_0")(x1, cache, train)
        x2 = SparseBasicBlock(ch[1], "res2", name="conv2_1")(x2, cache, train)
        x2 = SparseBasicBlock(ch[1], "res2", name="conv2_2")(x2, cache, train)

        x3 = _SparseConvBNReLU(ch[2], ks[1], 2, ks[1] // 2, "spconv", "spconv3",
                               name="conv3_0")(x2, cache, train)
        x3 = SparseBasicBlock(ch[2], "res3", name="conv3_1")(x3, cache, train)
        x3 = SparseBasicBlock(ch[2], "res3", name="conv3_2")(x3, cache, train)

        x4 = _SparseConvBNReLU(ch[3], ks[2], 2, ks[2] // 2, "spconv", "spconv4",
                               name="conv4_0")(x3, cache, train)
        x4 = SparseBasicBlock(ch[3], "res4", name="conv4_1")(x4, cache, train)
        x4 = SparseBasicBlock(ch[3], "res4", name="conv4_2")(x4, cache, train)

        x5 = _SparseConvBNReLU(ch[4], ks[3], 2, ks[3] // 2, "spconv", "spconv5",
                               name="conv5_0")(x4, cache, train)
        x5 = SparseBasicBlock(ch[4], "res5", name="conv5_1")(x5, cache, train)
        x5 = SparseBasicBlock(ch[4], "res5", name="conv5_2")(x5, cache, train)

        x6 = _SparseConvBNReLU(ch[4], ks[3], 2, ks[3] // 2, "spconv", "spconv6",
                               name="conv6_0")(x5, cache, train)
        x6 = SparseBasicBlock(ch[4], "res6", name="conv6_1")(x6, cache, train)
        x6 = SparseBasicBlock(ch[4], "res6", name="conv6_2")(x6, cache, train)

        # rescale conv5/conv6 voxels into stride-8 coordinates and merge rows
        # (reference :196-199); feature widths must match (ch[3] == ch[4])
        def upscale(stx, f):
            idx = stx.indices
            scaled = jnp.concatenate([idx[:, :1], idx[:, 1:] * f], axis=1)
            scaled = jnp.where(idx[:, :1] >= 0, scaled, -1)
            return scaled

        merged_feats = jnp.concatenate(
            [x4.features, x5.features, x6.features], axis=0)
        merged_idx = jnp.concatenate(
            [x4.indices, upscale(x5, 2), upscale(x6, 4)], axis=0)
        merged = SparseConvTensor(
            features=merged_feats, indices=merged_idx,
            spatial_shape=x4.spatial_shape, batch_size=x4.batch_size)

        out2d = bev_sum_pool(merged)
        out2d = _Sparse2dConvBNReLU(out_ch, 3, 1, 1, "spconv",
                                    name="conv_out")(out2d, cache, train)
        out2d = _Sparse2dConvBNReLU(out_ch, 3, 1, 1, "subm", use_bias=True,
                                    name="shared_conv")(out2d, cache, train)

        batch_dict["encoded_spconv_tensor"] = out2d
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4}
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        return batch_dict
