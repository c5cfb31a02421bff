"""2D sparse pillar backbones (PillarNet).

Parity with reference ``backbones_3d/spconv_backbone_2d.py``
(``PillarBackBone8x:114``, ``PillarRes18BackBone8x:207``): sparse 2D conv
stages 32→64→128→256 at strides 1/2/4/8 over the pillar grid, a DENSE conv5
stage at stride 16 after ``.dense()``, multi-scale outputs for
``BaseBEVBackboneV1``.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.spconv import SparseConvTensor, SubMConv2d, SparseConv2d, \
    SparseBatchNorm
from ..layers import Conv2d, BatchNorm, relu


class _S2(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    conv_type: str = "subm"
    indice_key: str = ""

    @nn.compact
    def __call__(self, st, cache, train=False):
        if self.conv_type == "subm":
            st = SubMConv2d(self.out_channels, self.kernel_size, 1,
                            self.padding, indice_key=self.indice_key,
                            name="conv")(st, cache)
        else:
            st = SparseConv2d(self.out_channels, self.kernel_size, self.stride,
                              self.padding, indice_key=self.indice_key,
                              name="conv")(st, cache)
        st = SparseBatchNorm(name="norm")(st, train)
        return st.replace_feature(jnp.maximum(st.features, 0.0))


class _D2(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = Conv2d(self.out_channels, 3, self.stride, 1, use_bias=False,
                   name="conv")(x)
        x = BatchNorm(name="norm")(x, train)
        return relu(x)


class Sparse2DBasicBlock(nn.Module):
    """Residual pair of SubMConv2d (reference SparseBasicBlock 2D)."""
    channels: int
    indice_key: str = ""

    @nn.compact
    def __call__(self, st, cache, train=False):
        identity = st.features
        st = SubMConv2d(self.channels, 3, 1, 1, use_bias=True,
                        indice_key=self.indice_key, name="conv1")(st, cache)
        st = SparseBatchNorm(name="bn1")(st, train)
        st = st.replace_feature(jnp.maximum(st.features, 0.0))
        st = SubMConv2d(self.channels, 3, 1, 1, use_bias=True,
                        indice_key=self.indice_key, name="conv2")(st, cache)
        st = SparseBatchNorm(name="bn2")(st, train)
        return st.replace_feature(jnp.maximum(st.features + identity, 0.0))


def _make_pillar_tensor(batch_dict, sparse_shape):
    feats = batch_dict["pillar_features"]         # (P, C) flattened
    coords = batch_dict["pillar_coords"]          # (P, 3) [b, y, x]
    # batch size must be STATIC under jit: take it from an array shape
    B = int(batch_dict["pillar_batch_size"]) if "pillar_batch_size" in batch_dict \
        else int(batch_dict["points"].shape[0])
    return SparseConvTensor(features=feats, indices=coords.astype(jnp.int32),
                            spatial_shape=tuple(int(s) for s in sparse_shape),
                            batch_size=B).sort_rows()


class PillarBackBone8x(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]
    voxel_size: Tuple[float, float, float] = (0.075, 0.075, 8.0)
    point_cloud_range: Tuple[float, ...] = ()

    num_point_features: int = 256

    @property
    def sparse_shape(self):
        nx, ny, _ = self.grid_size
        return (int(ny), int(nx))

    @property
    def backbone_channels(self):
        return {"x_conv1": 32, "x_conv2": 64, "x_conv3": 128,
                "x_conv4": 256, "x_conv5": 256}

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cache = dict(batch_dict.get("rulebooks", {}))
        cache["__host_keys__"] = frozenset(batch_dict.get("rulebooks", {}))
        st = _make_pillar_tensor(batch_dict, self.sparse_shape)
        x1 = _S2(32, 3, 1, 1, "subm", "subm1", name="conv1_0")(st, cache, train)
        x1 = _S2(32, 3, 1, 1, "subm", "subm1", name="conv1_1")(x1, cache, train)

        x2 = _S2(64, 3, 2, 1, "spconv", "spconv2", name="conv2_0")(x1, cache, train)
        x2 = _S2(64, 3, 1, 1, "subm", "subm2", name="conv2_1")(x2, cache, train)
        x2 = _S2(64, 3, 1, 1, "subm", "subm2", name="conv2_2")(x2, cache, train)

        x3 = _S2(128, 3, 2, 1, "spconv", "spconv3", name="conv3_0")(x2, cache, train)
        x3 = _S2(128, 3, 1, 1, "subm", "subm3", name="conv3_1")(x3, cache, train)
        x3 = _S2(128, 3, 1, 1, "subm", "subm3", name="conv3_2")(x3, cache, train)

        x4 = _S2(256, 3, 2, 1, "spconv", "spconv4", name="conv4_0")(x3, cache, train)
        x4 = _S2(256, 3, 1, 1, "subm", "subm4", name="conv4_1")(x4, cache, train)
        x4 = _S2(256, 3, 1, 1, "subm", "subm4", name="conv4_2")(x4, cache, train)

        x4d = x4.dense()                              # (B, H/8, W/8, 256)
        x5 = _D2(256, 2, name="conv5_0")(x4d, train)
        x5 = _D2(256, 1, name="conv5_1")(x5, train)
        x5 = _D2(256, 1, name="conv5_2")(x5, train)

        batch_dict["multi_scale_2d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3,
            "x_conv4": x4d, "x_conv5": x5}
        batch_dict["multi_scale_2d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
            "x_conv5": 16}
        return batch_dict


class PillarRes18BackBone8x(PillarBackBone8x):
    """Residual variant (reference :207)."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cache = dict(batch_dict.get("rulebooks", {}))
        cache["__host_keys__"] = frozenset(batch_dict.get("rulebooks", {}))
        st = _make_pillar_tensor(batch_dict, self.sparse_shape)
        x1 = Sparse2DBasicBlock(32, "res1", name="conv1_0")(st, cache, train)
        x1 = Sparse2DBasicBlock(32, "res1", name="conv1_1")(x1, cache, train)

        x2 = _S2(64, 3, 2, 1, "spconv", "spconv2", name="conv2_0")(x1, cache, train)
        x2 = Sparse2DBasicBlock(64, "res2", name="conv2_1")(x2, cache, train)
        x2 = Sparse2DBasicBlock(64, "res2", name="conv2_2")(x2, cache, train)

        x3 = _S2(128, 3, 2, 1, "spconv", "spconv3", name="conv3_0")(x2, cache, train)
        x3 = Sparse2DBasicBlock(128, "res3", name="conv3_1")(x3, cache, train)
        x3 = Sparse2DBasicBlock(128, "res3", name="conv3_2")(x3, cache, train)

        x4 = _S2(256, 3, 2, 1, "spconv", "spconv4", name="conv4_0")(x3, cache, train)
        x4 = Sparse2DBasicBlock(256, "res4", name="conv4_1")(x4, cache, train)
        x4 = Sparse2DBasicBlock(256, "res4", name="conv4_2")(x4, cache, train)

        x4d = x4.dense()
        x5 = _D2(256, 2, name="conv5_0")(x4d, train)
        x5 = _D2(256, 1, name="conv5_1")(x5, train)
        x5 = _D2(256, 1, name="conv5_2")(x5, train)

        batch_dict["multi_scale_2d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3,
            "x_conv4": x4d, "x_conv5": x5}
        batch_dict["multi_scale_2d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
            "x_conv5": 16}
        return batch_dict
