"""Sparse 3D voxel backbones on the TPU gather-GEMM engine.

Parity with reference ``backbones_3d/spconv_backbone.py``:
``VoxelBackBone8x:70`` (4 stages SubM + strided SparseConv, 16->32->64->64,
final (3,1,1)/(2,1,1) z-compression to 128ch) and ``VoxelResBackBone8x:184``
(SparseBasicBlock residual pairs, conv4 at 128ch — the CenterPoint backbone).
sparse_shape = [nz+1, ny, nx] like the reference's ``grid_size[::-1]+[1,0,0]``.

The per-forward ``rulebook_cache`` dict reproduces spconv's ``indice_key``
rulebook sharing: every SubM layer in a stage reuses one binary-search
rulebook; each strided conv builds its output coordinate set once.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.spconv import (SparseConvTensor, SubMConv3d, SparseConv3d,
                           SparseBatchNorm)
from ...ops.spconv.modules import (residency_rule, requant_epilogue,
                                   dequantize_tensor)


class _SparseConvBNReLU(nn.Module):
    """post_act_block equivalent (conv -> BN -> ReLU).

    Under an int8-residency deploy rule (eval only), BN's eval affine +
    ReLU + requantization fold into the conv's epilogue and the block emits
    int8 features directly (``quant.rules.LayerRule.int8_residency``)."""
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    conv_type: str = "subm"
    indice_key: str = ""
    out_capacity: Any = None

    @nn.compact
    def __call__(self, st, cache, train=False):
        kind = "subm_conv3d" if self.conv_type == "subm" else "sparse_conv3d"
        rule = residency_rule(self, "conv", kind) if not train else None
        if self.conv_type == "subm":
            st = SubMConv3d(self.out_channels, self.kernel_size, 1, self.padding,
                            indice_key=self.indice_key, name="conv")(st, cache)
        elif self.conv_type == "spconv":
            st = SparseConv3d(self.out_channels, self.kernel_size, self.stride,
                              self.padding, indice_key=self.indice_key,
                              out_capacity=self.out_capacity,
                              name="conv")(st, cache)
        else:
            raise ValueError(self.conv_type)
        if rule is not None:
            k, b = SparseBatchNorm(num_channels=self.out_channels,
                                   name="norm")()
            return requant_epilogue(
                st, k, b, dataclasses.replace(rule.act, axis=None))
        st = SparseBatchNorm(name="norm")(st, train)
        return st.replace_feature(jnp.maximum(st.features, 0.0))


def _capacity_schedule(model_cfg, input_capacity):
    """Per-stage output voxel capacities from
    ``BACKBONE_3D.OUT_CAPACITY_FACTORS: {x_conv2, x_conv3, x_conv4, out}``
    (fractions of the input voxel capacity, rounded up to a multiple of 8).
    Default: no shrinking (factor 1.0) — exact spconv semantics."""
    fac = model_cfg.get("OUT_CAPACITY_FACTORS", None)
    def cap(key):
        if fac is None or key not in fac:
            return None
        f = float(fac[key])
        return max(8, int(-(-input_capacity * f // 8)) * 8)
    return {k: cap(k) for k in ("x_conv2", "x_conv3", "x_conv4", "out")}


class SparseBasicBlock(nn.Module):
    """Residual pair of SubM convs (reference spconv_backbone.py:20-66)."""
    channels: int
    indice_key: str = ""
    use_bias: bool = False

    @nn.compact
    def __call__(self, st, cache, train=False):
        rule = residency_rule(self, "conv1", "subm_conv3d") \
            if not train else None
        if rule is not None:
            spec = dataclasses.replace(rule.act, axis=None)
            identity = st
            st = SubMConv3d(self.channels, 3, 1, 1, use_bias=self.use_bias,
                            indice_key=self.indice_key, name="conv1")(st, cache)
            k1, b1 = SparseBatchNorm(num_channels=self.channels, name="bn1")()
            st = requant_epilogue(st, k1, b1, spec, name="out_quant1")
            st = SubMConv3d(self.channels, 3, 1, 1, use_bias=self.use_bias,
                            indice_key=self.indice_key, name="conv2")(st, cache)
            k2, b2 = SparseBatchNorm(num_channels=self.channels, name="bn2")()
            return requant_epilogue(st, k2, b2, spec, identity=identity,
                                    name="out_quant2")
        identity = st.features
        st = SubMConv3d(self.channels, 3, 1, 1, use_bias=self.use_bias,
                        indice_key=self.indice_key, name="conv1")(st, cache)
        st = SparseBatchNorm(name="bn1")(st, train)
        st = st.replace_feature(jnp.maximum(st.features, 0.0))
        st = SubMConv3d(self.channels, 3, 1, 1, use_bias=self.use_bias,
                        indice_key=self.indice_key, name="conv2")(st, cache)
        st = SparseBatchNorm(name="bn2")(st, train)
        return st.replace_feature(jnp.maximum(st.features + identity, 0.0))


# narrow VFE outputs (4-5 channels: mean xyz+intensity) are zero-padded to
# this many lanes so conv_input clears the one-hot kernel's cin >= 16
# routing gate (pallas_conv.gather_conv_chunked_fast) — the pad lanes are
# always zero, so the extra weight rows change nothing numerically (the
# checkpoint importer zero-pads reference (K, 4, O) weights to match)
MIN_INPUT_LANES = 16


def _make_input_tensor(batch_dict, sparse_shape):
    feats = batch_dict["voxel_features"]          # (B, V, C)
    coords = batch_dict["voxel_coords"]           # (B, V, 3) [z, y, x]
    B, V, C = feats.shape
    b_col = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, V, 1))
    b_col = jnp.where(coords[..., :1] >= 0, b_col, -1)
    indices = jnp.concatenate([b_col, coords], axis=-1).reshape(B * V, 4)
    flat = feats.reshape(B * V, C)
    if C < MIN_INPUT_LANES:
        flat = jnp.pad(flat, ((0, 0), (0, MIN_INPUT_LANES - C)))
    return SparseConvTensor(features=flat,
                            indices=indices.astype(jnp.int32),
                            spatial_shape=tuple(int(s) for s in sparse_shape),
                            batch_size=B).sort_rows()


class VoxelBackBone8x(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]          # [nx, ny, nz]
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = ()

    num_point_features: int = 128

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
        caps = _capacity_schedule(self.model_cfg, st.capacity)
        x = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                              name="conv_input")(st, cache, train)
        x1 = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                               name="conv1_0")(x, cache, train)
        x2 = x1
        for i, blk in enumerate([
                _SparseConvBNReLU(32, 3, 2, 1, "spconv", "spconv2",
                                  out_capacity=caps["x_conv2"], name="conv2_0"),
                _SparseConvBNReLU(32, 3, 1, 1, "subm", "subm2", name="conv2_1"),
                _SparseConvBNReLU(32, 3, 1, 1, "subm", "subm2", name="conv2_2")]):
            x2 = blk(x2, cache, train)
        x3 = x2
        for blk in [
                _SparseConvBNReLU(64, 3, 2, 1, "spconv", "spconv3",
                                  out_capacity=caps["x_conv3"], name="conv3_0"),
                _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm3", name="conv3_1"),
                _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm3", name="conv3_2")]:
            x3 = blk(x3, cache, train)
        x4 = x3
        for blk in [
                _SparseConvBNReLU(64, 3, 2, (0, 1, 1), "spconv", "spconv4",
                                  out_capacity=caps["x_conv4"], name="conv4_0"),
                _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm4", name="conv4_1"),
                _SparseConvBNReLU(64, 3, 1, 1, "subm", "subm4", name="conv4_2")]:
            x4 = blk(x4, cache, train)
        last_pad = self.model_cfg.get("last_pad", 0)
        out = _SparseConvBNReLU(128, (3, 1, 1), (2, 1, 1), last_pad, "spconv",
                                "spconv_down2", out_capacity=caps["out"],
                                name="conv_out")(x4, cache, train)
        batch_dict["encoded_spconv_tensor"] = dequantize_tensor(out)
        batch_dict["encoded_spconv_tensor_stride"] = 8
        # unused exports are DCE'd by XLA, so these dequants are free unless
        # a downstream head actually consumes them
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": dequantize_tensor(x1), "x_conv2": dequantize_tensor(x2),
            "x_conv3": dequantize_tensor(x3), "x_conv4": dequantize_tensor(x4)}
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        return batch_dict


class VoxelResBackBone8x(nn.Module):
    """Residual variant — the CenterPoint-nuScenes backbone."""
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]
    voxel_size: Tuple[float, float, float] = (0.075, 0.075, 0.2)
    point_cloud_range: Tuple[float, ...] = ()

    num_point_features: int = 128

    @property
    def sparse_shape(self):
        nx, ny, nz = self.grid_size
        return (int(nz) + 1, int(ny), int(nx))

    @property
    def backbone_channels(self):
        return {"x_conv1": 16, "x_conv2": 32, "x_conv3": 64, "x_conv4": 128}

    @nn.compact
    def __call__(self, batch_dict, train: bool = False, stop_after=None):
        cache = dict(batch_dict.get("rulebooks", {}))
        cache["__host_keys__"] = frozenset(batch_dict.get("rulebooks", {}))
        use_bias = bool(self.model_cfg.get("USE_BIAS", False))
        st = _make_input_tensor(batch_dict, self.sparse_shape)
        caps = _capacity_schedule(self.model_cfg, st.capacity)
        if stop_after == "sort":            # profiling stop (static arg)
            batch_dict["encoded_spconv_tensor"] = st
            return batch_dict
        x = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                              name="conv_input")(st, cache, train)
        x1 = SparseBasicBlock(16, "res1", use_bias, name="conv1_0")(x, cache, train)
        x1 = SparseBasicBlock(16, "res1", use_bias, name="conv1_1")(x1, cache, train)
        if stop_after == "s1":
            batch_dict["encoded_spconv_tensor"] = x1
            return batch_dict

        x2 = _SparseConvBNReLU(32, 3, 2, 1, "spconv", "spconv2",
                               out_capacity=caps["x_conv2"],
                               name="conv2_0")(x1, cache, train)
        if stop_after == "down2":
            batch_dict["encoded_spconv_tensor"] = x2
            return batch_dict
        x2 = SparseBasicBlock(32, "res2", use_bias, name="conv2_1")(x2, cache, train)
        x2 = SparseBasicBlock(32, "res2", use_bias, name="conv2_2")(x2, cache, train)
        if stop_after == "s2":
            batch_dict["encoded_spconv_tensor"] = x2
            return batch_dict

        x3 = _SparseConvBNReLU(64, 3, 2, 1, "spconv", "spconv3",
                               out_capacity=caps["x_conv3"],
                               name="conv3_0")(x2, cache, train)
        x3 = SparseBasicBlock(64, "res3", use_bias, name="conv3_1")(x3, cache, train)
        x3 = SparseBasicBlock(64, "res3", use_bias, name="conv3_2")(x3, cache, train)
        if stop_after == "s3":
            batch_dict["encoded_spconv_tensor"] = x3
            return batch_dict

        x4 = _SparseConvBNReLU(128, 3, 2, (0, 1, 1), "spconv", "spconv4",
                               out_capacity=caps["x_conv4"],
                               name="conv4_0")(x3, cache, train)
        x4 = SparseBasicBlock(128, "res4", use_bias, name="conv4_1")(x4, cache, train)
        x4 = SparseBasicBlock(128, "res4", use_bias, name="conv4_2")(x4, cache, train)
        if stop_after == "s4":
            batch_dict["encoded_spconv_tensor"] = x4
            return batch_dict

        last_pad = self.model_cfg.get("last_pad", 0)
        out = _SparseConvBNReLU(128, (3, 1, 1), (2, 1, 1), last_pad, "spconv",
                                "spconv_down2", out_capacity=caps["out"],
                                name="conv_out")(x4, cache, train)
        batch_dict["encoded_spconv_tensor"] = dequantize_tensor(out)
        batch_dict["encoded_spconv_tensor_stride"] = 8
        # unused exports are DCE'd by XLA, so these dequants are free unless
        # a downstream head actually consumes them
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": dequantize_tensor(x1), "x_conv2": dequantize_tensor(x2),
            "x_conv3": dequantize_tensor(x3), "x_conv4": dequantize_tensor(x4)}
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        return batch_dict
