"""Dense BEV conv pyramid + transposed-conv upsample concat.

Parity with reference ``backbones_2d/base_bev_backbone.py`` (``BaseBEVBackbone:6``,
``BaseBEVBackboneV1``, ``BaseBEVResBackbone``).  NHWC; every conv is a
quant-rule-aware ``layers.Conv2d`` so PTQ rules (SmoothQuant etc.) apply here
— this backbone is where CenterPoint spends most of its dense FLOPs and where
the reference's 35% PTQ speedup mostly comes from.
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..layers import (Conv2d, ConvTranspose2d, BatchNorm, relu,
                      QTensor, dequantize, residency_rule, requant_epilogue)


class _Block(nn.Module):
    """ZeroPad+Conv(s) -> [Conv]*n, each conv BN+ReLU'd (one pyramid level).

    Under a dense int8-residency deploy rule (eval only), each conv's BN
    eval-affine + ReLU + requantization fold into its epilogue and features
    stay int8 across the whole block (and across blocks — the next block's
    conv0 consumes the QTensor directly)."""
    features: int
    stride: int
    layer_num: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        rule = residency_rule(self, "conv0") if not train else None
        if rule is not None:
            spec = dataclasses.replace(rule.act, axis=None)
            x = Conv2d(self.features, 3, self.stride, 1, use_bias=False,
                       name="conv0")(x)
            k, b = BatchNorm(name="norm0", num_channels=self.features)()
            x = requant_epilogue(x, k, b, spec, name="out_quant0")
            for i in range(self.layer_num):
                x = Conv2d(self.features, 3, 1, 1, use_bias=False,
                           name=f"conv{i + 1}")(x)
                k, b = BatchNorm(name=f"norm{i + 1}",
                                 num_channels=self.features)()
                x = requant_epilogue(x, k, b, spec, name=f"out_quant{i + 1}")
            return x                                # QTensor
        if isinstance(x, QTensor):
            x = dequantize(x)
        x = Conv2d(self.features, 3, self.stride, 1, use_bias=False, name="conv0")(x)
        x = BatchNorm(name="norm0")(x, train)
        x = relu(x)
        for k in range(self.layer_num):
            x = Conv2d(self.features, 3, 1, 1, use_bias=False, name=f"conv{k + 1}")(x)
            x = BatchNorm(name=f"norm{k + 1}")(x, train)
            x = relu(x)
        return x


class _Deblock(nn.Module):
    """Upsample (transposed conv) or downsample (conv) lateral head."""
    features: int
    stride: float
    use_conv_for_no_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        if s >= 1 and not (s == 1 and self.use_conv_for_no_stride):
            s = int(s)
            x = ConvTranspose2d(self.features, s, s, 0, use_bias=False,
                                name="deconv")(x)
        else:
            s = int(round(1 / s)) if s < 1 else 1
            x = Conv2d(self.features, s, s, 0, use_bias=False, name="conv")(x)
        x = BatchNorm(name="norm")(x, train)
        return relu(x)


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = self.model_cfg
        if cfg.get("UPSAMPLE_STRIDES", None):
            n = sum(cfg.NUM_UPSAMPLE_FILTERS)
        else:
            n = list(cfg.NUM_FILTERS)[-1]
        return n

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        layer_nums = list(cfg.get("LAYER_NUMS", []) or [])
        layer_strides = list(cfg.get("LAYER_STRIDES", []) or [])
        num_filters = list(cfg.get("NUM_FILTERS", []) or [])
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []) or [])
        num_up_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []) or [])

        x = batch_dict["spatial_features"]
        dtype = x.dtype
        ups = []
        for i in range(len(layer_nums)):
            x = _Block(num_filters[i], layer_strides[i], layer_nums[i],
                       name=f"blocks_{i}")(x, train)
            # x may be a QTensor (int8 residency): the next block consumes it
            # directly; everything else sees real values
            xr = dequantize(x, dtype)
            stride = batch_dict["spatial_features"].shape[1] // xr.shape[1]
            batch_dict[f"spatial_features_{stride}x"] = xr
            if upsample_strides:
                ups.append(_Deblock(
                    num_up_filters[i], upsample_strides[i],
                    cfg.get("USE_CONV_FOR_NO_STRIDE", False),
                    name=f"deblocks_{i}")(xr, train))
            else:
                ups.append(xr)
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(upsample_strides) > len(layer_nums):
            x = _Deblock(x.shape[-1], upsample_strides[-1],
                         name=f"deblocks_{len(layer_nums)}")(x, train)
        batch_dict["spatial_features_2d"] = x
        return batch_dict


class BaseBEVBackboneV1(nn.Module):
    """Variant taking multi-scale inputs from the 3D backbone
    (reference base_bev_backbone.py:120+)."""
    model_cfg: Any
    input_channels: int = 0

    @property
    def num_bev_features(self):
        return sum(self.model_cfg.NUM_UPSAMPLE_FILTERS)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        layer_nums = list(cfg.LAYER_NUMS)
        num_filters = list(cfg.NUM_FILTERS)
        upsample_strides = list(cfg.UPSAMPLE_STRIDES)
        num_up_filters = list(cfg.NUM_UPSAMPLE_FILTERS)
        ms = batch_dict["multi_scale_2d_features"]
        feats = [ms["x_conv4"], ms["x_conv5"]]
        ups = []
        x = feats[0]
        for i in range(len(layer_nums)):
            x = dequantize(_Block(num_filters[i], 1, layer_nums[i],
                                  name=f"blocks_{i}")(feats[i], train),
                           feats[i].dtype)
            ups.append(_Deblock(num_up_filters[i], upsample_strides[i],
                                name=f"deblocks_{i}")(x, train))
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        batch_dict["spatial_features_2d"] = x
        return batch_dict


class _ResBlock(nn.Module):
    features: int
    stride: int
    layer_num: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, 3, self.stride, 1, use_bias=False, name="conv0")(x)
        x = BatchNorm(name="norm0")(x, train)
        x = relu(x)
        for k in range(self.layer_num):
            idn = x
            y = Conv2d(self.features, 3, 1, 1, use_bias=False, name=f"conv{k + 1}a")(x)
            y = BatchNorm(name=f"norm{k + 1}a")(y, train)
            y = relu(y)
            y = Conv2d(self.features, 3, 1, 1, use_bias=False, name=f"conv{k + 1}b")(y)
            y = BatchNorm(name=f"norm{k + 1}b")(y, train)
            x = relu(y + idn)
        return x


class BaseBEVResBackbone(nn.Module):
    """Residual BEV backbone (reference BaseBEVResBackbone)."""
    model_cfg: Any
    input_channels: int

    @property
    def num_bev_features(self):
        cfg = self.model_cfg
        return (sum(cfg.NUM_UPSAMPLE_FILTERS) if cfg.get("UPSAMPLE_STRIDES", None)
                else list(cfg.NUM_FILTERS)[-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        layer_nums = list(cfg.LAYER_NUMS)
        layer_strides = list(cfg.LAYER_STRIDES)
        num_filters = list(cfg.NUM_FILTERS)
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []) or [])
        num_up_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []) or [])
        x = batch_dict["spatial_features"]
        ups = []
        for i in range(len(layer_nums)):
            x = _ResBlock(num_filters[i], layer_strides[i], layer_nums[i],
                          name=f"blocks_{i}")(x, train)
            if upsample_strides:
                ups.append(_Deblock(num_up_filters[i], upsample_strides[i],
                                    name=f"deblocks_{i}")(x, train))
            else:
                ups.append(x)
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        batch_dict["spatial_features_2d"] = x
        return batch_dict
