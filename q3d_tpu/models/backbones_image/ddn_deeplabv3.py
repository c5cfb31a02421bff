"""DeepLabV3 depth-distribution network (CaDDN's DDN) — flax.

Parity with reference ``vfe/image_vfe_modules/ffn/ddn/ddn_deeplabv3.py`` +
``ddn_template.py``: a torchvision ``deeplabv3_resnet{50,101}`` whose
``layer1`` features are tapped as the image feature map and whose ASPP
classifier head emits ``num_bins + 1`` depth-bin logits, bilinearly resized
to the feature resolution.  ``import_ddn_torch_weights`` ingests
torchvision's pretrained state-dict layout so the reference's checkpoint
(e.g. ``deeplabv3_resnet101_coco-586e9e4e.pth``) loads directly; the final
``classifier.4`` layer is skipped when class counts differ, exactly like
``ddn_template.filter_pretrained_dict``.

NHWC throughout; BatchNorms carry running stats in ``batch_stats``.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

RESNET_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3)}


class _BN(nn.Module):
    """Torch-semantics BatchNorm2d (eps 1e-5, running stats)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features, jnp.float32))
        if train:
            m = x.mean(axis=(0, 1, 2))
            v = x.var(axis=(0, 1, 2))
            if self.is_mutable_collection("batch_stats"):
                mean.value = 0.9 * mean.value + 0.1 * m
                var.value = 0.9 * var.value + 0.1 * v
        else:
            m, v = mean.value, var.value
        return (x - m) * jax.lax.rsqrt(v + 1e-5) * scale + bias


def _conv(c, k, s=1, d=1, name=None):
    pad = d * (k - 1) // 2
    return nn.Conv(c, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                   kernel_dilation=(d, d), use_bias=False, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _conv(self.planes, 1, name="conv1")(x)
        y = nn.relu(_BN(self.planes, name="bn1")(y, train))
        y = _conv(self.planes, 3, self.stride, self.dilation,
                  name="conv2")(y)
        y = nn.relu(_BN(self.planes, name="bn2")(y, train))
        y = _conv(self.planes * 4, 1, name="conv3")(y)
        y = _BN(self.planes * 4, name="bn3")(y, train)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride,
                             name="ds_conv")(x)
            identity = _BN(self.planes * 4, name="ds_bn")(identity, train)
        return nn.relu(y + identity)


class ASPP(nn.Module):
    """torchvision ASPP: 1x1 + three dilated 3x3 + image pooling -> project
    to 256 (dropout omitted at inference)."""
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        y = _conv(256, 1, name="conv0")(x)
        outs.append(nn.relu(_BN(256, name="bn0")(y, train)))
        for i, r in enumerate(self.rates):
            y = _conv(256, 3, d=r, name=f"conv{i + 1}")(x)
            outs.append(nn.relu(_BN(256, name=f"bn{i + 1}")(y, train)))
        pooled = x.mean(axis=(1, 2), keepdims=True)
        y = _conv(256, 1, name="pool_conv")(pooled)
        y = nn.relu(_BN(256, name="pool_bn")(y, train))
        outs.append(jnp.broadcast_to(y, outs[0].shape))
        y = jnp.concatenate(outs, axis=-1)
        y = _conv(256, 1, name="project")(y)
        return nn.relu(_BN(256, name="project_bn")(y, train))


class DDNDeepLabV3(nn.Module):
    """forward(images NHWC in [0,1]) -> {'features': layer1 stride-4 map,
    'logits': depth-bin logits at the feature resolution}."""
    num_classes: int
    backbone_name: str = "ResNet101"
    pretrained: bool = True
    feat_extract_layer: str = "layer1"

    @nn.compact
    def __call__(self, images, train: bool = False):
        if self.pretrained:
            images = (images - IMAGENET_MEAN) / IMAGENET_STD
        layers = RESNET_LAYERS[self.backbone_name]
        x = _conv(64, 7, 2, name="conv1")(images)
        x = nn.relu(_BN(64, name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # deeplab: replace_stride_with_dilation = [False, True, True]
        feats = None
        planes = (64, 128, 256, 512)
        strides = (1, 2, 1, 1)
        dilations = (1, 1, 2, 4)
        for li in range(4):
            for bi in range(layers[li]):
                x = Bottleneck(
                    planes[li],
                    stride=strides[li] if bi == 0 else 1,
                    dilation=dilations[li],
                    downsample=(bi == 0),
                    name=f"layer{li + 1}_{bi}")(x, train)
            if self.feat_extract_layer == f"layer{li + 1}":
                feats = x
        logits = ASPP(name="aspp")(x, train)
        logits = _conv(256, 3, name="cls_conv")(logits)
        logits = nn.relu(_BN(256, name="cls_bn")(logits, train))
        logits = nn.Conv(self.num_classes, (1, 1), name="cls_out")(logits)
        # resize logits to the tapped feature resolution (reference
        # ddn_template.py F.interpolate(..., mode='bilinear'))
        logits = jax.image.resize(
            logits, (logits.shape[0],) + feats.shape[1:3]
            + (logits.shape[-1],), method="bilinear")
        return {"features": feats, "logits": logits}


# ---------------------- torchvision checkpoint import ----------------------

def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v)


def _conv_w(sd, name):
    return {"kernel": _np(sd[name + ".weight"]).transpose(2, 3, 1, 0)}


def _bn_w(sd, name):
    return ({"scale": _np(sd[name + ".weight"]),
             "bias": _np(sd[name + ".bias"])},
            {"mean": _np(sd[name + ".running_mean"]),
             "var": _np(sd[name + ".running_var"])})


def import_ddn_torch_weights(sd, backbone_name="ResNet101",
                             num_classes=None):
    """torchvision deeplabv3_resnet{50,101} state dict -> (params,
    batch_stats) trees for DDNDeepLabV3.  classifier.4 is skipped when its
    class count differs from ``num_classes`` (reference
    filter_pretrained_dict)."""
    layers = RESNET_LAYERS[backbone_name]
    params, stats = {}, {}
    params["conv1"] = _conv_w(sd, "backbone.conv1")
    p, s = _bn_w(sd, "backbone.bn1")
    params["bn1"], stats["bn1"] = p, s
    for li in range(4):
        for bi in range(layers[li]):
            t = f"backbone.layer{li + 1}.{bi}"
            our = f"layer{li + 1}_{bi}"
            blk_p, blk_s = {}, {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = _conv_w(sd, f"{t}.conv{ci}")
                bp, bs = _bn_w(sd, f"{t}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bp, bs
            if f"{t}.downsample.0.weight" in sd:
                blk_p["ds_conv"] = _conv_w(sd, f"{t}.downsample.0")
                bp, bs = _bn_w(sd, f"{t}.downsample.1")
                blk_p["ds_bn"], blk_s["ds_bn"] = bp, bs
            params[our], stats[our] = blk_p, blk_s
    # ASPP: classifier.0.convs.{0..4} + project
    aspp_p, aspp_s = {}, {}
    aspp_p["conv0"] = _conv_w(sd, "classifier.0.convs.0.0")
    bp, bs = _bn_w(sd, "classifier.0.convs.0.1")
    aspp_p["bn0"], aspp_s["bn0"] = bp, bs
    for i in (1, 2, 3):
        aspp_p[f"conv{i}"] = _conv_w(sd, f"classifier.0.convs.{i}.0")
        bp, bs = _bn_w(sd, f"classifier.0.convs.{i}.1")
        aspp_p[f"bn{i}"], aspp_s[f"bn{i}"] = bp, bs
    aspp_p["pool_conv"] = _conv_w(sd, "classifier.0.convs.4.1")
    bp, bs = _bn_w(sd, "classifier.0.convs.4.2")
    aspp_p["pool_bn"], aspp_s["pool_bn"] = bp, bs
    aspp_p["project"] = _conv_w(sd, "classifier.0.project.0")
    bp, bs = _bn_w(sd, "classifier.0.project.1")
    aspp_p["project_bn"], aspp_s["project_bn"] = bp, bs
    params["aspp"], stats["aspp"] = aspp_p, aspp_s
    params["cls_conv"] = _conv_w(sd, "classifier.1")
    bp, bs = _bn_w(sd, "classifier.2")
    params["cls_bn"], stats["cls_bn"] = bp, bs
    if num_classes is None \
            or _np(sd["classifier.4.weight"]).shape[0] == num_classes:
        params["cls_out"] = {
            "kernel": _np(sd["classifier.4.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["classifier.4.bias"])}
    return params, stats
