"""CaDDN DDN checkpoint-fidelity: torchvision deeplabv3-layout weights
import into the flax DDNDeepLabV3 and reproduce a torch-side reference
forward (bottlenecks + dilated ASPP implemented here with F.conv2d)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from q3d_tpu.models.backbones_image import ddn_deeplabv3 as D

TINY = (1, 1, 1, 1)
NUM_CLASSES = 7


@pytest.fixture(autouse=True)
def _tiny_resnet(monkeypatch):
    monkeypatch.setitem(D.RESNET_LAYERS, "Tiny", TINY)


def _make_state_dict(rng):
    sd = {}

    def t(*shape):
        return torch.tensor(rng.normal(0, 0.03, shape).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = 1 + t(c)
        sd[name + ".bias"] = t(c)
        sd[name + ".running_mean"] = t(c)
        sd[name + ".running_var"] = torch.abs(1 + t(c))

    sd["backbone.conv1.weight"] = t(64, 3, 7, 7)
    bn("backbone.bn1", 64)
    inp = 64
    planes = (64, 128, 256, 512)
    for li in range(4):
        for bi in range(TINY[li]):
            p = planes[li]
            tgt = f"backbone.layer{li + 1}.{bi}"
            sd[tgt + ".conv1.weight"] = t(p, inp if bi == 0 else p * 4, 1, 1)
            bn(tgt + ".bn1", p)
            sd[tgt + ".conv2.weight"] = t(p, p, 3, 3)
            bn(tgt + ".bn2", p)
            sd[tgt + ".conv3.weight"] = t(p * 4, p, 1, 1)
            bn(tgt + ".bn3", p * 4)
            if bi == 0:
                sd[tgt + ".downsample.0.weight"] = t(p * 4, inp, 1, 1)
                bn(tgt + ".downsample.1", p * 4)
        inp = planes[li] * 4
    # ASPP over 2048
    sd["classifier.0.convs.0.0.weight"] = t(256, 2048, 1, 1)
    bn("classifier.0.convs.0.1", 256)
    for i in (1, 2, 3):
        sd[f"classifier.0.convs.{i}.0.weight"] = t(256, 2048, 3, 3)
        bn(f"classifier.0.convs.{i}.1", 256)
    sd["classifier.0.convs.4.1.weight"] = t(256, 2048, 1, 1)
    bn("classifier.0.convs.4.2", 256)
    sd["classifier.0.project.0.weight"] = t(256, 5 * 256, 1, 1)
    bn("classifier.0.project.1", 256)
    sd["classifier.1.weight"] = t(256, 256, 3, 3)
    bn("classifier.2", 256)
    sd["classifier.4.weight"] = t(NUM_CLASSES, 256, 1, 1)
    sd["classifier.4.bias"] = t(NUM_CLASSES)
    return sd


def _t_bn(x, sd, name):
    return F.batch_norm(x, sd[name + ".running_mean"],
                        sd[name + ".running_var"], sd[name + ".weight"],
                        sd[name + ".bias"], False, 0.1, 1e-5)


def _t_bottleneck(x, sd, tgt, stride, dilation):
    idn = x
    y = F.conv2d(x, sd[tgt + ".conv1.weight"])
    y = F.relu(_t_bn(y, sd, tgt + ".bn1"))
    y = F.conv2d(y, sd[tgt + ".conv2.weight"], stride=stride,
                 padding=dilation, dilation=dilation)
    y = F.relu(_t_bn(y, sd, tgt + ".bn2"))
    y = F.conv2d(y, sd[tgt + ".conv3.weight"])
    y = _t_bn(y, sd, tgt + ".bn3")
    if (tgt + ".downsample.0.weight") in sd:
        idn = F.conv2d(x, sd[tgt + ".downsample.0.weight"], stride=stride)
        idn = _t_bn(idn, sd, tgt + ".downsample.1")
    return F.relu(y + idn)


def _torch_forward(sd, images):
    x = torch.tensor(images).permute(0, 3, 1, 2)
    mean = torch.tensor(D.IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(D.IMAGENET_STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    x = F.conv2d(x, sd["backbone.conv1.weight"], stride=2, padding=3)
    x = F.relu(_t_bn(x, sd, "backbone.bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    strides = (1, 2, 1, 1)
    dilations = (1, 1, 2, 4)
    feats = None
    for li in range(4):
        for bi in range(TINY[li]):
            x = _t_bottleneck(x, sd, f"backbone.layer{li + 1}.{bi}",
                              strides[li] if bi == 0 else 1, dilations[li])
        if li == 0:
            feats = x
    outs = [F.relu(_t_bn(F.conv2d(x, sd["classifier.0.convs.0.0.weight"]),
                         sd, "classifier.0.convs.0.1"))]
    for i, r in zip((1, 2, 3), (12, 24, 36)):
        y = F.conv2d(x, sd[f"classifier.0.convs.{i}.0.weight"], padding=r,
                     dilation=r)
        outs.append(F.relu(_t_bn(y, sd, f"classifier.0.convs.{i}.1")))
    pooled = x.mean(dim=(2, 3), keepdim=True)
    y = F.conv2d(pooled, sd["classifier.0.convs.4.1.weight"])
    y = F.relu(_t_bn(y, sd, "classifier.0.convs.4.2"))
    outs.append(y.expand_as(outs[0]))
    y = torch.cat(outs, dim=1)
    y = F.relu(_t_bn(F.conv2d(y, sd["classifier.0.project.0.weight"]),
                     sd, "classifier.0.project.1"))
    y = F.conv2d(y, sd["classifier.1.weight"], padding=1)
    y = F.relu(_t_bn(y, sd, "classifier.2"))
    y = F.conv2d(y, sd["classifier.4.weight"], sd["classifier.4.bias"])
    logits = F.interpolate(y, size=feats.shape[-2:], mode="bilinear",
                           align_corners=False)
    return (feats.permute(0, 2, 3, 1).numpy(),
            logits.permute(0, 2, 3, 1).numpy())


def test_ddn_import_matches_reference_forward():
    rng = np.random.RandomState(0)
    sd = _make_state_dict(rng)
    images = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ref_feats, ref_logits = _torch_forward(sd, images)

    model = D.DDNDeepLabV3(num_classes=NUM_CLASSES, backbone_name="Tiny")
    params, stats = D.import_ddn_torch_weights(sd, "Tiny", NUM_CLASSES)
    out = model.apply({"params": params, "batch_stats": stats}, images)
    np.testing.assert_allclose(np.asarray(out["features"]), ref_feats,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=1e-3)


def test_ddn_skips_mismatched_final_layer():
    rng = np.random.RandomState(1)
    sd = _make_state_dict(rng)
    params, _ = D.import_ddn_torch_weights(sd, "Tiny", num_classes=33)
    assert "cls_out" not in params    # reference filter_pretrained_dict
