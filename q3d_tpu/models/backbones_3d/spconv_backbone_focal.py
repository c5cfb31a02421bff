"""Focal sparse convolution backbone.

Parity with reference ``backbones_3d/spconv_backbone_focal.py`` +
``focal_sparse_conv/focal_sparse_conv.py:9`` (VoxelBackBone8xFocal): a
"focal" module predicts per-voxel importance ("cubic importance maps") and
uses it to emphasize foreground voxels, with an auxiliary BCE loss against
points-in-gt-boxes labels during training.

TPU re-design: the reference dynamically DILATES the voxel topology around
important voxels — data-dependent shapes.  Our static-topology equivalent
keeps the voxel set fixed and applies the learned importance as a soft gate
(sigmoid) on features (the loss supervision is identical); the dilation's
receptive-field effect is recovered by the following strided conv's kernel
footprint.  Deviation documented here and in docs/PARITY.md.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.spconv import SubMConv3d, SparseBatchNorm
from .spconv_backbone import (_SparseConvBNReLU, _make_input_tensor,
                              VoxelBackBone8x)


def gather_image_features(img_feats, centers_xyz, batch_idx, valid,
                          lidar2cam, intrinsics, downsample=1):
    """Per-voxel image features by center projection (reference
    ``focal_sparse_conv.py:51-117`` construct_multimodal_features): project
    voxel centers through lidar->camera->image, integer-truncate the pixel
    (the reference casts ``.long()``), gather the feature map, zero
    out-of-image voxels.

    img_feats: (B, h, w, C) channels-last feature map at full-res /
    ``downsample``; centers_xyz: (N, 3) lidar-frame centers; batch_idx:
    (N,) int; valid: (N,) bool (padded rows).  Returns (N, C)."""
    pts = jnp.concatenate([centers_xyz, jnp.ones_like(centers_xyz[:, :1])],
                          axis=-1)                            # (N, 4)
    T = lidar2cam[batch_idx]                                  # (N, 4, 4)
    cam = jnp.einsum("nij,nj->ni", T, pts)[:, :3]
    K = intrinsics[batch_idx]                                 # (N, 3, 3)
    uvw = jnp.einsum("nij,nj->ni", K, cam)
    z = jnp.clip(uvw[:, 2], 1e-3, None)
    u = (uvw[:, 0] / z / downsample).astype(jnp.int32)        # trunc = .long()
    v = (uvw[:, 1] / z / downsample).astype(jnp.int32)
    h, w = img_feats.shape[1:3]
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (cam[:, 2] > 0) & valid
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    g = img_feats[batch_idx, vc, uc]                          # (N, C)
    return g * in_img[:, None].astype(g.dtype)


class FocalSparseConv(nn.Module):
    """Importance-gated submanifold conv (reference focal_sparse_conv.py:9).

    ``use_img`` (reference :203-218): per-voxel image features are
    CONCATENATED (image first) onto the voxel features as the importance
    conv's input, and SUMMED onto the conv output (fuse_sum=True at the
    reference's second construct_multimodal_features call)."""
    channels: int
    indice_key: str = ""
    use_img: bool = False

    @nn.compact
    def __call__(self, st, cache, train=False, img_gathered=None):
        if self.use_img:
            assert img_gathered is not None
            gate_in = st.replace(features=jnp.concatenate(
                [img_gathered.astype(st.features.dtype), st.features], -1))
        else:
            gate_in = st
        imp_logit = SubMConv3d(1, 3, 1, 1, use_bias=True,
                               indice_key=self.indice_key + "_imp",
                               name="imp_conv")(gate_in, cache).features[:, 0]
        importance = jax.nn.sigmoid(imp_logit)
        out = SubMConv3d(self.channels, 3, 1, 1,
                         indice_key=self.indice_key, name="conv")(st, cache)
        if self.use_img:
            # fuse_sum: image features added to the conv output (channel
            # counts match by construction — reference channel_reduce
            # out_channels == planes)
            out = out.replace(features=out.features
                              + img_gathered.astype(out.features.dtype))
        out = SparseBatchNorm(name="norm")(out, train)
        gated = jnp.maximum(out.features, 0.0) * importance[:, None]
        out = out.replace(features=gated)
        return out, imp_logit


class _SemSegFeat2D(nn.Module):
    """Compact image-feature net standing in for the reference's
    SemDeepLabV3 ResNet50 layer1 + 1x1 channel reduce
    (``focal_sparse_conv/SemanticSeg/pyramid_ffn.py``): stride-4 feature
    map reduced to ``out_channels``.  The COCO-pretrained DeepLabV3 import
    is environment-gated (torchvision download); the fusion topology —
    what the detector consumes — is identical."""
    out_channels: int = 16

    @nn.compact
    def __call__(self, imgs, train=False):
        from ..layers import Conv2d, BatchNorm, relu
        x = imgs
        for i, c in enumerate((self.out_channels * 2, self.out_channels * 4)):
            x = Conv2d(c, 3, 2, 1, use_bias=False, name=f"conv{i}")(x)
            x = relu(BatchNorm(name=f"norm{i}")(x, train))
        return Conv2d(self.out_channels, 1, name="reduce")(x)


class VoxelBackBone8xFocal(VoxelBackBone8x):
    """VoxelBackBone8x with focal modules after the early stages; adds
    ``focal_loss`` supervision targets into batch_dict during training."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cache = {}
        st = _make_input_tensor(batch_dict, self.sparse_shape)
        x = _SparseConvBNReLU(16, 3, 1, 1, "subm", "subm1",
                              name="conv_input")(st, cache, train)
        x1, imp1 = FocalSparseConv(16, "focal1", name="focal1")(x, cache, train)

        imp_mm = None
        if self.model_cfg.get("USE_IMG", False) \
                and "camera_imgs" in batch_dict:
            # reference :128-150, :235-237: a dedicated multimodal focal
            # conv at stride 1 fed by the semantic-seg image features
            imgs = batch_dict["camera_imgs"]
            if imgs.ndim == 5:
                imgs = imgs[:, 0]
            feats2d = _SemSegFeat2D(16, name="semseg")(imgs, train)
            B = x1.batch_size
            intr = batch_dict["camera_intrinsics"]
            if intr.ndim == 4:
                intr = intr[:, 0]
            l2c = batch_dict.get("lidar2camera", None)
            if l2c is None:
                T = jnp.asarray([[0., -1., 0., 0.], [0., 0., -1., 0.],
                                 [1., 0., 0., 0.], [0., 0., 0., 1.]])
                l2c = jnp.broadcast_to(T, (B, 4, 4))
            elif l2c.ndim == 4:
                l2c = l2c[:, 0]
            from ...utils import common_utils
            centers = common_utils.get_voxel_centers(
                x1.indices[:, 1:], 1, self.voxel_size,
                self.point_cloud_range)
            g = gather_image_features(
                feats2d, centers, jnp.clip(x1.indices[:, 0], 0, None),
                x1.valid.astype(bool), l2c, intr,
                downsample=imgs.shape[1] // feats2d.shape[1])
            x1, imp_mm = FocalSparseConv(
                16, "focal_mm", use_img=True, name="conv_focal_multimodal")(
                x1, cache, train, img_gathered=g)

        x2 = x1
        for blk in [_SparseConvBNReLU(32, 3, 2, 1, "spconv", "spconv2",
                                      name="conv2_0"),
                    _SparseConvBNReLU(32, 3, 1, 1, "subm", "subm2",
                                      name="conv2_1")]:
            x2 = blk(x2, cache, train)
        x2, imp2 = FocalSparseConv(32, "focal2", name="focal2")(x2, cache, train)

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
        out = _SparseConvBNReLU(128, (3, 1, 1), (2, 1, 1), 0, "spconv",
                                "spconv_down2", name="conv_out")(x4, cache, train)

        if train and "gt_boxes" in batch_dict:
            # auxiliary importance supervision: voxel center in any gt box
            from ...ops.roiaware_pool3d import points_in_boxes_jax
            from ...utils import common_utils
            loss = 0.0
            pairs = [(x1, imp1), (x2, imp2)]
            if imp_mm is not None:
                pairs.append((x1, imp_mm))
            for stx, imp in pairs:
                stride = {16: 1, 32: 2}.get(stx.num_channels, 1)
                centers = common_utils.get_voxel_centers(
                    stx.indices[:, 1:], stride, self.voxel_size,
                    self.point_cloud_range)
                tgt = jnp.zeros(imp.shape[0])
                for b in range(stx.batch_size):
                    boxes = batch_dict["gt_boxes"][b]
                    idx = points_in_boxes_jax(centers, boxes[:, :7])
                    hit = (idx >= 0) & (boxes[jnp.clip(idx, 0, None), -1] > 0)
                    tgt = jnp.where(stx.indices[:, 0] == b,
                                    hit.astype(jnp.float32), tgt)
                valid = stx.valid
                bce = jnp.clip(imp, 0, None) - imp * tgt \
                    + jnp.log1p(jnp.exp(-jnp.abs(imp)))
                loss = loss + (bce * valid).sum() / jnp.maximum(valid.sum(), 1)
            batch_dict["loss"] = batch_dict.get("loss", 0.0) + 0.1 * loss
            batch_dict.setdefault("tb_dict", {})["focal_imp_loss"] = loss

        batch_dict["encoded_spconv_tensor"] = out
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4}
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        return batch_dict
