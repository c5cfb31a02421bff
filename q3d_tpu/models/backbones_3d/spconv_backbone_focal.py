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


class FocalSparseConv(nn.Module):
    """Importance-gated submanifold conv (reference focal_sparse_conv.py:9)."""
    channels: int
    indice_key: str = ""

    @nn.compact
    def __call__(self, st, cache, train=False):
        imp_logit = SubMConv3d(1, 3, 1, 1, use_bias=True,
                               indice_key=self.indice_key + "_imp",
                               name="imp_conv")(st, cache).features[:, 0]
        importance = jax.nn.sigmoid(imp_logit)
        out = SubMConv3d(self.channels, 3, 1, 1,
                         indice_key=self.indice_key, name="conv")(st, cache)
        out = SparseBatchNorm(name="norm")(out, train)
        gated = jnp.maximum(out.features, 0.0) * importance[:, None]
        out = out.replace(features=gated)
        return out, imp_logit


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
            for stx, imp in ((x1, imp1), (x2, imp2)):
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
