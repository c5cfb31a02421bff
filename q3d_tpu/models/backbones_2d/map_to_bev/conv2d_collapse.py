"""Conv2DCollapse — learnable z-collapse of a dense voxel volume
(reference ``map_to_bev/conv2d_collapse.py``: (N, C, D, H, W) -> 1x1 conv
over the stacked C*D channels; used by CaDDN)."""

from typing import Any

import flax.linen as nn

from ...layers import Conv2d, BatchNorm, relu


class Conv2DCollapse(nn.Module):
    model_cfg: Any

    @property
    def num_bev_features(self):
        return int(self.model_cfg.NUM_BEV_FEATURES)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        if "dense_voxel_features" in batch_dict:         # CaDDN ImageVFE path
            dense = batch_dict["dense_voxel_features"]
        else:
            dense = batch_dict["encoded_spconv_tensor"].dense()  # (B,D,H,W,C)
        B, D, H, W, C = dense.shape
        x = dense.transpose(0, 2, 3, 4, 1).reshape(B, H, W, C * D)
        x = Conv2d(self.num_bev_features, 1, use_bias=False, name="conv")(x)
        x = BatchNorm(name="norm")(x, train)
        batch_dict["spatial_features"] = relu(x)
        return batch_dict
