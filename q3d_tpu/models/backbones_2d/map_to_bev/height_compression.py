"""HeightCompression — densify a sparse 3D tensor and fold z into channels.

Parity with reference ``map_to_bev/height_compression.py:20-26`` (spconv
``.dense()`` then (N, C, D, H, W) -> (N, C*D, H, W)).  Our sparse tensors
densify via one scatter; output is NHWC (B, H, W, C*D).
"""

from typing import Any

import flax.linen as nn


class HeightCompression(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        st = batch_dict["encoded_spconv_tensor"]
        dense = st.dense()                       # (B, D, H, W, C)
        B, D, H, W, C = dense.shape
        # fold z into channels with channel index c*D + d — the exact order of
        # torch's (N, C, D, H, W).view(N, C*D, H, W), so following convs load
        # reference checkpoints without channel permutation
        bev = dense.transpose(0, 2, 3, 4, 1).reshape(B, H, W, C * D)
        batch_dict["spatial_features"] = bev
        batch_dict["spatial_features_stride"] = batch_dict.get(
            "encoded_spconv_tensor_stride", 8)
        return batch_dict
