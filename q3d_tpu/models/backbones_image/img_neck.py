"""GeneralizedLSSFPN — image feature pyramid neck.

Parity with reference ``backbones_image/img_neck/generalized_lss.py`` (76
LoC): lateral 1x1 convs + top-down upsample-concat + 3x3 output convs over
the Swin stage features; emits the single fused level DepthLSSTransform
consumes.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv2d, BatchNorm, relu


def _upsample2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")


class GeneralizedLSSFPN(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: list of (B, Hi, Wi, Ci), fine -> coarse."""
        ch = int(self.model_cfg.get("OUT_CHANNELS", 256))
        laterals = [relu(BatchNorm(name=f"lat_norm{i}")(
            Conv2d(ch, 1, name=f"lateral{i}")(f), train))
            for i, f in enumerate(feats)]
        # top-down: coarse upsampled into finer
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample2x(laterals[i + 1])
            up = up[:, :laterals[i].shape[1], :laterals[i].shape[2], :]
            laterals[i] = laterals[i] + up
        outs = [relu(BatchNorm(name=f"out_norm{i}")(
            Conv2d(ch, 3, 1, 1, name=f"out{i}")(l), train))
            for i, l in enumerate(laterals)]
        return outs
