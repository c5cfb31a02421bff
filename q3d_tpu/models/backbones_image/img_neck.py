"""GeneralizedLSSFPN — image feature pyramid neck.

Parity with reference ``backbones_image/img_neck/generalized_lss.py`` (76
LoC) at PARAMETER level: per level i the top-down path is
upsample(lateral[i+1]) -> CONCAT -> ``lateral_convs.i`` (1x1
BasicBlock2D conv+BN+ReLU) -> ``fpn_convs.i`` (3x3 BasicBlock2D), with
the topmost concat taking the RAW coarse input (so lateral conv i's input
channels are ``in[i] + (in[i+1] if last else out)``).  Module names mirror
the torch layout (``lateral_convs_{i}.conv/bn``) so reference BEVFusion
checkpoints import through ``utils.checkpoint.import_torch_state_dict``.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Conv2d, BatchNorm, relu


class _BasicBlock2D(nn.Module):
    """conv -> BN -> ReLU (reference model_utils/basic_block_2d.py)."""
    out_channels: int
    kernel_size: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train=False):
        x = Conv2d(self.out_channels, self.kernel_size, 1, self.padding,
                   use_bias=False, name="conv")(x)
        return relu(BatchNorm(name="bn")(x, train))


class GeneralizedLSSFPN(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: list of (B, Hi, Wi, Ci), fine -> coarse (Swin stages).
        Returns the FPN levels (finest first); BEVFusion consumes [0]."""
        cfg = self.model_cfg
        out_ch = int(cfg.get("OUT_CHANNELS", 256))
        start = int(cfg.get("START_LEVEL", 0))
        end = int(cfg.get("END_LEVEL", -1))
        n_in = len(feats)
        backbone_end = n_in - 1 if end == -1 else end

        laterals = [feats[i + start] for i in range(n_in - start)]
        used = backbone_end - start
        for i in range(used - 1, -1, -1):
            tgt = laterals[i].shape[1:3]
            up = jax.image.resize(
                laterals[i + 1],
                (laterals[i + 1].shape[0], tgt[0], tgt[1],
                 laterals[i + 1].shape[-1]), method="bilinear")
            cat = jnp.concatenate([laterals[i], up], axis=-1)
            x = _BasicBlock2D(out_ch, 1, 0,
                              name=f"lateral_convs_{i}")(cat, train)
            laterals[i] = _BasicBlock2D(out_ch, 3, 1,
                                        name=f"fpn_convs_{i}")(x, train)
        return [laterals[i] for i in range(used)]
