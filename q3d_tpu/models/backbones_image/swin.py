"""SwinTransformer image backbone (flax).

Parity with reference ``backbones_image/swin.py`` (736 LoC + swin_utils 659):
patch embedding, window multi-head self-attention with alternating shifted
windows + relative position bias, MLP blocks, patch merging between stages;
returns the multi-scale feature pyramid for the FPN.  Written from the Swin
paper's architecture directly in NHWC; window partitioning is a reshape
(static shapes), shifts are ``jnp.roll`` — all MXU-batched attention.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        # x: (nW, L, C), L = ws*ws
        ws = self.window_size
        L = ws * ws
        d_head = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(-1, L, self.num_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("whqd,whkd->whqk", q, k) / np.sqrt(d_head)

        # relative position bias
        rpb = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                         ((2 * ws - 1) ** 2, self.num_heads))
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel + ws - 1)
        rel_idx = rel[0] * (2 * ws - 1) + rel[1]
        attn = attn + rpb[rel_idx].transpose(2, 0, 1)[None]

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(-1, nW, self.num_heads, L, L) \
                + attn_mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whqk,whkd->whqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, L, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            # attention mask separating wrapped regions
            img_mask = np.zeros((1, H, W, 1), np.float32)
            cnt = 0
            for h_sl in (slice(0, -ws), slice(-ws, -self.shift),
                         slice(-self.shift, None)):
                for w_sl in (slice(0, -ws), slice(-ws, -self.shift),
                             slice(-self.shift, None)):
                    img_mask[:, h_sl, w_sl, :] = cnt
                    cnt += 1
            mask_wins = window_partition(jnp.asarray(img_mask), ws)[..., 0]
            attn_mask = jnp.where(
                mask_wins[:, None, :] != mask_wins[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None
        wins = window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               name="attn")(wins, attn_mask)
        x = window_reverse(wins, ws, H, W)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(jax.nn.gelu(y))
        return x + y


class SwinTransformer(nn.Module):
    model_cfg: Any

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, 3) -> list of stage features (NHWC)."""
        cfg = self.model_cfg
        embed = int(cfg.get("EMBED_DIMS", 96))
        depths = list(cfg.get("DEPTHS", [2, 2, 6, 2]))
        heads = list(cfg.get("NUM_HEADS", [3, 6, 12, 24]))
        ws = int(cfg.get("WINDOW_SIZE", 7))
        out_indices = list(cfg.get("OUT_INDICES", [1, 2, 3]))

        x = nn.Conv(embed, (4, 4), strides=(4, 4), name="patch_embed")(images)
        x = nn.LayerNorm(name="embed_norm")(x)
        outs = []
        dim = embed
        for si, depth in enumerate(depths):
            for bi in range(depth):
                x = SwinBlock(dim, heads[si], ws,
                              shift=0 if bi % 2 == 0 else ws // 2,
                              name=f"stage{si}_block{bi}")(x)
            if si in out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{si}")(x))
            if si < len(depths) - 1:
                # patch merging: 2x2 concat + linear
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C) \
                    .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
                x = nn.Dense(2 * dim, name=f"merge{si}")(
                    nn.LayerNorm(name=f"merge_norm{si}")(x))
                dim *= 2
        return outs
