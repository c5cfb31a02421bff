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
        # exact (erf) GELU — torch F.gelu default; keeps imported reference
        # weights numerically aligned
        y = nn.Dense(self.dim, name="fc2")(
            jax.nn.gelu(y, approximate=False))
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
                # bias-free like the reference's PatchMerging reduction
                x = nn.Dense(2 * dim, use_bias=False, name=f"merge{si}")(
                    nn.LayerNorm(name=f"merge_norm{si}")(x))
                dim *= 2
        return outs


# ---------------------- reference checkpoint import ----------------------

def _mmcv_rel_position_index(ws):
    """mmcv WindowMSA's relative_position_index (reference swin.py:56-67):
    double_step_seq + transpose-add + flip(1).  Saved as a buffer in
    checkpoints; recomputed here for sd's that stripped buffers."""
    def double_step_seq(step1, len1, step2, len2):
        seq1 = np.arange(0, step1 * len1, step1)
        seq2 = np.arange(0, step2 * len2, step2)
        return (seq1[:, None] + seq2[None, :]).reshape(1, -1)

    rel_index_coords = double_step_seq(2 * ws - 1, ws, 1, ws)
    rel_position_index = rel_index_coords + rel_index_coords.T
    return rel_position_index[:, ::-1]


def _our_rel_position_index(ws):
    """The index our WindowAttention computes inline (paper formula)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel + ws - 1
    return rel[0] * (2 * ws - 1) + rel[1]


def convert_rel_pos_table(table, their_index, ws):
    """Re-key a relative-position-bias table from the checkpoint's index
    convention to ours: table_ours[our_idx[i,j]] = table[their_idx[i,j]].
    Both indexings are bijections over the same duplicate structure, so the
    scatter is consistent."""
    table = np.asarray(table)
    their_index = np.asarray(their_index).reshape(-1)
    ours = _our_rel_position_index(ws).reshape(-1)
    out = np.zeros_like(table)
    out[ours] = table[their_index]
    return out


def _merge_perm(C):
    """Permutation mapping torch nn.Unfold's 4C layout (channel-major:
    idx = c*4 + kpos, kpos row-major over the 2x2 kernel) to our concat
    layout (idx = kpos*C + c)."""
    perm = np.empty(4 * C, np.int64)
    for kpos in range(4):
        for c in range(C):
            perm[kpos * C + c] = c * 4 + kpos
    return perm


def import_swin_torch_weights(sd, cfg, prefix=""):
    """Reference/mmdet Swin .pth state dict -> our flax param tree.

    sd: dict of torch tensors (or numpy).  cfg keys as SwinTransformer's
    model_cfg.  Covers: patch embed conv + norm, per-block norms/attention
    (qkv, proj, re-keyed relative position bias), FFN, patch-merging norm +
    reduction (unfold-layout permuted), out norms.
    """
    import numpy as _np

    def g(name):
        v = sd[prefix + name]
        return _np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)

    def has(name):
        return (prefix + name) in sd

    embed = int(cfg.get("EMBED_DIMS", 96))
    depths = list(cfg.get("DEPTHS", [2, 2, 6, 2]))
    heads = list(cfg.get("NUM_HEADS", [3, 6, 12, 24]))
    ws = int(cfg.get("WINDOW_SIZE", 7))
    out_indices = list(cfg.get("OUT_INDICES", [1, 2, 3]))

    params = {}
    # patch embed: Conv2d OIHW -> HWIO
    params["patch_embed"] = {
        "kernel": g("patch_embed.projection.weight").transpose(2, 3, 1, 0),
        "bias": g("patch_embed.projection.bias")}
    params["embed_norm"] = {"scale": g("patch_embed.norm.weight"),
                            "bias": g("patch_embed.norm.bias")}
    dim = embed
    for si, depth in enumerate(depths):
        for bi in range(depth):
            p = f"stages.{si}.blocks.{bi}."
            blk = {}
            blk["norm1"] = {"scale": g(p + "norm1.weight"),
                            "bias": g(p + "norm1.bias")}
            blk["norm2"] = {"scale": g(p + "norm2.weight"),
                            "bias": g(p + "norm2.bias")}
            table = g(p + "attn.w_msa.relative_position_bias_table")
            if has(p + "attn.w_msa.relative_position_index"):
                their_idx = g(p + "attn.w_msa.relative_position_index")
            else:
                their_idx = _mmcv_rel_position_index(ws)
            blk["attn"] = {
                "qkv": {"kernel": g(p + "attn.w_msa.qkv.weight").T,
                        "bias": g(p + "attn.w_msa.qkv.bias")},
                "proj": {"kernel": g(p + "attn.w_msa.proj.weight").T,
                         "bias": g(p + "attn.w_msa.proj.bias")},
                "rel_pos_bias": convert_rel_pos_table(table, their_idx, ws),
            }
            blk["fc1"] = {"kernel": g(p + "ffn.layers.0.0.weight").T,
                          "bias": g(p + "ffn.layers.0.0.bias")}
            blk["fc2"] = {"kernel": g(p + "ffn.layers.1.weight").T,
                          "bias": g(p + "ffn.layers.1.bias")}
            params[f"stage{si}_block{bi}"] = blk
        if si in out_indices:
            params[f"out_norm{si}"] = {"scale": g(f"norm{si}.weight"),
                                       "bias": g(f"norm{si}.bias")}
        if si < len(depths) - 1:
            p = f"stages.{si}.downsample."
            perm = _merge_perm(dim)
            params[f"merge_norm{si}"] = {
                "scale": g(p + "norm.weight")[perm],
                "bias": g(p + "norm.bias")[perm]}
            params[f"merge{si}"] = {
                "kernel": g(p + "reduction.weight").T[perm, :]}
            dim *= 2
    return params
