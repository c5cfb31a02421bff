"""Swin checkpoint-fidelity: reference/mmcv-layout torch weights import into
our flax SwinTransformer and produce the SAME features (torch forward
re-implemented here with mmcv's exact semantics: channel-major unfold patch
merging, double_step_seq relative-position index, qkv fused linear)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from q3d_tpu.config import EDict
from q3d_tpu.models.backbones_image.swin import (
    SwinTransformer, import_swin_torch_weights, _mmcv_rel_position_index)

CFG = EDict({"EMBED_DIMS": 16, "DEPTHS": [2, 2], "NUM_HEADS": [2, 4],
             "WINDOW_SIZE": 7, "OUT_INDICES": [0, 1]})


def _make_state_dict(rng):
    """Random weights in the reference's (mmdet/mmcv) naming + layouts."""
    sd = {}
    E, ws = CFG.EMBED_DIMS, CFG.WINDOW_SIZE

    def t(*shape):
        return torch.tensor(rng.normal(0, 0.05, shape).astype(np.float32))

    sd["patch_embed.projection.weight"] = t(E, 3, 4, 4)
    sd["patch_embed.projection.bias"] = t(E)
    sd["patch_embed.norm.weight"] = 1 + t(E)
    sd["patch_embed.norm.bias"] = t(E)
    dim = E
    for si, depth in enumerate(CFG.DEPTHS):
        nh = CFG.NUM_HEADS[si]
        for bi in range(depth):
            p = f"stages.{si}.blocks.{bi}."
            sd[p + "norm1.weight"] = 1 + t(dim)
            sd[p + "norm1.bias"] = t(dim)
            sd[p + "norm2.weight"] = 1 + t(dim)
            sd[p + "norm2.bias"] = t(dim)
            sd[p + "attn.w_msa.qkv.weight"] = t(3 * dim, dim)
            sd[p + "attn.w_msa.qkv.bias"] = t(3 * dim)
            sd[p + "attn.w_msa.proj.weight"] = t(dim, dim)
            sd[p + "attn.w_msa.proj.bias"] = t(dim)
            sd[p + "attn.w_msa.relative_position_bias_table"] = \
                t((2 * ws - 1) ** 2, nh)
            sd[p + "attn.w_msa.relative_position_index"] = torch.tensor(
                np.ascontiguousarray(_mmcv_rel_position_index(ws)))
            sd[p + "ffn.layers.0.0.weight"] = t(4 * dim, dim)
            sd[p + "ffn.layers.0.0.bias"] = t(4 * dim)
            sd[p + "ffn.layers.1.weight"] = t(dim, 4 * dim)
            sd[p + "ffn.layers.1.bias"] = t(dim)
        if si in CFG.OUT_INDICES:
            sd[f"norm{si}.weight"] = 1 + t(dim)
            sd[f"norm{si}.bias"] = t(dim)
        if si < len(CFG.DEPTHS) - 1:
            p = f"stages.{si}.downsample."
            sd[p + "norm.weight"] = 1 + t(4 * dim)
            sd[p + "norm.bias"] = t(4 * dim)
            sd[p + "reduction.weight"] = t(2 * dim, 4 * dim)
            dim *= 2
    return sd


def _torch_window_attn(x, sd, p, nh, ws, shift, H, W):
    """mmcv ShiftWindowMSA semantics on (B, H, W, C) torch tensor."""
    B, _, _, C = x.shape
    if shift:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
        img_mask = torch.zeros(1, H, W, 1)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img_mask[:, hs, wsl, :] = cnt
                cnt += 1
        mw = img_mask.view(1, H // ws, ws, W // ws, ws, 1).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
        attn_mask = (mw.unsqueeze(1) - mw.unsqueeze(2))
        attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
    else:
        attn_mask = None
    wins = x.view(B, H // ws, ws, W // ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    L = ws * ws
    qkv = F.linear(wins, sd[p + "attn.w_msa.qkv.weight"],
                   sd[p + "attn.w_msa.qkv.bias"])
    qkv = qkv.reshape(-1, L, 3, nh, C // nh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (C // nh) ** -0.5) @ k.transpose(-2, -1)
    table = sd[p + "attn.w_msa.relative_position_bias_table"]
    idx = sd[p + "attn.w_msa.relative_position_index"].reshape(-1).long()
    bias = table[idx].view(L, L, nh).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if attn_mask is not None:
        nW = attn_mask.shape[0]
        attn = attn.view(-1, nW, nh, L, L) + attn_mask.unsqueeze(1)
        attn = attn.view(-1, nh, L, L)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, L, C)
    out = F.linear(out, sd[p + "attn.w_msa.proj.weight"],
                   sd[p + "attn.w_msa.proj.bias"])
    x = out.view(B, H // ws, W // ws, ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if shift:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    return x


def _torch_forward(sd, images):
    """Reference Swin forward (mmcv semantics), NHWC in/out."""
    ws = CFG.WINDOW_SIZE
    x = torch.tensor(images).permute(0, 3, 1, 2)
    x = F.conv2d(x, sd["patch_embed.projection.weight"],
                 sd["patch_embed.projection.bias"], stride=4)
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (x.shape[-1],), sd["patch_embed.norm.weight"],
                     sd["patch_embed.norm.bias"])
    outs = []
    dim = CFG.EMBED_DIMS
    for si, depth in enumerate(CFG.DEPTHS):
        nh = CFG.NUM_HEADS[si]
        B, H, W, C = x.shape
        for bi in range(depth):
            p = f"stages.{si}.blocks.{bi}."
            shortcut = x
            y = F.layer_norm(x, (C,), sd[p + "norm1.weight"],
                             sd[p + "norm1.bias"])
            y = _torch_window_attn(y, sd, p, nh, ws,
                                   0 if bi % 2 == 0 else ws // 2, H, W)
            x = shortcut + y
            y = F.layer_norm(x, (C,), sd[p + "norm2.weight"],
                             sd[p + "norm2.bias"])
            y = F.linear(y, sd[p + "ffn.layers.0.0.weight"],
                         sd[p + "ffn.layers.0.0.bias"])
            y = F.gelu(y)
            y = F.linear(y, sd[p + "ffn.layers.1.weight"],
                         sd[p + "ffn.layers.1.bias"])
            x = x + y
        if si in CFG.OUT_INDICES:
            outs.append(F.layer_norm(x, (C,), sd[f"norm{si}.weight"],
                                     sd[f"norm{si}.bias"]))
        if si < len(CFG.DEPTHS) - 1:
            p = f"stages.{si}.downsample."
            # mmcv PatchMerging: nn.Unfold(k=2, s=2) -> LN -> Linear
            u = F.unfold(x.permute(0, 3, 1, 2), kernel_size=2, stride=2)
            u = u.transpose(1, 2)                       # (B, L, 4C)
            u = F.layer_norm(u, (4 * C,), sd[p + "norm.weight"],
                             sd[p + "norm.bias"])
            u = F.linear(u, sd[p + "reduction.weight"])
            x = u.view(B, H // 2, W // 2, 2 * C)
            dim *= 2
    return [o.detach().numpy() for o in outs]


def test_swin_import_matches_reference_forward():
    rng = np.random.RandomState(0)
    sd = _make_state_dict(rng)
    images = rng.normal(0, 1, (1, 56, 56, 3)).astype(np.float32)

    ref_outs = _torch_forward(sd, images)

    import jax
    model = SwinTransformer(model_cfg=CFG)
    variables = model.init(jax.random.PRNGKey(0), images)
    imported = import_swin_torch_weights(sd, CFG)
    # imported tree must cover every param the module declares
    import flax
    ours = flax.core.unfreeze(variables)["params"]
    assert set(ours.keys()) == set(imported.keys()), (
        set(ours) ^ set(imported))
    outs = model.apply({"params": imported}, images)
    assert len(outs) == len(ref_outs)
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o), r, atol=5e-4), (o.shape)


def test_rel_pos_table_rekey_roundtrip():
    from q3d_tpu.models.backbones_image.swin import (
        convert_rel_pos_table, _our_rel_position_index)
    ws = 7
    rng = np.random.RandomState(1)
    table = rng.normal(size=((2 * ws - 1) ** 2, 3))
    their_idx = _mmcv_rel_position_index(ws)
    ours_idx = _our_rel_position_index(ws)
    out = convert_rel_pos_table(table, their_idx, ws)
    np.testing.assert_allclose(out[ours_idx.reshape(-1)],
                               table[np.asarray(their_idx).reshape(-1)])
