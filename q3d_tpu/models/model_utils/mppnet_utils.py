"""MPPNet building blocks — MLP, sequence-box PointNet, MLP-mixer proxy
blocks, and the group transformer.

Parity with reference ``models/model_utils/mppnet_utils.py`` (PointNetfeat,
PointNet, MLP, SpatialMixerBlock, Transformer/TransformerEncoderLayer):
per-group proxy-point tokens run an intra-group MLP-mixer over the 3D proxy
grid axes, a learnable group token summarizes each group via attention, and
(between encoder layers) groups exchange information through per-group
cross-attention onto an all-group fusion — re-expressed here in (B, L, C)
batched layout (no torch (L, B, C) permute dance) with static group slicing.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Linear
from .transfusion_utils import MultiheadAttention


class MLP(nn.Module):
    """num_layers Linear stack with ReLU between (reference MLP)."""
    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(Linear(self.hidden_dim, name=f"fc{i}")(x))
        return Linear(self.output_dim, name=f"fc{self.num_layers - 1}")(x)


class SeqBoxPointNet(nn.Module):
    """Trajectory-box encoder (reference PointNet/PointNetfeat over the time
    axis): conv1d-as-linear over per-frame 8-d box rows -> global max over
    time -> (aux box residuals, 256-d trajectory feature)."""
    code_size: int = 7
    channels: Tuple[int, ...] = (64, 128, 256)
    out_channels: int = 256

    @nn.compact
    def __call__(self, box_seq):
        # box_seq: (N, T, 8) canonicalized [xyz-rel, lwh, 0, t]
        x = box_seq
        for i, c in enumerate(self.channels):
            x = jax.nn.relu(Linear(c, name=f"feat{i}")(x))
        x = x.max(axis=1)                                      # (N, 256)
        feat = jax.nn.relu(Linear(self.out_channels, name="fc_feat")(x))
        reg = MLP(256, self.code_size, 3, name="fc_reg")(feat)
        return reg, feat


class SpatialMixerBlock(nn.Module):
    """MLP-mixer over the proxy grid's x/y/z axes + channel FFN (reference
    SpatialMixerBlock): tokens (B, g^3, C) viewed as (B, g, g, g, C)."""
    grid_size: int
    mixer_hidden: int = 16

    @nn.compact
    def __call__(self, src):
        B, P, C = src.shape
        g = self.grid_size
        x = src.reshape(B, g, g, g, C)                         # (B, z, y, x, C)

        def mix(x, axis, name):
            # MLP over the chosen spatial axis (channels last -> move axis
            # to the end, mix, move back)
            h = jnp.moveaxis(x, axis, -1)                      # (..., C, g)
            h = MLP(self.mixer_hidden, g, 3, name=name)(h)
            h = jnp.moveaxis(h, -1, axis)
            return nn.LayerNorm(name=name + "_norm")(x + h)

        x = mix(x, 3, "mixer_x")
        x = mix(x, 2, "mixer_y")
        x = mix(x, 1, "mixer_z")
        x = x.reshape(B, P, C)
        h = Linear(2 * C, name="ffn0")(x)
        h = Linear(C, name="ffn1")(jax.nn.relu(h))
        return nn.LayerNorm(name="norm_channel")(x + h)


class MPPNetEncoderLayer(nn.Module):
    """One encoder layer: intra-group mixer, token<-group attention, and
    (except after the final layer) inter-group cross-attention fusion.

    Layout: tokens (B, G, C); group features (B, G, P, C)."""
    d_model: int
    nhead: int
    dim_feedforward: int
    grid_size: int
    num_groups: int
    last: bool = False

    @nn.compact
    def __call__(self, token, groups):
        B, G, P, C = groups.shape
        mixed = SpatialMixerBlock(self.grid_size, name="mlp_mixer_3d")(
            groups.reshape(B * G, P, C)).reshape(B, G, P, C)

        # group token summarization (reference self_attn over [token, group])
        t = token.reshape(B * G, 1, C)
        k = mixed.reshape(B * G, P, C)
        summ = MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
            t, k, k)
        t = nn.LayerNorm(name="norm1")(t + summ)
        h = Linear(self.dim_feedforward, name="linear1")(t)
        h = Linear(self.d_model, name="linear2")(jax.nn.relu(h))
        t = nn.LayerNorm(name="norm2")(t + h)
        token = t.reshape(B, G, C)

        if not self.last:
            # inter-group fusion: each group cross-attends onto an MLP fusion
            # of all groups' aligned proxy tokens
            allg = mixed.transpose(0, 2, 1, 3).reshape(B, P, G * C)
            fused = MLP(self.d_model, self.d_model, 4,
                        name="fusion_all_groups")(allg)        # (B, P, C)
            outs = []
            for gi in range(self.num_groups):
                q = mixed[:, gi]
                att = MultiheadAttention(self.d_model, self.nhead,
                                         name=f"cross_attn_{gi}")(q, fused,
                                                                  fused)
                h = nn.LayerNorm(name=f"ffn_norm1_{gi}")(q + att)
                f = Linear(self.dim_feedforward, name=f"ffn_lin1_{gi}")(h)
                f = Linear(self.d_model, name=f"ffn_lin2_{gi}")(
                    jax.nn.relu(f))
                outs.append(nn.LayerNorm(name=f"ffn_norm2_{gi}")(h + f))
            mixed = jnp.stack(outs, axis=1)
        return token, mixed


class MPPNetTransformer(nn.Module):
    """Group transformer (reference Transformer): splits the T*P proxy
    sequence into num_groups groups (fusing group_length frames per group
    when T > num_groups), prepends learnable group tokens, and runs
    enc_layers encoder layers.  Returns (final group tokens (B, G, C),
    per-layer tokens list, final group features (B, G, P, C))."""
    cfg: Any                    # model_cfg.Transformer

    @nn.compact
    def __call__(self, src, pos=None):
        cfg = self.cfg
        G = int(cfg.num_groups)
        P = int(cfg.num_proxy_points)
        C = int(cfg.hidden_dim)
        T = int(cfg.num_frames)
        B = src.shape[0]                                       # (B, T*P, C)

        groups = src.reshape(B, T, P, C)
        if T > G:
            # fuse group_length frames per group (sequence_stride grouping)
            gl = T // G
            stride = int(cfg.get("sequence_stride", 1))
            if stride == 1:
                sel = [[g * gl + j for j in range(gl)] for g in range(G)]
            else:
                sel = [[g + j * stride for j in range(gl)] for g in range(G)]
            merged = jnp.stack(
                [jnp.concatenate([groups[:, i] for i in idxs], -1)
                 for idxs in sel], 1)                           # (B,G,P,gl*C)
            fused = MLP(C, C, 4, name="fusion_all_group")(merged)
            base = groups[:, :G]
            h = Linear(int(cfg.dim_feedforward), name="fusion_ffn0")(fused)
            h = Linear(C, name="fusion_ffn1")(jax.nn.relu(h))
            groups = nn.LayerNorm(name="fusion_norm")(base + h)
        # learnable per-group token
        token = self.param("token", nn.initializers.zeros, (1, G, C))
        token = jnp.broadcast_to(token, (B, G, C))
        if pos is not None:
            groups = groups + pos[None, None]

        tokens_per_layer = []
        n_layers = int(cfg.enc_layers)
        for li in range(n_layers):
            token, groups = MPPNetEncoderLayer(
                C, int(cfg.nheads), int(cfg.dim_feedforward),
                int(round(P ** (1 / 3))), G, last=(li == n_layers - 1),
                name=f"layer{li}")(token, groups)
            tokens_per_layer.append(token)
        return token, tokens_per_layer, groups
