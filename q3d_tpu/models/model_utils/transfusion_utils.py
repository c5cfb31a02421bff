"""TransFusion transformer pieces (flax).

Parity with reference ``model_utils/transfusion_utils.py``:
``PositionEmbeddingLearned`` (Conv1d k=1 MLP over query xy) and
``TransformerDecoderLayer`` (self-attn + cross-attn over flattened BEV +
FFN, post-norm).  Attention is built from our quant-aware ``Linear`` so the
reference's SQLinear quantization of the decoder (``quant_transfusion.py``)
maps onto 'linear'-kind rules here.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Linear, Conv1d, BatchNorm


def clip_sigmoid(x, eps=1e-4):
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


class PositionEmbeddingLearned(nn.Module):
    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        # xyz: (B, P, 2)
        x = Conv1d(self.num_pos_feats, 1, name="conv0")(xyz)
        B, P, C = x.shape
        x = BatchNorm(epsilon=1e-5, momentum=0.1, name="norm")(
            x.reshape(B * P, C), train).reshape(B, P, C)
        x = jax.nn.relu(x)
        return Conv1d(self.num_pos_feats, 1, name="conv1")(x)


class MultiheadAttention(nn.Module):
    """Standard MHA from quantizable Linears; (B, L, C) layout."""
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v):
        d_head = self.d_model // self.num_heads
        B, Lq, _ = q.shape
        Lk = k.shape[1]

        def split(x):
            return x.reshape(B, -1, self.num_heads, d_head).transpose(0, 2, 1, 3)

        qh = split(Linear(self.d_model, name="q_proj")(q))
        kh = split(Linear(self.d_model, name="k_proj")(k))
        vh = split(Linear(self.d_model, name="v_proj")(v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / jnp.sqrt(d_head).astype(attn.dtype), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
        return Linear(self.d_model, name="out_proj")(out)


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    cross_only: bool = False

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool = False):
        """query: (B, P, C); key: (B, L, C); query_pos: (B, P, 2);
        key_pos: (B, L, 2)."""
        act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu}[self.activation]
        q_embed = PositionEmbeddingLearned(self.d_model, name="self_posembed")(
            query_pos, train)
        k_embed = PositionEmbeddingLearned(self.d_model, name="cross_posembed")(
            key_pos, train)

        if not self.cross_only:
            qkv = query + q_embed
            attn_out = MultiheadAttention(self.d_model, self.nhead,
                                          name="self_attn")(qkv, qkv, qkv)
            query = nn.LayerNorm(name="norm1")(query + attn_out)

        attn_out = MultiheadAttention(self.d_model, self.nhead,
                                      name="multihead_attn")(
            query + q_embed, key + k_embed, key + k_embed)
        query = nn.LayerNorm(name="norm2")(query + attn_out)

        ff = Linear(self.dim_feedforward, name="linear1")(query)
        ff = Linear(self.d_model, name="linear2")(act(ff))
        return nn.LayerNorm(name="norm3")(query + ff)
