"""Sparse conv layers (flax) with the reference fork's quantization hooks.

Layer kinds for quant-rule matching mirror the reference's swap targets
(``quant/quantize.py:13-43`` swaps spconv SubMConv3d/SparseConv3d for QConvNd;
``quant/quant_voxelnext.py`` adds the 2D sparse variants):

  subm_conv3d / sparse_conv3d / subm_conv2d / sparse_conv2d / inverse_conv3d

QConvNd parity (``quant/quant.py:6-58``): weight fake-quant per OUTPUT channel
over the (Cout, Cin*K) matrix view; activation fake-quant on the sparse
features per-tensor, or per INPUT channel when the rule's act spec has
``axis=1`` (the 'cw' flag path).  Because our engine's GEMM view is already
(K*Cin, Cout), the quantizers act on exactly the matrix the MXU consumes —
no permute/restore dance like the reference's per-forward weight mutation.

Weight storage layout: (K, Cin, Cout) where K enumerates kernel offsets
k0-major — a pure reshape away from both the GEMM view and spconv's native
(Cout, k0.., Cin) checkpoint layout (importer transposes once at load).
"""

import dataclasses
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...quant.rules import get_active_rules
from ...quant.tensor_quant import TensorQuantizer
from .sparse_tensor import SparseConvTensor
from . import engine
from . import pallas_conv


def _dotted_path(module):
    return ".".join(str(p) for p in module.path)


def _fmt(v):
    return "x".join(str(int(x)) for x in v) if isinstance(v, (tuple, list)) \
        else str(int(v))


def subm_cache_key(indice_key, spatial_shape, kernel_size, dilation):
    """String rulebook-cache key — shared between the flax modules and the
    host planner (q3d_tpu.ops.spconv.host_planner)."""
    return f"subm|{indice_key}|{_fmt(spatial_shape)}|{_fmt(kernel_size)}" \
           f"|{_fmt(dilation)}"


def down_cache_key(spatial_shape, kernel_size, stride, padding,
                   out_capacity):
    return f"down|{_fmt(spatial_shape)}|{_fmt(kernel_size)}|{_fmt(stride)}" \
           f"|{_fmt(padding)}|{out_capacity}"


def down_out_spatial(spatial_shape, kernel_size, stride, padding):
    nd = len(spatial_shape)
    ks = engine._tuplify(kernel_size, nd)
    s = engine._tuplify(stride, nd)
    p = engine._tuplify(padding, nd)
    return tuple((int(spatial_shape[d]) + 2 * int(p[d]) - int(ks[d]))
                 // int(s[d]) + 1 for d in range(nd))


def _np_prod(v):
    out = 1
    for x in v:
        out *= int(x)
    return out


class _SparseConvBase(nn.Module):
    out_channels: int
    kernel_size: Union[int, Tuple[int, ...]] = 3
    stride: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    dilation: int = 1
    use_bias: bool = False
    indice_key: Optional[str] = None
    # strided convs only: static output voxel capacity.  Downsampling merges
    # voxels, so the active count shrinks ~2-4x per stride; keeping the
    # input capacity wastes GEMM rows.  None = inherit input capacity
    # (always safe); a smaller cap drops the highest-key voxels on overflow.
    out_capacity: Optional[int] = None

    ND: int = 3
    KIND: str = "subm_conv3d"
    SUBM: bool = True

    def _weight(self, cin):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size,) * self.ND
        K = _np_prod(ks)
        fan_in = K * cin
        w = self.param("weight",
                       nn.initializers.variance_scaling(1/3, "fan_in", "uniform"),
                       (K, cin, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None
        return w, b

    def _quantize(self, features, weight, valid, feat_scale=None):
        """-> (features, weight, out_scale|None, gemm_transform|None).

        Plain QConvNd path fake-quants features/weights up front;
        SmoothQuant (SQSubM2d parity) returns a per-column transform applied
        on the gather/im2col view inside gather_conv; int8 deploy emits int8
        tensors + the output rescale factors.  int8-residency inputs
        (features already int8, ``feat_scale`` their dequant scale) skip the
        activation quantizer entirely.
        """
        rules = get_active_rules()
        rule = rules.lookup(_dotted_path(self), self.KIND) if rules else None
        if rule is None:
            if features.dtype == jnp.int8 and feat_scale is not None:
                # excluded layer fed by a residency chain: dequantize
                return (features.astype(jnp.float32) * feat_scale).astype(
                    jnp.bfloat16), weight, None, None
            return features, weight, None, None
        if (rule.deploy_int8 and features.dtype == jnp.int8
                and feat_scale is not None):
            wspec = dataclasses.replace(
                rule.weight, axis=2 if rule.weight.axis is not None else None)
            wq, s_w = TensorQuantizer(wspec, mode="int",
                                      name="weight_quant")(weight)
            out_scale = (feat_scale * s_w).reshape(1, -1)     # (1, Cout)
            return features, wq, out_scale, None
        feats = features * valid[:, None]          # keep padding out of amax
        if rule.smoothquant is not None and not rule.deploy_int8:
            sq = rule.smoothquant
            act_q = TensorQuantizer(rule.act, name="act_quant") \
                if rule.act is not None else None
            wspec = dataclasses.replace(
                rule.weight, axis=1 if rule.weight is not None
                and rule.weight.axis is not None else None) \
                if rule.weight is not None else None
            w_q = TensorQuantizer(wspec, name="weight_quant") \
                if wspec is not None else None
            amax_var = cmax_var = None
            if not sq.dynamic:
                # static SQ: calibrated per-gather-column activation amax
                # (reference SQSubM2d's saved column scales), collected into
                # 'calib' and committed by quant.api.compute_amax
                ncol = int(weight.shape[0]) * int(weight.shape[1])
                amax_var = self.variable(
                    "quant", "sq_act_amax",
                    lambda: jnp.ones(ncol, jnp.float32))
                if self.is_mutable_collection("calib"):
                    cmax_var = self.variable(
                        "calib", "sq_act_absmax",
                        lambda: jnp.zeros(ncol, jnp.float32))

            def transform(g, w2d):
                w_amax = jnp.maximum(jnp.max(jnp.abs(w2d), axis=1), 1e-5)
                if sq.dynamic:
                    a_amax = jax.lax.stop_gradient(jnp.maximum(
                        jnp.max(jnp.abs(g), axis=0), 1e-5))
                else:
                    if cmax_var is not None:
                        cmax_var.value = jnp.maximum(
                            cmax_var.value, jnp.abs(g).max(0))
                    a_amax = jnp.maximum(amax_var.value, 1e-5)
                scale = jax.lax.stop_gradient(jnp.maximum(
                    jnp.power(a_amax, sq.alpha)
                    / jnp.power(w_amax, 1 - sq.alpha), 1e-5))
                g = g / scale
                w2d = w2d * scale[:, None]
                if act_q is not None:
                    g = act_q(g)
                if w_q is not None:
                    w2d = w_q(w2d)
                return g, w2d

            return feats, weight, None, transform
        if rule.deploy_int8:
            # true-int8 path: requires per-tensor act scale so the output
            # rescale factors out of the GEMM
            assert rule.act is not None and rule.act.axis is None, \
                "int8 deploy needs per-tensor activation scales"
            aspec = dataclasses.replace(rule.act)
            fq, s_act = TensorQuantizer(aspec, mode="int", name="act_quant")(feats)
            wspec = dataclasses.replace(
                rule.weight, axis=2 if rule.weight.axis is not None else None)
            wq, s_w = TensorQuantizer(wspec, mode="int", name="weight_quant")(weight)
            out_scale = (s_act * s_w).reshape(1, -1)      # (1, Cout)
            return fq, wq, out_scale, None
        if rule.act is not None:
            feats = TensorQuantizer(rule.act, name="act_quant")(feats)
        w = weight
        if rule.weight is not None:
            wspec = dataclasses.replace(
                rule.weight, axis=2 if rule.weight.axis is not None else None)
            w = TensorQuantizer(wspec, name="weight_quant")(w)
        return feats, w, None, None


def _is_host_key(rulebook_cache, key):
    """True when ``key``'s rulebook was HOST-planned (seeded via
    batch_dict['rulebooks'], recorded under '__host_keys__').  The one-hot
    Pallas kernel only engages for host books: with device-built books the
    XLA scheduling of the prep + scalar-prefetch chain regresses ~2x."""
    if rulebook_cache is None:
        return False
    return key in rulebook_cache.get("__host_keys__", ())


def _get_chunk_prep(chunk, capacity, cin, rulebook_cache, cache_key,
                    dtype=None):
    """Cached pallas_conv.prepare_chunk for a rulebook (anchors/codes/
    span starts are pure functions of the chunk table).  Returns None when
    the one-hot kernel cannot apply, letting the wrapper fall back without
    computing spans.  (bm, s, pack) follow ``pallas_conv.block_for`` for
    the EXECUTION dtype — the same per-dtype policy the host planner builds
    preps for in C++, and the cache key embeds (bm, s, pack) so a host prep
    built under a different policy choice (e.g. a plan with a stale cin) is
    missed, not misused."""
    bm, s, _, pack = pallas_conv.block_for(capacity, cin, dtype)
    if not pallas_conv.onehot_conv_available(capacity, 0, s, bm):
        return None
    key = f"prep|{bm}x{s}p{pack}|{cache_key}"
    prep = rulebook_cache.get(key) if rulebook_cache is not None else None
    if prep is not None and len(prep) == 2:
        # host shipped the reduced (span_q, ovf) form: derive anchor/code
        # from the chunk table on device, once per rulebook per forward
        prep = pallas_conv.complete_prep(chunk, capacity, prep, bm)
        rulebook_cache[key] = prep
    if prep is None:
        prep = pallas_conv.prepare_chunk(chunk, capacity, bm, s, pack=pack)
        if rulebook_cache is not None:
            rulebook_cache[key] = prep
    return prep


def _get_probe(st, rulebook_cache):
    """Per-stage probe stack (engine.build_probe_stack), shared by every
    rulebook built from the same coordinate set.  Keyed by spatial shape —
    within one forward each spatial shape carries one coordinate set."""
    key = "tstack|" + _fmt(tuple(st.spatial_shape))
    probe = rulebook_cache.get(key) if rulebook_cache is not None else None
    if probe is None:
        probe = engine.build_probe_stack(st)
        if rulebook_cache is not None:
            rulebook_cache[key] = probe
    return probe


class _SubMConv(_SparseConvBase):
    @nn.compact
    def __call__(self, st: SparseConvTensor, rulebook_cache=None):
        w, b = self._weight(st.num_channels)
        cache_key = subm_cache_key(self.indice_key or "",
                                   tuple(st.spatial_shape),
                                   self.kernel_size, self.dilation)
        use_chunk = st.sorted_rows and engine.chunkable(
            self.kernel_size, self.dilation, self.ND)
        chunk = gather_idx = None
        if use_chunk:
            chunk = rulebook_cache.get("chunk|" + cache_key) \
                if rulebook_cache is not None else None
            if chunk is None:
                book = rulebook_cache.get(cache_key) \
                    if rulebook_cache is not None else None
                if book is not None:      # host-planned direct book
                    chunk = engine.chunk_anchor_code(book, st.capacity)
                else:                     # build chunked book directly
                    chunk = engine.subm_chunk_indices(
                        st, self.kernel_size, self.dilation,
                        probe=_get_probe(st, rulebook_cache))
                if rulebook_cache is not None:
                    rulebook_cache["chunk|" + cache_key] = chunk
        else:
            if rulebook_cache is not None:
                gather_idx = rulebook_cache.get(cache_key)
            if gather_idx is None:
                st = st.with_hash()
                gather_idx = engine.subm_gather_indices(
                    st, self.kernel_size, self.dilation)
                if rulebook_cache is not None:
                    rulebook_cache[cache_key] = gather_idx
        feats, w, out_scale, gt = self._quantize(st.features, w, st.valid,
                                                 st.feat_scale)
        if chunk is not None:
            host_books = _is_host_key(rulebook_cache, "chunk|" + cache_key)
            prep = _get_chunk_prep(chunk, st.capacity, st.num_channels,
                                   rulebook_cache, cache_key,
                                   dtype=feats.dtype) if host_books else None
            out = pallas_conv.gather_conv_chunked_fast(
                feats, st.keys(), st.indices[:, -1],
                int(st.spatial_shape[-1]), chunk, w,
                out_scale=out_scale, gemm_transform=gt, prep=prep,
                allow_kernel=host_books)
        else:
            out = engine.gather_conv(feats, gather_idx, w,
                                     out_scale=out_scale, gemm_transform=gt)
        if b is not None:
            out = out + b
        return st.replace(features=out, feat_scale=None)


class _SparseConv(_SparseConvBase):
    SUBM = False

    @nn.compact
    def __call__(self, st: SparseConvTensor, rulebook_cache=None):
        w, b = self._weight(st.num_channels)
        cache_key = down_cache_key(tuple(st.spatial_shape), self.kernel_size,
                                   self.stride, self.padding,
                                   self.out_capacity)
        use_chunk = st.sorted_rows and engine.chunkable(
            self.kernel_size, self.dilation, self.ND)
        cached = rulebook_cache.get(cache_key) if rulebook_cache is not None else None
        chunk = gather_idx = None
        if cached is not None and len(cached) == 2:
            # precomputed host rulebook (out_spatial is static math)
            out_indices, gather_idx = cached
            out_spatial = down_out_spatial(st.spatial_shape, self.kernel_size,
                                           self.stride, self.padding)
        elif cached is not None:
            out_indices, gather_idx, out_spatial = cached
        elif use_chunk:
            ck = rulebook_cache.get("chunkdown|" + cache_key) \
                if rulebook_cache is not None else None
            if ck is None:
                ck = engine.sparse_conv_downsample_chunk(
                    st, self.kernel_size, self.stride, self.padding,
                    out_capacity=self.out_capacity,
                    probe=_get_probe(st, rulebook_cache))
                if rulebook_cache is not None:
                    rulebook_cache["chunkdown|" + cache_key] = ck
                    rulebook_cache["coords_before|" + cache_key] = st.indices
            if len(ck) == 2:      # host-planned (out_spatial = static math)
                out_indices, chunk = ck
                out_spatial = down_out_spatial(
                    st.spatial_shape, self.kernel_size, self.stride,
                    self.padding)
            else:
                out_indices, chunk, out_spatial = ck
        else:
            out_indices, gather_idx, out_spatial = engine.sparse_conv_downsample(
                st, self.kernel_size, self.stride, self.padding,
                out_capacity=self.out_capacity)
            if rulebook_cache is not None:
                rulebook_cache[cache_key] = (out_indices, gather_idx, out_spatial)
                # save source coords so a matching inverse conv can restore them
                rulebook_cache["coords_before|" + cache_key] = st.indices
        if use_chunk and chunk is None:
            # direct book available (host-planned or cached): derive
            chunk = rulebook_cache.get("chunk|" + cache_key) \
                if rulebook_cache is not None else None
            if chunk is None:
                chunk = engine.chunk_anchor_code(gather_idx, st.capacity)
                if rulebook_cache is not None:
                    rulebook_cache["chunk|" + cache_key] = chunk
        feats, w, out_scale, gt = self._quantize(st.features, w, st.valid,
                                                 st.feat_scale)
        if chunk is not None:
            host_books = _is_host_key(rulebook_cache,
                                      "chunkdown|" + cache_key)
            prep = _get_chunk_prep(chunk, st.capacity, st.num_channels,
                                   rulebook_cache, cache_key,
                                   dtype=feats.dtype) if host_books else None
            out = pallas_conv.gather_conv_chunked_fast(
                feats, st.keys(), st.indices[:, -1],
                int(st.spatial_shape[-1]), chunk, w,
                out_valid=out_indices[:, 0] >= 0,
                out_scale=out_scale, gemm_transform=gt, prep=prep,
                allow_kernel=host_books)
        else:
            out = engine.gather_conv(feats, gather_idx, w,
                                     out_valid=out_indices[:, 0] >= 0,
                                     out_scale=out_scale, gemm_transform=gt)
        if b is not None:
            out = out + b * (out_indices[:, 0] >= 0)[:, None]
        return SparseConvTensor(features=out, indices=out_indices,
                                spatial_shape=out_spatial,
                                batch_size=st.batch_size,
                                sorted_rows=True)


def residency_rule(block, conv_name, kind):
    """The active int8-residency rule for a conv child of ``block`` (dotted
    path lookup like the conv itself will do), or None.  Blocks use this to
    decide whether to fold BN/ReLU/requant into the conv epilogue and emit
    int8 features (deploy path; requires eval + static act scales)."""
    rules = get_active_rules()
    if rules is None:
        return None
    path = ".".join([str(p) for p in block.path] + [conv_name])
    r = rules.lookup(path, kind)
    if r is not None and r.deploy_int8 and r.int8_residency:
        return r
    return None


def requant_epilogue(st, k, bias, act_spec, identity=None,
                     relu=True, conv_bias=None, name="out_quant"):
    """Shared residency epilogue: y = conv_out*k + b (BN fold) [+ identity]
    [relu] -> per-tensor int8 requant.  All elementwise — XLA fuses it into
    the GEMM output write, so the block never materializes an fp32/bf16
    feature matrix.  Returns the int8 tensor with its feat_scale."""
    y = st.features.astype(jnp.float32)
    if conv_bias is not None:
        y = y + conv_bias
    y = y * k + bias
    if identity is not None:
        id_f = identity.features.astype(jnp.float32)
        if identity.feat_scale is not None:
            id_f = id_f * identity.feat_scale
        y = y + id_f
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y * st.valid[:, None]               # pads stay exactly zero
    q, s = TensorQuantizer(act_spec, mode="int", name=name)(y)
    return st.replace(features=q, feat_scale=s)


def dequantize_tensor(st: SparseConvTensor, dtype=jnp.bfloat16):
    """Exit an int8-residency chain: real-valued features again."""
    if st.features.dtype == jnp.int8 and st.feat_scale is not None:
        f = (st.features.astype(jnp.float32) * st.feat_scale).astype(dtype)
        return st.replace(features=f, feat_scale=None)
    return st


class SubMConv3d(_SubMConv):
    ND: int = 3
    KIND: str = "subm_conv3d"


class SparseConv3d(_SparseConv):
    ND: int = 3
    KIND: str = "sparse_conv3d"


class SubMConv2d(_SubMConv):
    ND: int = 2
    KIND: str = "subm_conv2d"


class SparseConv2d(_SparseConv):
    ND: int = 2
    KIND: str = "sparse_conv2d"


class SparseInverseConv3d(_SparseConvBase):
    """Upsampling conv restoring a previously-seen coordinate set
    (spconv SparseInverseConv3d; reference UNetV2 decoder)."""
    ND: int = 3
    KIND: str = "inverse_conv3d"
    SUBM = False
    target_indices_key: Optional[str] = None

    @nn.compact
    def __call__(self, st: SparseConvTensor, target_indices,
                 target_spatial, rulebook_cache=None):
        w, b = self._weight(st.num_channels)
        gather_idx = engine.inverse_conv_indices(
            st, target_indices, target_spatial, self.kernel_size,
            self.stride, self.padding)
        feats, w, out_scale, gt = self._quantize(st.features, w, st.valid,
                                                 st.feat_scale)
        out = engine.gather_conv(feats, gather_idx, w,
                                 out_valid=target_indices[:, 0] >= 0,
                                 out_scale=out_scale, gemm_transform=gt)
        if b is not None:
            out = out + b * (target_indices[:, 0] >= 0)[:, None]
        return SparseConvTensor(features=out, indices=target_indices,
                                spatial_shape=tuple(int(s) for s in target_spatial),
                                batch_size=st.batch_size)


class SparseBatchNorm(nn.Module):
    """BatchNorm1d over sparse features with padding-aware statistics.

    Eval mode matches torch BatchNorm1d numerics on the valid rows; train mode
    computes masked batch stats (the reference's BN sees only real voxels
    because spconv tensors are unpadded — masking restores that semantics).
    """
    epsilon: float = 1e-3
    momentum: float = 0.01
    # static channel count, required only for fold mode (st=None)
    num_channels: Optional[int] = None

    @nn.compact
    def __call__(self, st: Optional[SparseConvTensor] = None,
                 train: bool = False):
        """st=None -> FOLD mode: declare the same params/stats and return the
        eval-time affine constants (k, b) with y = x*k + b, so a caller can
        fuse BN into a conv epilogue (int8-residency deploy path) while the
        variable tree stays identical to the unfused graph."""
        c = self.num_channels if st is None else st.features.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        if st is None:
            k = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return k, bias - ra_mean.value * k
        x = st.features
        if train:
            valid = st.valid
            n = jnp.maximum(valid.sum(), 1).astype(x.dtype)
            vm = valid[:, None].astype(x.dtype)
            mean = (x * vm).sum(0) / n
            var = (((x - mean) ** 2) * vm).sum(0) / n
            if self.is_mutable_collection("batch_stats"):
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * n / jnp.maximum(n - 1, 1)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return st.replace(features=y)
