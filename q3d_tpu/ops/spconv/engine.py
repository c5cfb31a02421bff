"""Sparse-convolution rulebook construction + gather-GEMM execution.

TPU-native replacement for the spconv CUDA engine (gather-GEMM-scatter with
GPU hash tables).  Re-architected for XLA's static-shape model:

  * rulebook = (M, K) gather-index matrix, built from binary search in the
    input's sorted linearized keys (``SparseConvTensor.lookup``) — misses
    point at a zero padding row, so no masks reach the GEMM;
  * execution = ONE MXU matmul per layer: gather (M, K, Cin) -> reshape
    (M, K*Cin) @ (K*Cin, Cout).  No scatter-add: both submanifold and strided
    sparse convs are expressed output-centric (each output site *pulls* its
    receptive inputs), which is the natural data-parallel formulation for a
    systolic-array machine;
  * strided convs generate their output coordinate set with the exact spconv
    semantics (dilation of the input set over the kernel footprint) via
    sort-based fixed-capacity deduplication.

Reference parity targets: spconv SubMConv3d/SparseConv3d/SparseInverseConv3d/
SubMConv2d/SparseConv2d as used by ``pcdet/models/backbones_3d/spconv_*.py``.
"""

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_tensor import SparseConvTensor, linearize, BIG_KEY


def _tuplify(v, nd):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * nd


def kernel_offsets(kernel_size, nd):
    """Enumerate kernel offsets in the layout order of spconv weights
    (Cout, k0, k1, ..., Cin): k0-major."""
    ks = _tuplify(kernel_size, nd)
    return np.array(list(itertools.product(*[range(k) for k in ks])),
                    dtype=np.int32), ks


def subm_gather_indices(st: SparseConvTensor, kernel_size, dilation=1):
    """Rulebook for submanifold conv: out coords == in coords.

    Returns (N, K) int32 gather indices into the (N+1)-row padded features.
    """
    nd = len(st.spatial_shape)
    st = st.with_hash()
    offsets, ks = kernel_offsets(kernel_size, nd)
    dil = _tuplify(dilation, nd)
    center = np.array([(k - 1) // 2 for k in ks], np.int32)
    rel = (offsets - center) * np.array(dil, np.int32)          # (K, nd)

    coords = st.indices                                          # (N, 1+nd)
    valid = st.valid
    qcoords = coords[:, None, 1:] + jnp.asarray(rel)[None, :, :]  # (N, K, nd)
    in_bounds = ((qcoords >= 0)
                 & (qcoords < jnp.asarray(st.spatial_shape, jnp.int32))).all(-1)
    b = jnp.broadcast_to(coords[:, None, 0:1], (*qcoords.shape[:2], 1))
    q = jnp.concatenate([b, qcoords], axis=-1).reshape(-1, 1 + nd)
    qkeys = linearize(q, st.spatial_shape, st.batch_size)
    qkeys = jnp.where((in_bounds & valid[:, None]).reshape(-1), qkeys, BIG_KEY)
    return st.lookup(qkeys).reshape(coords.shape[0], -1)


def sparse_conv_downsample(st: SparseConvTensor, kernel_size, stride, padding,
                           out_capacity=None):
    """Output coordinate generation + rulebook for strided SparseConvNd.

    spconv semantics: an output site o exists iff ANY kernel tap hits an
    input voxel, i.e. o = (i + p - k) / s for some input i, offset k with
    exact divisibility and in-bounds result.

    Returns (out_indices (M, 1+nd) int32, gather_idx (M, K) int32,
             out_spatial_shape tuple).
    """
    nd = len(st.spatial_shape)
    st = st.with_hash()
    offsets, ks = kernel_offsets(kernel_size, nd)
    s = np.array(_tuplify(stride, nd), np.int32)
    p = np.array(_tuplify(padding, nd), np.int32)
    out_spatial = tuple(
        (int(st.spatial_shape[d]) + 2 * int(p[d]) - int(ks[d])) // int(s[d]) + 1
        for d in range(nd))
    M = out_capacity or st.capacity

    coords = st.indices
    valid = st.valid
    # candidate outputs: for each input i, reachable o per dim are
    # floor((i+p)/s) - delta for delta in [0, ceil(k/s)) with
    # (i+p) - s*o < k — enumerating deltas instead of all K kernel offsets
    # shrinks the dedup-sort input by k^nd / prod(ceil(k/s)) (27 -> 8 for
    # the standard k=3, s=2 conv), divisibility being automatic
    deltas = np.array(list(itertools.product(
        *[range((int(ks[d]) - 1) // int(s[d]) + 1) for d in range(nd)])),
        np.int32)                                                # (Kc, nd)
    ip = coords[:, None, 1:] + jnp.asarray(p)[None, None, :]     # (N, 1, nd)
    o = ip // jnp.asarray(s)[None, None, :] - jnp.asarray(deltas)[None, :, :]
    tap = ip - o * jnp.asarray(s)[None, None, :]
    hit = ((tap >= 0) & (tap < jnp.asarray(ks, jnp.int32))).all(-1)
    in_bounds = ((o >= 0) & (o < jnp.asarray(out_spatial, jnp.int32))).all(-1)
    ok = hit & in_bounds & valid[:, None]
    b = jnp.broadcast_to(coords[:, None, 0:1], (*o.shape[:2], 1))
    cand = jnp.concatenate([b, o], axis=-1).reshape(-1, 1 + nd)
    ckeys = linearize(cand, out_spatial, st.batch_size)
    ckeys = jnp.where(ok.reshape(-1), ckeys, BIG_KEY)

    # fixed-capacity dedup: sort, flag firsts, compact into M slots
    skeys = jnp.sort(ckeys)
    first = jnp.concatenate([jnp.ones(1, bool), skeys[1:] != skeys[:-1]])
    first = first & (skeys != BIG_KEY)
    slot = jnp.cumsum(first) - 1                                  # unique rank
    slot = jnp.where(first & (slot < M), slot, M)
    out_keys = jnp.full(M + 1, BIG_KEY, jnp.int32).at[slot].set(skeys)[:M]

    # decode keys -> coords
    out_indices = _decode_keys(out_keys, out_spatial)

    # rulebook: for each output o and offset k, input at i = o*s - p + k
    out_valid = out_keys != BIG_KEY
    icoord = out_indices[:, None, 1:] * jnp.asarray(s)[None, None, :] \
        - jnp.asarray(p)[None, None, :] + jnp.asarray(offsets)[None, :, :]
    i_ok = ((icoord >= 0)
            & (icoord < jnp.asarray(st.spatial_shape, jnp.int32))).all(-1)
    ob = jnp.broadcast_to(out_indices[:, None, 0:1], (*icoord.shape[:2], 1))
    q = jnp.concatenate([ob, icoord], axis=-1).reshape(-1, 1 + nd)
    qkeys = linearize(q, st.spatial_shape, st.batch_size)
    qkeys = jnp.where((i_ok & out_valid[:, None]).reshape(-1), qkeys, BIG_KEY)
    gather_idx = st.lookup(qkeys).reshape(M, -1)
    return out_indices, gather_idx, out_spatial


def _decode_keys(keys, spatial_shape):
    nd = len(spatial_shape)
    rem = keys
    dims = [int(s) for s in spatial_shape]
    parts = []
    for d in reversed(range(nd)):
        parts.append(rem % dims[d])
        rem = rem // dims[d]
    parts.append(rem)  # batch
    out = jnp.stack(list(reversed(parts)), axis=1).astype(jnp.int32)
    return jnp.where((keys == BIG_KEY)[:, None], -1, out)


def inverse_conv_indices(st: SparseConvTensor, target_indices, target_spatial,
                         kernel_size, stride, padding):
    """Rulebook for SparseInverseConv: outputs live at ``target_indices`` (the
    coordinate set saved before the matching downsample conv); each output o
    pulls from the downsampled input at i = (o + p - k)/s when divisible.

    Returns gather_idx (M, K) into st's padded features.
    """
    nd = len(st.spatial_shape)
    st = st.with_hash()
    offsets, ks = kernel_offsets(kernel_size, nd)
    s = np.array(_tuplify(stride, nd), np.int32)
    p = np.array(_tuplify(padding, nd), np.int32)
    valid = target_indices[:, 0] >= 0
    num = target_indices[:, None, 1:] + jnp.asarray(p)[None, None, :] \
        - jnp.asarray(offsets)[None, :, :]
    div_ok = (num % jnp.asarray(s)[None, None, :] == 0).all(-1)
    i = num // jnp.asarray(s)[None, None, :]
    ok = div_ok & ((i >= 0) & (i < jnp.asarray(st.spatial_shape, jnp.int32))).all(-1)
    b = jnp.broadcast_to(target_indices[:, None, 0:1], (*i.shape[:2], 1))
    q = jnp.concatenate([b, i], axis=-1).reshape(-1, 1 + nd)
    qkeys = linearize(q, st.spatial_shape, st.batch_size)
    qkeys = jnp.where((ok & valid[:, None]).reshape(-1), qkeys, BIG_KEY)
    return st.lookup(qkeys).reshape(target_indices.shape[0], -1)


def gather_conv(features, gather_idx, weight, out_valid=None, out_scale=None,
                preferred_dtype=jnp.float32, gemm_transform=None):
    """Execute the conv: features (N, Cin), gather_idx (M, K),
    weight (K, Cin, Cout) -> (M, Cout).

    One (M, K*Cin) x (K*Cin, Cout) MXU GEMM; misses hit the zero pad row.
    int8 features/weights run as a true int8 GEMM accumulating int32, then
    rescale by ``out_scale`` (the dequantization factors) — the deployment
    path of the reference's QConvNd (quant/quant.py:6-58) with no
    fake-quant round trip.

    ``gemm_transform(g, w2d) -> (g, w2d)`` hooks per-COLUMN transformations
    on the im2col view — the sparse-conv gather matrix is exactly the unfold
    the reference's SQSubM2d densifies to build (quant/SQSubM2d.py:7-92), so
    SmoothQuant scale migration plugs in here with zero densification.
    """
    N, cin = features.shape
    K = gather_idx.shape[1]
    # miss rows point at index N: out-of-bounds under 'fill' -> zeros, so no
    # padded copy of the feature matrix is materialized per conv
    g = jnp.take(features, gather_idx.reshape(-1), axis=0, mode="fill",
                 fill_value=0).reshape(-1, K * cin)                # (M, K*Cin)
    w2d = weight.reshape(K * cin, -1)
    if gemm_transform is not None:
        g, w2d = gemm_transform(g, w2d)
    if features.dtype == jnp.int8:
        out = jnp.dot(g, w2d, preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32)
    else:
        out = jnp.dot(g, w2d.astype(g.dtype),
                      preferred_element_type=preferred_dtype)
        out = out.astype(features.dtype)
    if out_scale is not None:
        out = out * out_scale
    if out_valid is not None:
        out = out * out_valid[:, None].astype(out.dtype)
    return out
