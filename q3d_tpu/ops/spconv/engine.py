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

from .sparse_tensor import (SparseConvTensor, linearize, BIG_KEY,
                            _DENSE_TABLE_MAX)


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


def _table_size(spatial_shape, batch_size):
    size = int(batch_size)
    for s in spatial_shape:
        size *= int(s)
    return size


def build_probe_stack(st: SparseConvTensor):
    """Dense key->row table reshaped for WIDE chunk probes.

    Returns (stack (RA+RB, 16) int32, RA).  Copy A row r covers keys
    [16r, 16r+16); copy B row r covers keys [16r+8, 16r+24) — any
    3-consecutive-key triple fits entirely in one row of one copy.  Entry =
    voxel row id, or capacity (miss).  One row gather then replaces three
    single-element table lookups, which are the row-latency-bound cost that
    made on-device rulebook construction ~40 ms/frame.
    """
    size = _table_size(st.spatial_shape, st.batch_size)
    N = st.capacity
    keys = st.keys()
    safe = jnp.where(keys == BIG_KEY, size, keys)
    L = ((size + 40) // 16) * 16 + 8
    flat = jnp.full(L, N, jnp.int32).at[safe].set(
        jnp.arange(N, dtype=jnp.int32))
    flat = flat.at[size].set(N)                 # pad rows all dumped here
    ra = L // 16
    rb = (L - 8) // 16
    stack = jnp.concatenate(
        [flat[:ra * 16].reshape(ra, 16), flat[8:8 + rb * 16].reshape(rb, 16)],
        axis=0)
    return stack, ra


def probe_chunk(stack, ra, base_keys, tap_ok, capacity):
    """Probe the three consecutive keys [b, b+2] per entry with ONE wide row
    gather; -> (R,) chunk gather ids (anchor + code*capacity, 3*capacity =
    all-miss) for ``gather_conv_chunked``.

    tap_ok (R, 3): per-tap coordinate validity (x bounds per tap + the
    non-x / batch validity shared by the triple).
    """
    b = base_keys
    oA = b & 15
    useB = (oA > 13) & (b >= 0)
    kb = b - 8 * useB.astype(jnp.int32)
    fix = b == -1          # x-1 probe at the global origin: keep taps 1, 2
    row = jnp.where(fix, 0, (kb >> 4) + useB.astype(jnp.int32) * ra)
    pos = jnp.where(fix, -1, kb & 15)
    rows = jnp.take(stack, row, axis=0, mode="fill", fill_value=capacity)
    lane = jnp.arange(16, dtype=jnp.int32)[None, :]
    vals = []
    for j in range(3):
        pj = pos + j
        vj = jnp.sum(jnp.where(lane == pj[:, None], rows, 0), axis=1)
        vals.append(jnp.where(tap_ok[:, j] & (pj >= 0), vj, capacity))
    v0, v1, v2 = vals
    p0 = v0 != capacity
    p1 = v1 != capacity
    code = jnp.where(p0, 0, jnp.where(p1, 1, 2))
    anchor = jnp.where(p0, v0, jnp.where(p1, v1, v2))
    return anchor + code * capacity


def _key_strides(spatial_shape):
    """stride of each coordinate (incl. batch) in the linearized key."""
    nd = len(spatial_shape)
    strides = [1] * (nd + 1)
    for d in reversed(range(nd)):
        strides[d] = strides[d + 1] * int(spatial_shape[d])
    return strides                      # [batch, dim0, .., dim_{nd-1}=1]


def subm_chunk_indices(st: SparseConvTensor, kernel_size, dilation=1,
                       probe=None):
    """Chunked rulebook for submanifold conv, built DIRECTLY (no (N, K)
    intermediate): (N, K/3) chunk gather ids.  Requires ks[-1] == 3,
    dil[-1] == 1 (``chunkable``).  probe: optional cached
    ``build_probe_stack`` result."""
    nd = len(st.spatial_shape)
    ks = _tuplify(kernel_size, nd)
    dil = _tuplify(dilation, nd)
    stack, ra = probe if probe is not None else build_probe_stack(st)
    # non-x offsets (k0-major ordering, matching weight layout)
    head = np.array(list(itertools.product(*[range(k) for k in ks[:-1]])),
                    np.int32)                                  # (G, nd-1)
    center = np.array([(k - 1) // 2 for k in ks[:-1]], np.int32)
    rel = (head - center) * np.array(dil[:-1], np.int32)       # (G, nd-1)
    strides = _key_strides(st.spatial_shape)
    key = linearize(st.indices, st.spatial_shape, st.batch_size)
    delta = rel @ np.array(strides[1:nd], np.int32)            # (G,)
    base = key[:, None] + jnp.asarray(delta)[None, :] - 1      # (N, G)

    coords = st.indices[:, 1:nd]                               # non-x dims
    q = coords[:, None, :] + jnp.asarray(rel)[None, :, :]
    plane_ok = ((q >= 0) &
                (q < jnp.asarray(st.spatial_shape[:-1], jnp.int32))).all(-1)
    plane_ok = plane_ok & st.valid[:, None]                    # (N, G)
    x = st.indices[:, -1:]
    nx = int(st.spatial_shape[-1])
    tap_ok = jnp.stack([(x - 1 + j >= 0) & (x - 1 + j < nx)
                        for j in range(3)], axis=-1)           # (N, 1, 3)
    tap_ok = tap_ok & plane_ok[:, :, None]
    N, G = base.shape
    out = probe_chunk(stack, ra, base.reshape(-1),
                      tap_ok.reshape(-1, 3), st.capacity)
    return out.reshape(N, G)


def _dedup_keys_dense(ckeys, out_size, M):
    """Sorted-unique compaction of candidate keys via a dense occupancy
    grid + cumsum (replaces the O(n log^2 n) XLA sort when the output grid
    fits): -> (M,) ascending unique keys, BIG_KEY padded, lowest-M kept on
    overflow (same semantics as the sort path)."""
    safe = jnp.minimum(ckeys, out_size)        # invalid (BIG_KEY) -> dump
    occ = jnp.zeros(out_size + 1, jnp.int32).at[safe].set(1)
    occ = occ.at[out_size].set(0)
    rank = jnp.cumsum(occ) - 1                 # rank of each occupied cell
    slot = jnp.take(rank, safe)
    slot = jnp.where((ckeys < out_size) & (slot < M), slot, M)
    return jnp.full(M + 1, BIG_KEY, jnp.int32).at[slot].set(ckeys)[:M]


def downsample_out_keys(st: SparseConvTensor, kernel_size, stride, padding,
                        out_capacity=None):
    """Output coordinate generation for strided SparseConvNd (spconv
    semantics — see ``sparse_conv_downsample``): -> (out_indices (M, 1+nd),
    out_spatial)."""
    nd = len(st.spatial_shape)
    offsets, ks = kernel_offsets(kernel_size, nd)
    s = np.array(_tuplify(stride, nd), np.int32)
    p = np.array(_tuplify(padding, nd), np.int32)
    out_spatial = tuple(
        (int(st.spatial_shape[d]) + 2 * int(p[d]) - int(ks[d])) // int(s[d]) + 1
        for d in range(nd))
    M = out_capacity or st.capacity
    coords = st.indices
    valid = st.valid
    deltas = np.array(list(itertools.product(
        *[range((int(ks[d]) - 1) // int(s[d]) + 1) for d in range(nd)])),
        np.int32)
    ip = coords[:, None, 1:] + jnp.asarray(p)[None, None, :]
    o = ip // jnp.asarray(s)[None, None, :] - jnp.asarray(deltas)[None, :, :]
    tap = ip - o * jnp.asarray(s)[None, None, :]
    hit = ((tap >= 0) & (tap < jnp.asarray(ks, jnp.int32))).all(-1)
    in_bounds = ((o >= 0) & (o < jnp.asarray(out_spatial, jnp.int32))).all(-1)
    ok = hit & in_bounds & valid[:, None]
    b = jnp.broadcast_to(coords[:, None, 0:1], (*o.shape[:2], 1))
    cand = jnp.concatenate([b, o], axis=-1).reshape(-1, 1 + nd)
    ckeys = linearize(cand, out_spatial, st.batch_size)
    ckeys = jnp.where(ok.reshape(-1), ckeys, BIG_KEY)

    out_size = _table_size(out_spatial, st.batch_size)
    if out_size <= _DENSE_TABLE_MAX:
        out_keys = _dedup_keys_dense(ckeys, out_size, M)
    else:
        skeys = jnp.sort(ckeys)
        first = jnp.concatenate([jnp.ones(1, bool), skeys[1:] != skeys[:-1]])
        first = first & (skeys != BIG_KEY)
        slot = jnp.cumsum(first) - 1
        slot = jnp.where(first & (slot < M), slot, M)
        out_keys = jnp.full(M + 1, BIG_KEY, jnp.int32).at[slot].set(skeys)[:M]
    return _decode_keys(out_keys, out_spatial), out_spatial


def sparse_conv_downsample_chunk(st: SparseConvTensor, kernel_size, stride,
                                 padding, out_capacity=None, probe=None):
    """Chunked-rulebook variant of ``sparse_conv_downsample``: -> (out_indices,
    chunk_idx (M, K/3), out_spatial).  Requires ks[-1] == 3 (the three x taps
    of each group are consecutive input keys regardless of stride)."""
    nd = len(st.spatial_shape)
    ks = _tuplify(kernel_size, nd)
    s = np.array(_tuplify(stride, nd), np.int32)
    p = np.array(_tuplify(padding, nd), np.int32)
    out_indices, out_spatial = downsample_out_keys(
        st, kernel_size, stride, padding, out_capacity)
    stack, ra = probe if probe is not None else build_probe_stack(st)

    head = np.array(list(itertools.product(*[range(k) for k in ks[:-1]])),
                    np.int32)                                  # (G, nd-1)
    strides = _key_strides(st.spatial_shape)
    out_valid = out_indices[:, 0] >= 0
    # input tap coords: i = o*s - p + k ; x base tap kx=0
    i_head = out_indices[:, None, 1:nd] * jnp.asarray(s[:-1])[None, None, :] \
        - jnp.asarray(p[:-1])[None, None, :] + jnp.asarray(head)[None, :, :]
    plane_ok = ((i_head >= 0) &
                (i_head < jnp.asarray(st.spatial_shape[:-1],
                                      jnp.int32))).all(-1)     # (M, G)
    plane_ok = plane_ok & out_valid[:, None]
    x0 = out_indices[:, -1:] * int(s[-1]) - int(p[-1])         # (M, 1)
    nx = int(st.spatial_shape[-1])
    tap_ok = jnp.stack([(x0 + j >= 0) & (x0 + j < nx)
                        for j in range(3)], axis=-1)           # (M, 1, 3)
    tap_ok = tap_ok & plane_ok[:, :, None]
    # base keys: batch stride + per-dim head coords + x base tap
    base = out_indices[:, 0].astype(jnp.int32)[:, None] * strides[0]
    for d in range(nd - 1):
        base = base + i_head[..., d] * strides[d + 1]
    base = base + x0
    M, G = base.shape
    out = probe_chunk(stack, ra, base.reshape(-1),
                      tap_ok.reshape(-1, 3), st.capacity)
    return out_indices, out.reshape(M, G), out_spatial


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


def _im2col_gemm(g, weight, features_dtype, out_valid, out_scale,
                 preferred_dtype, gemm_transform):
    """Shared GEMM + quant epilogue: g (M, K*Cin) @ weight (K, Cin, Cout).

    int8 g/weights run as a true int8 GEMM accumulating int32, then rescale
    by ``out_scale`` (the dequantization factors) — the deployment path of
    the reference's QConvNd (quant/quant.py:6-58) with no fake-quant round
    trip.

    ``gemm_transform(g, w2d) -> (g, w2d)`` hooks per-COLUMN transformations
    on the im2col view — the sparse-conv gather matrix is exactly the unfold
    the reference's SQSubM2d densifies to build (quant/SQSubM2d.py:7-92), so
    SmoothQuant scale migration plugs in here with zero densification.
    """
    w2d = weight.reshape(g.shape[1], -1)
    if gemm_transform is not None:
        g, w2d = gemm_transform(g, w2d)
    if features_dtype == jnp.int8:
        out = jnp.dot(g, w2d, preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32)
    else:
        out = jnp.dot(g, w2d.astype(g.dtype),
                      preferred_element_type=preferred_dtype)
        out = out.astype(features_dtype)
    if out_scale is not None:
        out = out * out_scale
    if out_valid is not None:
        out = out * out_valid[:, None].astype(out.dtype)
    return out


def gather_conv(features, gather_idx, weight, out_valid=None, out_scale=None,
                preferred_dtype=jnp.float32, gemm_transform=None):
    """Execute the conv: features (N, Cin), gather_idx (M, K),
    weight (K, Cin, Cout) -> (M, Cout).

    One (M, K*Cin) x (K*Cin, Cout) MXU GEMM; misses hit the zero pad row.
    """
    N, cin = features.shape
    K = gather_idx.shape[1]
    # miss rows point at index N: out-of-bounds under 'fill' -> zeros, so no
    # padded copy of the feature matrix is materialized per conv
    g = jnp.take(features, gather_idx.reshape(-1), axis=0, mode="fill",
                 fill_value=0).reshape(-1, K * cin)                # (M, K*Cin)
    return _im2col_gemm(g, weight, features.dtype, out_valid, out_scale,
                        preferred_dtype, gemm_transform)


def chunkable(kernel_size, dilation, nd):
    """The chunked gather applies when the LAST (x, fastest-key) kernel dim
    is 3 with dilation 1: the three x taps of each (..other dims..) group
    then sit at consecutive linearized keys."""
    ks = _tuplify(kernel_size, nd)
    dil = _tuplify(dilation, nd)
    return int(ks[-1]) == 3 and int(dil[-1]) == 1


def chunk_anchor_code(gather_idx, capacity):
    """Derive the (M, K/3) chunked gather-index table from a direct (M, K)
    rulebook whose columns enumerate kernel offsets k0-major (x fastest,
    kx in {0,1,2}).

    Each x-triple is served by ONE row of the stacked window matrix
    (``x_window_matrix`` output tiled 3x with pre-shifted channel layouts):
    table entry = anchor + code * N, where anchor = row id of the FIRST
    present tap and code in {0,1,2} = which tap it is (selecting the shift
    variant that aligns slot j with tap dx = j-1).  No taps present ->
    3N = one-past-the-stack -> mode='fill' zeros.
    Cache the result per indice_key: all convs sharing a rulebook share it.
    """
    M, K = gather_idx.shape
    b3 = gather_idx.reshape(M, K // 3, 3)
    p0 = b3[..., 0] != capacity
    p1 = b3[..., 1] != capacity
    code = jnp.where(p0, 0, jnp.where(p1, 1, 2)).astype(jnp.int32)
    anchor = jnp.where(p0, b3[..., 0], jnp.where(p1, b3[..., 1], b3[..., 2]))
    return anchor + code * capacity


def x_window_matrix(features, keys, xcol, nx):
    """(N, 3C) forward x-window: row i = [f_i, f@(key_i+1), f@(key_i+2)].

    Valid only on key-SORTED storage: the voxel at key+1 (same b,z,y, x+1),
    when present, is literally the next row — a roll + key-adjacency compare
    replaces a gather.  Slots mask to zero when the successor key is absent
    or the window would wrap past x = nx-1 into the next y-row.
    """
    nxt1 = jnp.roll(features, -1, axis=0)
    nxt2 = jnp.roll(features, -2, axis=0)
    k1 = jnp.roll(keys, -1)
    k2 = jnp.roll(keys, -2)
    adj1 = (k1 == keys + 1) & (xcol < nx - 1)
    # keys are strictly increasing on real rows, so k2 == keys+2 implies the
    # middle row holds key+1; the (x+1 absent, x+2 present) case instead has
    # k1 == keys+2 — the two conditions are disjoint.
    adj2 = (k2 == keys + 2) & (xcol < nx - 2)
    adj12 = (k1 == keys + 2) & (xcol < nx - 2)
    zero = jnp.zeros_like(features)
    slot1 = jnp.where(adj1[:, None], nxt1, zero)
    slot2 = jnp.where(adj2[:, None], nxt2,
                      jnp.where(adj12[:, None], nxt1, zero))
    return jnp.concatenate([features, slot1, slot2], axis=-1)


def gather_conv_chunked(features, keys, xcol, nx, chunk_idx, weight,
                        out_valid=None, out_scale=None,
                        preferred_dtype=jnp.float32, gemm_transform=None):
    """Chunked conv execution: gather ONE 3*Cin-wide anchored window row per
    kernel x-triple instead of three Cin-wide rows.

    XLA's row gather on TPU is row-LATENCY-bound (~2.5 ns/row regardless of
    width for narrow rows), so cutting rows K*M -> (K/3)*M and tripling
    their width is a ~3x win on the gather that dominates sparse backbones.

    chunk_idx: from ``chunk_anchor_code``.  The realignment (absent leading
    taps -> zeros at the head of the triple) is folded into the gather by
    stacking three pre-shifted variants of the window matrix and encoding
    the shift in the index (anchor + code*N), so the gathered rows are
    already aligned: slot j holds tap dx = j-1, absent taps are zero.
    Bit-equal to ``gather_conv`` on the same rulebook (pinned by tests).
    """
    N, cin = features.shape
    M, G = chunk_idx.shape
    f3 = x_window_matrix(features, keys, xcol, nx)              # (N, 3C)
    zero = jnp.zeros_like(features)
    f3cat = jnp.concatenate([
        f3,
        jnp.concatenate([zero, f3[:, :2 * cin]], axis=-1),      # code 1
        jnp.concatenate([zero, zero, f3[:, :cin]], axis=-1),    # code 2
    ], axis=0)                                                  # (3N, 3C)
    g = jnp.take(f3cat, chunk_idx.reshape(-1), axis=0, mode="fill",
                 fill_value=0).reshape(M, G * 3 * cin)
    return _im2col_gemm(g, weight, features.dtype, out_valid, out_scale,
                        preferred_dtype, gemm_transform)
