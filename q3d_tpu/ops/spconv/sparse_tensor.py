"""SparseConvTensor — fixed-capacity sparse voxel tensor for XLA.

TPU-native replacement for the external ``spconv.SparseConvTensor``
(reference usage: ``pcdet/models/backbones_3d/spconv_backbone.py:258-263``,
``pcdet/utils/spconv_utils.py``).  Instead of spconv's dynamic voxel counts
and CUDA hash tables, a tensor is a STATIC-capacity (N, C) feature matrix +
(N, 1+ndim) integer coordinates with -1-padded free slots, plus a cached
sorted-key table that plays the role of spconv's GPU hash map: coordinate
lookup = binary search (``jnp.searchsorted``) in the sorted linearized keys.
Everything jits; the compiled program is shape-identical across frames.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

# sentinel for padding keys; real keys are < batch * prod(spatial) < 2^30.
# Plain python int ON PURPOSE: a module-level jnp array would be created at
# first import, which can happen INSIDE a jit trace (flax setup() imports
# lazily) — the "constant" would then be a leaked tracer captured as a
# jaxpr const, breaking the C++ jit dispatch fast path on the second call.
BIG_KEY = 2 ** 30

# grids with at most this many cells use the O(1) dense lookup table
# (int32 -> up to 768 MB transient HBM); larger grids fall back to binary
# search.  nuScenes full-res = B x 41 x 1440 x 1440 = 85M cells per sample.
_DENSE_TABLE_MAX = 192 * 1024 * 1024


def linearize(indices, spatial_shape, batch_size):
    """(N, 1+nd) int [b, z, y, x] -> (N,) int32 key; padding rows -> BIG_KEY."""
    nd = len(spatial_shape)
    key = indices[:, 0].astype(jnp.int32)
    for d in range(nd):
        key = key * int(spatial_shape[d]) + indices[:, 1 + d].astype(jnp.int32)
    return jnp.where(indices[:, 0] >= 0, key, BIG_KEY)


class SparseConvTensor(struct.PyTreeNode):
    features: jnp.ndarray                 # (N, C)
    indices: jnp.ndarray                  # (N, 1+nd) int32 [b, z, y, x]; -1 pad
    spatial_shape: Tuple[int, ...] = struct.field(pytree_node=False)
    batch_size: int = struct.field(pytree_node=False)
    # sorted-key lookup table (built lazily by with_hash())
    sort_keys: Optional[jnp.ndarray] = None   # (N,) int32 ascending, pads last
    sort_perm: Optional[jnp.ndarray] = None   # (N,) int32 original row ids
    # static invariant: rows are stored in ascending linearized-key order
    # (pads last).  Unlocks the chunked gather path in the conv engine, where
    # the three consecutive-x taps of each kernel (.., ky) group are read as
    # ONE wide row of a rolled x-window matrix (engine.gather_conv_chunked).
    sorted_rows: bool = struct.field(pytree_node=False, default=False)
    # int8-residency deploy mode: when features are int8, this is their
    # per-tensor dequantization scale (real value = features * feat_scale).
    # None = features are real-valued (fp32/bf16).
    feat_scale: Optional[jnp.ndarray] = None

    @property
    def capacity(self):
        return self.features.shape[0]

    @property
    def num_channels(self):
        return self.features.shape[1]

    @property
    def valid(self):
        return self.indices[:, 0] >= 0

    def keys(self):
        return linearize(self.indices, self.spatial_shape, self.batch_size)

    def sort_rows(self):
        """Permute rows into ascending linearized-key order (pads last).

        Real keys are unique, so the permutation is deterministic; pad rows
        (all BIG_KEY, identical zero content) keep relative order under the
        stable XLA sort.  The host rulebook planner applies the numpy twin of
        this sort so host-built gather tables reference the same row ids.
        """
        if self.sorted_rows:
            return self
        perm = jnp.argsort(self.keys(), stable=True).astype(jnp.int32)
        return SparseConvTensor(
            features=jnp.take(self.features, perm, axis=0),
            indices=jnp.take(self.indices, perm, axis=0),
            spatial_shape=self.spatial_shape, batch_size=self.batch_size,
            sorted_rows=True)

    def with_hash(self):
        """Attach the sorted-key table (idempotent)."""
        if self.sort_keys is not None:
            return self
        keys = self.keys()
        perm = jnp.argsort(keys)
        return self.replace(sort_keys=keys[perm], sort_perm=perm.astype(jnp.int32))

    def lookup(self, query_keys):
        """query_keys: (...,) int32 -> row index in [0, N] (N = miss/pad).

        Two strategies:
          * dense-grid table (default): scatter row ids into a
            (B * prod(spatial) + 1) int32 table, then one gather — the
            TPU-native analogue of spconv's GPU hash map.  O(1) per query;
            ~50x faster than binary search on v5e (XLA lowers
            ``searchsorted`` to ~log2(N) sequential gather rounds: measured
            172 ms for 1.6M queries vs ~3 ms for one gather).
          * binary search in the sorted keys, for grids too large to
            materialize the table (> _DENSE_TABLE_MAX entries).
        """
        size = self.batch_size
        for s in self.spatial_shape:
            size *= int(s)
        if size <= _DENSE_TABLE_MAX:
            N = self.capacity
            keys = self.keys()
            safe = jnp.where(keys == BIG_KEY, size, keys)
            table = jnp.full(size + 1, N, jnp.int32).at[safe].set(
                jnp.arange(N, dtype=jnp.int32))
            table = table.at[size].set(N)      # sentinel slot = miss
            q = jnp.where(query_keys == BIG_KEY, size, query_keys)
            return table[q]
        assert self.sort_keys is not None, "call with_hash() first"
        pos = jnp.searchsorted(self.sort_keys, query_keys)
        pos = jnp.clip(pos, 0, self.capacity - 1)
        hit = (self.sort_keys[pos] == query_keys) & (query_keys != BIG_KEY)
        return jnp.where(hit, self.sort_perm[pos], self.capacity)

    def dense(self):
        """-> (B, *spatial, C) dense tensor (spconv .dense() equivalent,
        channels-last)."""
        nd = len(self.spatial_shape)
        flat_spatial = 1
        for s in self.spatial_shape:
            flat_spatial *= int(s)
        key = self.keys()
        key = jnp.where(key == BIG_KEY, self.batch_size * flat_spatial, key)
        out = jnp.zeros((self.batch_size * flat_spatial + 1, self.num_channels),
                        self.features.dtype)
        out = out.at[key].set(self.features)
        out = out[:-1].reshape(self.batch_size, *[int(s) for s in self.spatial_shape],
                               self.num_channels)
        return out

    def replace_feature(self, new_features):
        """spconv_utils.replace_feature equivalent (keeps coords + hash)."""
        return self.replace(features=new_features)
