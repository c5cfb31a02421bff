"""ingroup_inds — running index of each element within its group.

Replaces the reference CUDA extension ``ingroup_inds_cuda``
(``pcdet/ops/ingroup_inds/src``; used by DSVT window partitioning via
``model_utils/dsvt_utils.py``).  The CUDA kernel uses atomicAdd per group;
here a stable sort by group id + segment-relative arange gives identical
appearance-order indices with no atomics.
"""

import jax.numpy as jnp


def ingroup_inds(group_ids, valid=None):
    """group_ids: (N,) int; -1 (or valid=False) entries get index -1.

    Returns (N,) int32: 0-based position of each element among earlier
    elements of the same group (appearance order).
    """
    N = group_ids.shape[0]
    if valid is None:
        valid = group_ids >= 0
    ids = jnp.where(valid, group_ids, jnp.iinfo(jnp.int32).max // 2)
    order = jnp.argsort(ids, stable=True)
    ids_s = ids[order]
    new_seg = jnp.concatenate([jnp.ones(1, bool), ids_s[1:] != ids_s[:-1]])
    pos = jnp.arange(N)
    seg_start = jnp.maximum.accumulate(jnp.where(new_seg, pos, 0))
    rank_s = pos - seg_start
    out = jnp.zeros(N, jnp.int32).at[order].set(rank_s.astype(jnp.int32))
    return jnp.where(valid, out, -1)
