"""VectorPool aggregation — structured local-grid pooling (PV-RCNN++).

Replaces the reference CUDA ``vector_pool`` kernels
(``pcdet/ops/pointnet2/pointnet2_stack/src/vector_pool*``, 685 LoC): for
each query point, neighbors within a radius are binned into a fixed local
sub-voxel grid (e.g. 2x2x2 or 3x3x3); per-cell features are averaged and the
cells concatenated in fixed order — preserving local structure that plain
max-pool set abstraction discards.  Static shapes throughout.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .pointnet2_utils import ball_query, group_points


@partial(jax.jit, static_argnames=("radius", "nsample", "grid",
                                   "return_counts"))
def vector_pool(xyz, features, new_xyz, radius, nsample=32, grid=3,
                valid=None, return_counts=False):
    """xyz: (B, N, 3); features: (B, N, C); new_xyz: (B, M, 3)
    -> (B, M, grid^3 * C) structured local features
    (+ (B, M, grid^3) per-cell neighbor counts if ``return_counts``)."""
    idx, in_mask = ball_query(float(radius), int(nsample), xyz, new_xyz,
                              valid)
    rel = group_points(xyz, idx) - new_xyz[:, :, None, :]      # (B,M,S,3)
    g_feats = group_points(features, idx)                      # (B,M,S,C)
    # bin into the local grid
    cell = jnp.clip(((rel / (2 * radius) + 0.5) * grid).astype(jnp.int32),
                    0, grid - 1)
    cell_id = (cell[..., 0] * grid + cell[..., 1]) * grid + cell[..., 2]
    G = grid ** 3
    cell_id = jnp.where(in_mask, cell_id, G)                   # (B,M,S)
    B, M, S, C = g_feats.shape

    def pool_one(cid, gf):
        # cid: (S,), gf: (S, C)
        ssum = jnp.zeros((G + 1, C), gf.dtype).at[cid].add(gf)
        cnt = jnp.zeros(G + 1, gf.dtype).at[cid].add(1.0)
        return ((ssum[:G] / jnp.clip(cnt[:G, None], 1.0, None)).reshape(-1),
                cnt[:G])

    flat, cnt = jax.vmap(jax.vmap(pool_one))(cell_id, g_feats)  # (B,M,G*C)
    if return_counts:
        return flat, cnt
    return flat
