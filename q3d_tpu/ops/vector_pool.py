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
                                   "return_counts", "mode"))
def vector_pool(xyz, features, new_xyz, radius, nsample=32, grid=3,
                valid=None, return_counts=False, mode="avg"):
    """xyz: (B, N, 3); features: (B, N, C); new_xyz: (B, M, 3)
    -> (B, M, grid^3 * C) structured local features
    (+ (B, M, grid^3) per-cell neighbor counts if ``return_counts``).

    mode='avg': per-cell mean (reference pooling_type 0, voxel_avg_pool).
    mode='first': per-cell FIRST point in support scan order — the faithful
    ``voxel_random_choice`` (reference pooling_type 1): the CUDA kernel's
    "random choose one within sub-voxel" (vector_pool_gpu.cu:344-365) keeps
    the first point whose cell count is 0, scanning neighbors in point-index
    order; ``ball_query`` here returns candidates in the same ascending
    point order, so the selected point matches.  Deterministic in both
    frameworks for a fixed point order."""
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

    if mode == "first":
        def pool_one(cid, gf):
            # winner = min scan position per cell (scatter-min)
            first = jnp.full(G + 1, S, jnp.int32).at[cid].min(
                jnp.arange(S, dtype=jnp.int32))
            hit = first[:G] < S                                # (G,)
            feat = gf[jnp.clip(first[:G], 0, S - 1)]           # (G, C)
            feat = jnp.where(hit[:, None], feat, 0)
            return feat.reshape(-1), hit.astype(gf.dtype)

        flat, cnt = jax.vmap(jax.vmap(pool_one))(cell_id, g_feats)
        if return_counts:
            return flat, cnt
        return flat

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


@partial(jax.jit, static_argnames=("radius", "nsample", "grid", "dist_mult"))
def vector_pool_interpolate(xyz, features, new_xyz, radius, nsample=32,
                            grid=3, valid=None, dist_mult=2.0):
    """Local-interpolation vector pool (the reference's default
    ``LOCAL_AGGREGATION_TYPE: local_interpolation`` —
    ``pointnet2_modules.VectorPoolLocalInterpolateModule:160-246`` +
    ``get_dense_voxels_by_center:337-359``): for each query, a grid^3 cube
    of cell CENTERS spans [-R, R]^3; each center takes the
    inverse-distance-weighted 3-NN interpolation of the support features,
    concatenated with the 9 offsets to those 3 neighbors (use_xyz concat),
    empty centers (no support within ``dist_mult * R``) = 0.

    Candidate sets come from one ``ball_query(R * (1 + dist_mult))`` around
    the query (the CUDA two-step search is unbounded per cell center; a
    cell center sits within R*sqrt(3) of its query, so this covers every
    neighbor within dist_mult*R of any cell center up to the static
    ``nsample`` cap — the documented static-shape deviation).

    xyz: (B, N, 3); features: (B, N, C); new_xyz: (B, M, 3)
    -> (B, M, grid^3 * (C + 9))."""
    cand_r = float(radius) * (1.0 + float(dist_mult))
    idx, in_mask = ball_query(cand_r, int(nsample), xyz, new_xyz, valid)
    sup = group_points(xyz, idx)                               # (B,M,S,3)
    g_feats = group_points(features, idx)                      # (B,M,S,C)
    rel = sup - new_xyz[:, :, None, :]                         # (B,M,S,3)

    R = float(radius)
    step = 2.0 * R / grid
    g1 = jnp.arange(grid, dtype=jnp.float32) * step - R + step / 2.0
    gx, gy, gz = jnp.meshgrid(g1, g1, g1, indexing="ij")
    centers = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)       # (G, 3)
    G = centers.shape[0]

    d = jnp.linalg.norm(rel[:, :, None, :, :] - centers[None, None, :, None, :],
                        axis=-1)                               # (B,M,G,S)
    ok = in_mask[:, :, None, :] & (d <= float(dist_mult) * R)
    d = jnp.where(ok, d, jnp.inf)
    # 3 nearest support points per cell center; weights only over the
    # actually-found neighbors (cells with 1-2 neighbors renormalize over
    # those instead of the reference CUDA op's fixed-3 assumption)
    nd, ni = jax.lax.top_k(-d, 3)                              # (B,M,G,3)
    nd = -nd
    vmask = jnp.isfinite(nd)
    has = vmask[..., 0]                                        # any neighbor
    w = jnp.where(vmask, 1.0 / (jnp.where(vmask, nd, 0.0) + 1e-8), 0.0)
    w = w / jnp.clip(w.sum(-1, keepdims=True), 1e-8, None)     # (B,M,G,3)

    def gsel(a, i):
        # a: (B,M,S,C); i: (B,M,G,3) -> (B,M,G,3,C)
        return jax.vmap(jax.vmap(lambda s, ii: s[ii]))(a, i)

    nf = gsel(g_feats, ni)                                     # (B,M,G,3,C)
    interp = (nf * w[..., None]).sum(-2)                       # (B,M,G,C)
    nrel = gsel(rel, ni)                                       # (B,M,G,3,3)
    off = centers[None, None, :, None, :] - nrel               # (B,M,G,3,3)
    off = off.reshape(off.shape[:3] + (9,))
    out = jnp.concatenate([interp, off], -1)
    out = jnp.where(has[..., None], out, 0.0)
    B, M = new_xyz.shape[:2]
    return out.reshape(B, M, G * out.shape[-1])
