"""PointNet++ primitives — pure XLA replacements for the reference's CUDA
extensions ``pointnet2_batch_cuda`` / ``pointnet2_stack_cuda``
(``pcdet/ops/pointnet2/.../src``: ball_query, group_points, FPS sampling,
three_nn interpolation; wrappers ``pointnet2_utils.py``).

All ops are batched, jittable, static-shape: padded points carry a validity
mask; 'first-K-in-radius' semantics match the CUDA ball query (first found
index fills unused slots).  The stack variants (ragged batches) are expressed
over the same dense (B, N, ...) layout with masks — our pipeline pads
everything to capacity anyway, so the stack/batch distinction collapses.
"""

from functools import partial

import jax
import jax.numpy as jnp


def square_distance(src, dst):
    """(B, N, 3), (B, M, 3) -> (B, N, M) squared L2."""
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz, npoint, valid=None):
    """(B, N, 3) -> (B, npoint) indices; iterative FPS (CUDA sampling_gpu
    equivalent).  Invalid points are never selected."""
    B, N, _ = xyz.shape
    if valid is None:
        valid = jnp.ones((B, N), bool)
    INF = jnp.asarray(1e10, jnp.float32)

    def body(i, state):
        dists, farthest, idxs = state
        idxs = idxs.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = ((xyz - centroid) ** 2).sum(-1)
        dists = jnp.minimum(dists, jnp.where(valid, d, -INF))
        farthest = jnp.argmax(dists, axis=1)
        return dists, farthest, idxs

    dists = jnp.where(valid, INF, -INF)
    farthest = jnp.argmax(valid.astype(jnp.int32), axis=1)
    idxs = jnp.zeros((B, npoint), jnp.int32)
    _, _, idxs = jax.lax.fori_loop(
        0, npoint, body, (dists, farthest.astype(jnp.int32), idxs))
    return idxs


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius, nsample, xyz, new_xyz, valid=None):
    """(B, N, 3), (B, M, 3) -> (B, M, nsample) indices of the FIRST nsample
    points within radius (CUDA ball_query semantics: empty slots repeat the
    first hit; centers with no hits return index 0)."""
    B, N, _ = xyz.shape
    d2 = square_distance(new_xyz, xyz)                       # (B, M, N)
    inside = d2 < radius ** 2
    if valid is not None:
        inside = inside & valid[:, None, :]
    order_key = jnp.where(inside, jnp.arange(N)[None, None, :], N)
    sorted_idx = jnp.sort(order_key, axis=-1)[..., :nsample]  # first hits
    first = sorted_idx[..., :1]
    out = jnp.where(sorted_idx >= N, first, sorted_idx)
    return jnp.clip(out, 0, N - 1).astype(jnp.int32), \
        (sorted_idx < N)                                      # valid mask


def index_points(points, idx):
    """(B, N, C), (B, ...) int -> (B, ..., C) batched gather."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def group_points(points, idx):
    """(B, N, C), (B, M, K) -> (B, M, K, C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


@partial(jax.jit, static_argnames=())
def three_nn(unknown, known, known_valid=None):
    """(B, n, 3), (B, m, 3) -> (dist (B, n, 3), idx (B, n, 3)) of 3 nearest
    known points (CUDA three_nn equivalent)."""
    d2 = square_distance(unknown, known)                      # (B, n, m)
    if known_valid is not None:
        d2 = jnp.where(known_valid[:, None, :], d2, 1e10)
    neg_d, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.clip(-neg_d, 0, None)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dist):
    """(B, m, C), (B, n, 3), (B, n, 3) -> (B, n, C) inverse-distance blend."""
    w = 1.0 / jnp.clip(dist, 1e-8, None) ** 2
    w = w / w.sum(-1, keepdims=True)
    gathered = group_points(features, idx)                    # (B, n, 3, C)
    return (gathered * w[..., None]).sum(axis=2)


class QueryAndGroup:
    """Ball query + relative-xyz grouping (pointnet2_utils.QueryAndGroup)."""

    def __init__(self, radius, nsample, use_xyz=True):
        self.radius = radius
        self.nsample = nsample
        self.use_xyz = use_xyz

    def __call__(self, xyz, new_xyz, features=None, valid=None):
        idx, in_mask = ball_query(self.radius, self.nsample, xyz, new_xyz,
                                  valid)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        out = [grouped_xyz]
        if features is not None:
            out.append(group_points(features, idx))
        out = jnp.concatenate(out, axis=-1) if self.use_xyz and features is not None \
            else (out[-1] if features is not None else grouped_xyz)
        return out, idx, in_mask
