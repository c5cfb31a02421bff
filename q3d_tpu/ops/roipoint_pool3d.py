"""roipoint_pool3d — gather raw points inside each ROI box.

Replaces the reference CUDA extension ``roipoint_pool3d_cuda``
(``pcdet/ops/roipoint_pool3d/src``, wrapper ``roipoint_pool3d_utils.py``):
for each ROI, the first ``num_sampled_points`` contained points (features
appended), plus an empty flag.  Static shapes: output
(B, R, num_sampled_points, 3+C); slots beyond the contained count repeat the
first contained point like the CUDA kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_sampled_points",))
def roipoint_pool3d(points, point_features, boxes3d, num_sampled_points=512,
                    points_valid=None):
    """points: (B, N, 3); point_features: (B, N, C); boxes3d: (B, R, 7).

    Returns (pooled (B, R, S, 3+C), empty_flag (B, R) int32).
    """
    def pool_one(pts, feats, boxes, valid):
        def per_box(box):
            shift = pts - box[0:3]
            cosa, sina = jnp.cos(-box[6]), jnp.sin(-box[6])
            lx = shift[:, 0] * cosa - shift[:, 1] * sina
            ly = shift[:, 0] * sina + shift[:, 1] * cosa
            lz = shift[:, 2]
            inside = ((jnp.abs(lx) <= box[3] / 2) & (jnp.abs(ly) <= box[4] / 2)
                      & (jnp.abs(lz) <= box[5] / 2 + 1e-6)) & valid
            N = pts.shape[0]
            order = jnp.where(inside, jnp.arange(N), N)
            first_k = jnp.sort(order)[:num_sampled_points]
            fill = first_k[0]
            idx = jnp.where(first_k >= N, fill, first_k)
            idx = jnp.clip(idx, 0, N - 1)
            data = jnp.concatenate([pts, feats], axis=1)[idx]
            empty = jnp.logical_not(inside.any()).astype(jnp.int32)
            data = data * (1 - empty)
            return data, empty
        return jax.vmap(per_box)(boxes)

    if points_valid is None:
        points_valid = jnp.ones(points.shape[:2], bool)
    return jax.vmap(pool_one)(points, point_features, boxes3d, points_valid)
