"""bev_pool — camera-frustum feature pooling into the BEV grid.

Replaces the reference CUDA extension ``bev_pool_ext``
(``pcdet/ops/bev_pool/src``: QuickCumsum interval reduction used by
``DepthLSSTransform``).  On TPU the interval trick is unnecessary: one
scatter-add over linearized BEV cells performs the same reduction in a
single XLA op, with a custom VJP-free formulation (gather on the backward
comes out of the scatter's autodiff for free).
"""

import jax.numpy as jnp


def bev_pool(feats, coords, batch_size, D, H, W):
    """feats: (N, C); coords: (N, 4) int [x, y, z, b] (reference layout).

    Returns (B, D, H, W, C) with features summed per cell; out-of-range or
    negative coords are dropped.
    """
    x, y, z, b = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    ok = ((x >= 0) & (x < W) & (y >= 0) & (y < H)
          & (z >= 0) & (z < D) & (b >= 0) & (b < batch_size))
    flat = ((b * D + z) * H + y) * W + x
    flat = jnp.where(ok, flat, batch_size * D * H * W)
    out = jnp.zeros((batch_size * D * H * W + 1, feats.shape[1]), feats.dtype)
    out = out.at[flat].add(jnp.where(ok[:, None], feats, 0))
    return out[:-1].reshape(batch_size, D, H, W, feats.shape[1])
