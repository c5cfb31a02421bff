"""Point-cloud voxelization with fixed-capacity (static-shape) outputs.

Replaces the reference's external CPU voxelizer (spconv ``Point2VoxelCPU3d``
wrapped at ``pcdet/datasets/processor/data_processor.py:16-61``).  Two
implementations with identical semantics:

  * ``voxelize_np``   — host numpy (data-pipeline default; a C++ twin lives in
                        ``q3d_tpu/runtime`` and is used when built);
  * ``voxelize_jax``  — on-device jnp (sort+segment) for fused-input pipelines.

Semantics matched to spconv: grid index = floor((p - range_min)/voxel_size),
points outside the grid dropped, voxels kept in FIRST-SEEN point order, at
most ``max_points`` first-seen points per voxel, at most ``max_voxels``
voxels.  Output coords are [z, y, x] like the reference.  Outputs are padded
to (max_voxels, max_points, C) so downstream XLA programs see static shapes.
"""

import numpy as np

_NATIVE = None


def _native():
    """ctypes handle to the C++ voxelizer (q3d_tpu/runtime), if built."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from ..runtime import native
            _NATIVE = native.lib if native.lib is not None else False
        except Exception:
            _NATIVE = False
    return _NATIVE


def voxelize_np(points, voxel_size, point_cloud_range, max_points, max_voxels):
    """points: (N, 3+C) float32 -> (voxels, coords_zyx, num_points, num_voxels).

    voxels: (max_voxels, max_points, 3+C) float32, zero-padded
    coords: (max_voxels, 3) int32 [z, y, x], padding rows = -1
    num_points: (max_voxels,) int32
    """
    points = np.ascontiguousarray(points, dtype=np.float32)
    voxel_size = np.asarray(voxel_size, np.float32)
    pc_range = np.asarray(point_cloud_range, np.float32)
    grid_size = np.round((pc_range[3:6] - pc_range[0:3]) / voxel_size).astype(np.int64)

    lib = _native()
    if lib:
        from ..runtime import native
        return native.voxelize(points, voxel_size, pc_range, grid_size,
                               int(max_points), int(max_voxels))

    coords_f = (points[:, 0:3] - pc_range[0:3]) / voxel_size
    coords = np.floor(coords_f).astype(np.int64)  # [x, y, z] order here
    in_grid = ((coords >= 0) & (coords < grid_size)).all(axis=1)
    points = points[in_grid]
    coords = coords[in_grid]
    n = points.shape[0]

    n_feat = points.shape[1]
    voxels = np.zeros((max_voxels, max_points, n_feat), np.float32)
    out_coords = np.full((max_voxels, 3), -1, np.int32)
    num_points = np.zeros(max_voxels, np.int32)
    if n == 0:
        return voxels, out_coords, num_points, 0

    key = (coords[:, 2] * grid_size[1] + coords[:, 1]) * grid_size[0] + coords[:, 0]
    # first-seen voxel order + first-seen point order within each voxel
    first_idx = {}
    voxel_of_point = np.empty(n, np.int64)
    num_voxels = 0
    for i in range(n):
        k = key[i]
        v = first_idx.get(k, -1)
        if v < 0:
            if num_voxels >= max_voxels:
                voxel_of_point[i] = -1
                continue
            v = num_voxels
            first_idx[k] = v
            out_coords[v] = coords[i, ::-1]  # -> [z, y, x]
            num_voxels += 1
        voxel_of_point[i] = v
        c = num_points[v]
        if c < max_points:
            voxels[v, c] = points[i]
            num_points[v] = c + 1
    return voxels, out_coords, num_points, num_voxels


def voxelize_jax(points, valid, voxel_size, point_cloud_range, grid_size,
                 max_points, max_voxels):
    """On-device voxelization via sort + segment boundaries (jit-friendly).

    Note: voxel order is KEY-sorted (not first-seen) and the per-voxel point
    subset is the first ``max_points`` in sorted order — permutation-level
    differences from ``voxelize_np`` that mean-style VFEs are invariant to.

    points: (N, 3+C); valid: (N,) bool.
    Returns (voxels (V,P,C), coords_zyx (V,3) int32 [-1 pad], num_points (V,)).
    """
    import jax.numpy as jnp

    pc_min = jnp.asarray(point_cloud_range[0:3], jnp.float32)
    vsz = jnp.asarray(voxel_size, jnp.float32)
    gsz = jnp.asarray(grid_size, jnp.int32)                 # [nx, ny, nz]
    coords = jnp.floor((points[:, 0:3] - pc_min) / vsz).astype(jnp.int32)
    in_grid = ((coords >= 0) & (coords < gsz)).all(axis=1) & valid
    key = ((coords[:, 2] * gsz[1] + coords[:, 1]) * gsz[0] + coords[:, 0])
    BIG = jnp.int32(2 ** 30)
    key = jnp.where(in_grid, key, BIG)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = points[order]
    coords_s = coords[order]

    new_voxel = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
    new_voxel = new_voxel & (key_s != BIG)
    voxel_id = jnp.cumsum(new_voxel) - 1                     # per point
    voxel_id = jnp.where(key_s == BIG, max_voxels, jnp.minimum(voxel_id, max_voxels))
    # rank of the point within its voxel
    pt_rank = jnp.arange(key_s.shape[0]) - jnp.maximum(
        jnp.cumsum(jnp.where(new_voxel, jnp.arange(key_s.shape[0]) + 1, 0)) - 1, 0)
    # recompute rank robustly: index of segment start
    seg_start = jnp.maximum.accumulate(
        jnp.where(new_voxel, jnp.arange(key_s.shape[0]), 0))
    pt_rank = jnp.arange(key_s.shape[0]) - seg_start
    slot_ok = (pt_rank < max_points) & (voxel_id < max_voxels)
    flat = jnp.where(slot_ok, voxel_id * max_points + pt_rank,
                     max_voxels * max_points)

    n_feat = points.shape[1]
    voxels = jnp.zeros((max_voxels * max_points + 1, n_feat), jnp.float32)
    voxels = voxels.at[flat].set(pts_s)[:-1].reshape(max_voxels, max_points, n_feat)
    num_points = jnp.zeros(max_voxels + 1, jnp.int32).at[
        jnp.where(slot_ok, voxel_id, max_voxels)].add(1)[:-1]
    czyx = coords_s[:, ::-1]
    out_coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    out_coords = out_coords.at[jnp.where(new_voxel & (voxel_id < max_voxels),
                                         voxel_id, max_voxels)].set(czyx)[:-1]
    return voxels, out_coords, num_points
