"""Cross-cutting helpers: geometry, logging, seeding, meters, voxel hashing.

Capability parity with reference ``pcdet/utils/common_utils.py`` (geometry
helpers ``rotate_points_along_z:35`` / ``limit_period:21``, logger factory
``:103``, seeding ``:120``, voxel-hash ``scatter_point_inds:253``,
``AverageMeter:280``), re-expressed for JAX: the geometry functions are pure,
jittable, and shape-polymorphic over leading batch dims; distributed helpers
live in ``q3d_tpu.parallel`` instead (JAX mesh collectives, not NCCL).
"""

import logging
import random

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# geometry (jnp; numpy twins suffixed _np for the host data pipeline)
# --------------------------------------------------------------------------

def check_numpy_to_jax(x):
    if isinstance(x, np.ndarray):
        return jnp.asarray(x), True
    return x, False


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap ``val`` into [-offset*period, (1-offset)*period)."""
    xp = jnp if isinstance(val, jnp.ndarray) else np
    return val - xp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., ) angles -> (..., 3, 3) rotation matrices about +z (counter-clockwise)."""
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    cosa, sina = xp.cos(angle), xp.sin(angle)
    ones, zeros = xp.ones_like(cosa), xp.zeros_like(cosa)
    rot = xp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1)
    return rot.reshape(*angle.shape, 3, 3)


def rotate_points_along_z(points, angle):
    """Rotate points about the z axis.

    Args:
        points: (B, N, 3 + C) — extra feature columns pass through.
        angle:  (B,) radians, counter-clockwise looking down -z.
    Returns:
        (B, N, 3 + C)
    """
    xp = jnp if isinstance(points, jnp.ndarray) else np
    rot = rotation_matrix_z(xp.asarray(angle, dtype=points.dtype))  # (B,3,3)
    xyz = points[..., 0:3] @ rot
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)


def angle_difference(a, b):
    """Smallest signed difference a-b wrapped into (-pi, pi]."""
    xp = jnp if isinstance(a, jnp.ndarray) else np
    d = a - b
    return d - xp.floor(d / (2 * np.pi) + 0.5) * (2 * np.pi)


def mask_points_by_range(points, limit_range):
    """points: (N, 3+C) numpy; returns bool mask inside the xy(z) range."""
    mask = ((points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
            & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4]))
    return mask


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """voxel_coords: (N, 3) int [z, y, x] -> (N, 3) float centers [x, y, z]."""
    xp = jnp if isinstance(voxel_coords, jnp.ndarray) else np
    coords = voxel_coords[:, ::-1].astype(xp.float32)  # -> [x, y, z]
    vsz = xp.asarray(voxel_size, dtype=xp.float32) * downsample_times
    pc_min = xp.asarray(point_cloud_range[0:3], dtype=xp.float32)
    return (coords + 0.5) * vsz + pc_min


# --------------------------------------------------------------------------
# voxel-coordinate hashing (replaces dense voxel->point-index volumes,
# reference common_utils.py:253-271; here a linearized int32 key usable by
# the sparse-conv rulebook's sorted-key lookup)
# --------------------------------------------------------------------------

def linearize_coords(coords, spatial_shape, valid=None):
    """(N, 4) int [b, z, y, x] -> (N,) int32 unique key; invalid rows -> -1.

    Requires batch * prod(spatial_shape) < 2**31 (holds for every reference
    config: nuScenes 0.075m grid is 41*1440*1440 ≈ 8.5e7 per sample).
    """
    xp = jnp if isinstance(coords, jnp.ndarray) else np
    d, h, w = int(spatial_shape[0]), int(spatial_shape[1]), int(spatial_shape[2])
    key = ((coords[:, 0].astype(xp.int32) * d + coords[:, 1].astype(xp.int32)) * h
           + coords[:, 2].astype(xp.int32)) * w + coords[:, 3].astype(xp.int32)
    if valid is None:
        valid = coords[:, 0] >= 0
    return xp.where(valid, key, -1)


# --------------------------------------------------------------------------
# logging / seeding / meters
# --------------------------------------------------------------------------

def create_logger(log_file=None, rank=0, log_level=logging.INFO, name="q3d_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(str(log_file))
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    """Host-side seeding; JAX randomness is explicit via PRNG keys."""
    random.seed(seed)
    np.random.seed(seed)


def worker_init_fn(worker_id, seed=666):
    if seed is not None:
        set_random_seed(seed + worker_id)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, name in enumerate(gt_names) if name in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    ret_info = {}
    keep = [i for i, x in enumerate(info["name"]) if x != name]
    for key in info.keys():
        if isinstance(info[key], np.ndarray) and info[key].shape[0] == len(info["name"]):
            ret_info[key] = info[key][keep]
        else:
            ret_info[key] = info[key]
    ret_info["name"] = info["name"][keep]
    return ret_info
