"""Native (C++) runtime vs numpy reference implementations."""

import numpy as np
import pytest

from q3d_tpu.runtime import native
from q3d_tpu.ops.voxelizer import voxelize_np


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_voxelizer_matches_numpy():
    rng = np.random.RandomState(0)
    points = rng.uniform(-2, 42, (20000, 4)).astype(np.float32)
    vs = [0.16, 0.16, 4.0]
    pr = [0.0, -20.0, -3.0, 40.0, 20.0, 1.0]
    grid = np.round((np.array(pr[3:]) - np.array(pr[:3])) / np.array(vs)).astype(np.int64)
    v_np, c_np, n_np, k_np = voxelize_np(points, vs, pr, 8, 4000)
    v_c, c_c, n_c, k_c = native.voxelize(points, vs, pr, grid, 8, 4000)
    assert k_np == k_c
    np.testing.assert_array_equal(c_np, c_c)
    np.testing.assert_array_equal(n_np, n_c)
    np.testing.assert_allclose(v_np, v_c)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_voxelizer_speed():
    import time
    rng = np.random.RandomState(1)
    points = rng.uniform(-50, 50, (300000, 5)).astype(np.float32)
    vs = [0.1, 0.1, 0.2]
    pr = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    grid = np.round((np.array(pr[3:]) - np.array(pr[:3])) / np.array(vs)).astype(np.int64)
    t0 = time.perf_counter()
    native.voxelize(points, vs, pr, grid, 10, 60000)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native voxelizer too slow: {dt:.3f}s"
