"""ctypes bindings + lazy build of the native host runtime (C++).

The reference's host-side native code lives in pip-installed spconv; ours is
vendored in ``q3d_tpu/runtime/src`` and compiled on first use with g++
(no pybind11 — plain C ABI via ctypes).  Falls back silently to the numpy
implementations when no compiler is available.
"""

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "src"
_LIB_PATH = Path(__file__).resolve().parent / "_native.so"

lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC / "voxelizer.cpp"), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / failure -> numpy fallback
        print(f"[q3d_tpu.runtime] native build failed ({e}); using numpy "
              f"fallback", file=sys.stderr)
        return False


def _load():
    global lib
    if lib is not None:
        return lib
    if not _LIB_PATH.exists():
        if not _build():
            lib = None
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        lib = None
        return None
    lib.voxelize.restype = ctypes.c_int
    lib.voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    return lib


def available():
    return _load() is not None


def voxelize(points, voxel_size, pc_range, grid_size, max_points, max_voxels):
    """Same contract as ops.voxelizer.voxelize_np."""
    l = _load()
    assert l is not None
    points = np.ascontiguousarray(points, np.float32)
    n, n_feat = points.shape
    voxels = np.zeros((max_voxels, max_points, n_feat), np.float32)
    coords = np.full((max_voxels, 3), -1, np.int32)
    num_points = np.zeros(max_voxels, np.int32)
    vs = np.ascontiguousarray(voxel_size, np.float32)
    pr = np.ascontiguousarray(pc_range, np.float32)
    gs = np.ascontiguousarray(grid_size, np.int64)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ip32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    count = l.voxelize(fp(points), n, n_feat, fp(vs), fp(pr),
                       gs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                       int(max_points), int(max_voxels),
                       fp(voxels), ip32(coords), ip32(num_points))
    return voxels, coords, num_points, int(count)
