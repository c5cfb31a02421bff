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


# ---------------------------------------------------------------------------
# steady-state output arena (opt-in)
# ---------------------------------------------------------------------------

class _BumpArena:
    """Bump allocator over persistent chunks: repeated rulebook builds write
    into warm, already-faulted pages instead of paying ~1-2 us/page of soft
    faults on every fresh np.empty (measured ~3-5 ms/frame at the CenterPoint
    bench envelope).  reset() recycles ALL previously handed-out arrays."""

    def __init__(self):
        self.chunks = []
        self.idx = 0
        self.off = 0

    def reset(self):
        self.idx = 0
        self.off = 0

    def alloc(self, shape, dtype=np.int32):
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        n_al = -(-max(n, 1) // 64) * 64
        while True:
            if self.idx < len(self.chunks):
                c = self.chunks[self.idx]
                if self.off + n_al <= c.nbytes:
                    a = c[self.off:self.off + n].view(dtype).reshape(shape)
                    self.off += n_al
                    return a
                self.idx += 1
                self.off = 0
            else:
                self.chunks.append(np.empty(max(32 << 20, n_al), np.uint8))
                self.off = 0


_ARENA = _BumpArena()
_REUSE = False


def enable_buffer_reuse(flag=True):
    """Steady-state serving mode: builder outputs come from a persistent
    arena recycled by ``arena_reset()`` (one call per frame/build).  Arrays
    returned under reuse are INVALIDATED by the next post-reset build —
    copy them (e.g. jax.device_put) before rebuilding.  Default off."""
    global _REUSE
    _REUSE = flag


def arena_reset():
    if _REUSE:
        _ARENA.reset()


def _empty(shape, dtype=np.int32):
    return _ARENA.alloc(shape, dtype) if _REUSE else np.empty(shape, dtype)



def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC / "voxelizer.cpp"), str(_SRC / "rulebook.cpp"),
           "-o", str(_LIB_PATH)]
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
    stale = _LIB_PATH.exists() and any(
        s.stat().st_mtime > _LIB_PATH.stat().st_mtime
        for s in _SRC.glob("*.cpp"))
    if not _LIB_PATH.exists() or stale:
        if not _build() and not _LIB_PATH.exists():
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
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.subm_rulebook.restype = ctypes.c_int
    lib.subm_rulebook.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                  i32p, i32p, i32p, i32p]
    lib.downsample_rulebook.restype = ctypes.c_int
    lib.downsample_rulebook.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                        i32p, i32p, i32p, i32p, i32p,
                                        ctypes.c_int64, i32p, i32p]
    lib.subm_chunk_rulebook.restype = ctypes.c_int
    lib.subm_chunk_rulebook.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                        i32p, i32p, i32p, i32p]
    lib.downsample_chunk_rulebook.restype = ctypes.c_int
    lib.downsample_chunk_rulebook.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int, i32p, i32p, i32p, i32p, i32p,
        ctypes.c_int64, i32p, i32p]
    lib.downsample_chunk_rulebook2.restype = ctypes.c_int
    lib.downsample_chunk_rulebook2.argtypes = \
        lib.downsample_chunk_rulebook.argtypes
    lib.flatten_sort_coords.restype = ctypes.c_int
    lib.flatten_sort_coords.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, i32p, i32p]
    lib.build_voxel_backbone_books.restype = ctypes.c_int
    lib.build_voxel_backbone_books.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i32p, i32p] + [i32p] * 11
    lib.chunk_prep.restype = ctypes.c_int
    lib.chunk_prep.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int64] + [i32p] * 7
    lib.chunk_prep2.restype = ctypes.c_int
    lib.chunk_prep2.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int64] + [i32p] * 5
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


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def subm_rulebook(coords, spatial, kernel_size, dilation=1):
    """coords: (N, 1+nd) int32 [b, ...] with -1 pads -> (N, K) gather
    indices into the N+1-row padded features (miss = N).  Same contract as
    ops.spconv.engine.subm_gather_indices."""
    l = _load()
    assert l is not None
    coords = np.ascontiguousarray(coords, np.int32)
    n, w = coords.shape
    nd = w - 1
    k = np.ascontiguousarray(
        kernel_size if hasattr(kernel_size, "__len__")
        else [kernel_size] * nd, np.int32)
    dil = np.ascontiguousarray(
        dilation if hasattr(dilation, "__len__") else [dilation] * nd,
        np.int32)
    sp = np.ascontiguousarray(spatial, np.int32)
    K = int(np.prod(k))
    gather = _empty((n, K), np.int32)
    l.subm_rulebook(_i32(coords), n, nd, _i32(sp), _i32(k), _i32(dil),
                    _i32(gather))
    return gather


def downsample_rulebook(coords, spatial, kernel_size, stride, padding,
                        out_capacity):
    """Same contract as ops.spconv.engine.sparse_conv_downsample:
    -> (out_coords (M, 1+nd), gather (M, K), out_spatial tuple)."""
    l = _load()
    assert l is not None
    coords = np.ascontiguousarray(coords, np.int32)
    n, w = coords.shape
    nd = w - 1

    def vec(v):
        return np.ascontiguousarray(
            v if hasattr(v, "__len__") else [v] * nd, np.int32)

    k, s, p = vec(kernel_size), vec(stride), vec(padding)
    sp = np.ascontiguousarray(spatial, np.int32)
    out_sp = np.ascontiguousarray(
        [(int(sp[d]) + 2 * int(p[d]) - int(k[d])) // int(s[d]) + 1
         for d in range(nd)], np.int32)
    K = int(np.prod(k))
    M = int(out_capacity)
    out_coords = _empty((M, 1 + nd), np.int32)
    gather = _empty((M, K), np.int32)
    l.downsample_rulebook(_i32(coords), n, nd, _i32(sp), _i32(out_sp),
                          _i32(k), _i32(s), _i32(p), M, _i32(out_coords),
                          _i32(gather))
    return out_coords, gather, tuple(int(v) for v in out_sp)


def subm_chunk_rulebook(coords, spatial, kernel_size, dilation=1):
    """Chunked submanifold rulebook: (N, K/3) combined anchor+code table
    (engine.chunk_anchor_code format; requires x-kernel 3, x-dilation 1)."""
    l = _load()
    assert l is not None
    coords = np.ascontiguousarray(coords, np.int32)
    n, w = coords.shape
    nd = w - 1
    k = np.ascontiguousarray(
        kernel_size if hasattr(kernel_size, "__len__")
        else [kernel_size] * nd, np.int32)
    dil = np.ascontiguousarray(
        dilation if hasattr(dilation, "__len__") else [dilation] * nd,
        np.int32)
    assert int(k[-1]) == 3 and int(dil[-1]) == 1
    sp = np.ascontiguousarray(spatial, np.int32)
    G = int(np.prod(k[:-1]))
    gather = _empty((n, G), np.int32)
    l.subm_chunk_rulebook(_i32(coords), n, nd, _i32(sp), _i32(k), _i32(dil),
                          _i32(gather))
    return gather


def downsample_chunk_rulebook(coords, spatial, kernel_size, stride, padding,
                              out_capacity):
    """Chunked strided-downsample rulebook:
    -> (out_coords (M, 1+nd), chunk (M, K/3), out_spatial)."""
    l = _load()
    assert l is not None
    coords = np.ascontiguousarray(coords, np.int32)
    n, w = coords.shape
    nd = w - 1

    def vec(v):
        return np.ascontiguousarray(
            v if hasattr(v, "__len__") else [v] * nd, np.int32)

    k, s, p = vec(kernel_size), vec(stride), vec(padding)
    assert int(k[-1]) == 3
    sp = np.ascontiguousarray(spatial, np.int32)
    out_sp = np.ascontiguousarray(
        [(int(sp[d]) + 2 * int(p[d]) - int(k[d])) // int(s[d]) + 1
         for d in range(nd)], np.int32)
    G = int(np.prod(k[:-1]))
    M = int(out_capacity)
    out_coords = _empty((M, 1 + nd), np.int32)
    chunk = _empty((M, G), np.int32)
    out_cells = int(np.prod(out_sp.astype(np.int64)))
    fn = l.downsample_chunk_rulebook2 if out_cells <= (1 << 27) \
        else l.downsample_chunk_rulebook
    fn(_i32(coords), n, nd, _i32(sp), _i32(out_sp),
       _i32(k), _i32(s), _i32(p), M, _i32(out_coords), _i32(chunk))
    return out_coords, chunk, tuple(int(v) for v in out_sp)


def flatten_sort_coords(voxel_coords, spatial):
    """(B, V, nd) [z,y,x] int32 with -1 pads -> (B*V, 1+nd) key-sorted
    [b,z,y,x] (native twin of host_planner._flatten_coords)."""
    l = _load()
    assert l is not None
    vox = np.ascontiguousarray(voxel_coords, np.int32)
    B, V, nd = vox.shape
    sp = np.ascontiguousarray(spatial, np.int32)
    out = _empty((B * V, 1 + nd), np.int32)
    l.flatten_sort_coords(_i32(vox), B, V, nd, _i32(sp), _i32(out))
    return out


# sticky per-stage overflow-cap memo: (m, g, bm, s, capacity) -> ladder
# cap (capacity distinguishes a subm table, capacity == m, from a
# downsample table of the same row count whose anchors index the previous
# stage — their overflow profiles differ by 20x).  Grows
# only (a transient spike permanently widens the rung; shapes must stay
# stable across streamed frames or every window recompiles).  Seeded lazily
# from the first frame's TRUE count (the C++ prep counts it in-pass).
# Bounded (ADVICE r4): a caller feeding non-static row counts would other-
# wise grow it without limit — evict oldest-inserted beyond the bound (the
# padded bench/eval configs use a handful of stable keys, far below it).
_CAP_MEMO = {}
_CAP_MEMO_MAX = 512


def _resolve_cap(m, g, bm, s, capacity, q=32):
    from ..ops.spconv import policy
    return _CAP_MEMO.get((m, g, bm, s, q, capacity), policy.CAP_GRANULE)


def _update_cap(m, g, bm, s, capacity, count, cap, q=32):
    """Post-call memo update; returns the retry cap when the list burst.

    The memo grows ONLY on a burst (count > cap): frames that fit keep the
    current rung, so steady-state streaming sees one stable shape per stage
    instead of drifting caps that would recompile every window."""
    from ..ops.spconv import policy
    key = (m, g, bm, s, q, capacity)
    if key not in _CAP_MEMO and len(_CAP_MEMO) >= _CAP_MEMO_MAX:
        _CAP_MEMO.pop(next(iter(_CAP_MEMO)))     # FIFO eviction (dicts
        # preserve insertion order); stable configs re-seed in one pass
    if count <= cap:
        _CAP_MEMO.setdefault(key, cap)
        return None
    want = max(policy.overflow_cap(m, measured=count), cap)
    _CAP_MEMO[key] = max(_CAP_MEMO.get(key, 0), want)
    return _CAP_MEMO[key] if _CAP_MEMO[key] > cap else None


def chunk_prep(chunk, capacity, bm=128, s=256, q=32, cap=None):
    """One-hot-kernel prep for a chunked rulebook — host twin of
    ``pallas_conv.prepare_chunk`` (same tuple layout, pinned equal by
    tests/test_native_runtime.py): -> (anchor (Mpad, G), code (Mpad, G),
    span_q (3, NB, G), (midx, ga, gcode, gslot, ok), ok).

    cap=None: sized from the MEASURED overflow count via the sticky ladder
    memo (policy.overflow_cap) — first call per stage may run the C++ prep
    twice (count discovery, then the right-sized list); steady state is one
    pass with a tight cap (ADVICE r3: oversized caps cost real MXU time in
    apply_overflow)."""
    l = _load()
    assert l is not None
    chunk = np.ascontiguousarray(chunk, np.int32)
    m, g = chunk.shape
    auto = cap is None
    if auto:
        cap = _resolve_cap(m, g, bm, s, int(capacity), q)
    mpad = ((m + bm - 1) // bm) * bm
    nb = mpad // bm
    anchor = _empty((mpad, g), np.int32)
    code = _empty((mpad, g), np.int32)

    def run(cap):
        span_q = _empty((3, nb, g), np.int32)
        midx = _empty(cap, np.int32)
        ga = _empty(cap, np.int32)
        gcode = _empty(cap, np.int32)
        gslot = _empty(cap, np.int32)
        count = l.chunk_prep(_i32(chunk), m, g, int(capacity), bm, s, q, cap,
                             _i32(anchor), _i32(code), _i32(span_q),
                             _i32(midx), _i32(ga), _i32(gcode), _i32(gslot))
        return span_q, (midx, ga, gcode, gslot), count

    span_q, ovf, count = run(cap)
    if auto:
        retry = _update_cap(m, g, bm, s, int(capacity), count, cap, q)
        if retry is not None:
            cap = retry
            span_q, ovf, count = run(cap)
    okb = np.bool_(count <= cap)
    return anchor, code, span_q, (*ovf, okb), okb


def chunk_prep_spans(chunk, capacity, bm=128, s=256, q=32, cap=None):
    """Reduced one-hot-kernel prep: span starts + overflow COO only (the
    device derives anchor/code from the chunk table itself, see
    ``pallas_conv.complete_prep``).  Returns (span_q (3, NB, G) int32,
    (midx, ga, gcode, gslot, ok)) — bit-equal to the matching slices of
    ``chunk_prep``/``pallas_conv.prepare_chunk``.  cap=None auto-sizes
    from the measured overflow count (see ``chunk_prep``)."""
    l = _load()
    assert l is not None
    chunk = np.ascontiguousarray(chunk, np.int32)
    m, g = chunk.shape
    auto = cap is None
    if auto:
        cap = _resolve_cap(m, g, bm, s, int(capacity), q)
    mpad = ((m + bm - 1) // bm) * bm
    nb = mpad // bm

    def run(cap):
        span_q = _empty((3, nb, g), np.int32)
        midx = _empty(cap, np.int32)
        ga = _empty(cap, np.int32)
        gcode = _empty(cap, np.int32)
        gslot = _empty(cap, np.int32)
        count = l.chunk_prep2(_i32(chunk), m, g, int(capacity), bm, s, q,
                              cap, _i32(span_q), _i32(midx), _i32(ga),
                              _i32(gcode), _i32(gslot))
        return span_q, (midx, ga, gcode, gslot), count

    span_q, ovf, count = run(cap)
    if auto:
        retry = _update_cap(m, g, bm, s, int(capacity), count, cap, q)
        if retry is not None:
            cap = retry
            span_q, ovf, count = run(cap)
    okb = np.bool_(count <= cap)
    return span_q, (*ovf, okb)


def build_voxel_backbone_books(voxel_coords, sparse_shape, caps):
    """One-call plan executor for the VoxelBackBone8x topology: 4 subm chunk
    books + 3 strided chunk books (the (3,1,1) z-compression book is left to
    the device).  caps: (cap2, cap3, cap4) downsample capacities.
    Returns dict {"subm": [4 books], "down": [(coords, chunk) x3]}."""
    l = _load()
    assert l is not None
    vox = np.ascontiguousarray(voxel_coords, np.int32)
    B, V, nd = vox.shape
    assert nd == 3
    sp = np.ascontiguousarray(sparse_shape, np.int32)
    caps = [int(c) for c in caps]
    n = B * V
    coords0 = _empty((n, 4), np.int32)
    ns = [n, caps[0], caps[1], caps[2]]
    subm = [_empty((ns[i], 9), np.int32) for i in range(4)]
    dc = [_empty((caps[i], 4), np.int32) for i in range(3)]
    dch = [_empty((caps[i], 9), np.int32) for i in range(3)]
    l.build_voxel_backbone_books(
        _i32(vox), B, V, _i32(sp), _i32(np.asarray(caps, np.int32)),
        _i32(coords0),
        _i32(subm[0]), _i32(dc[0]), _i32(dch[0]),
        _i32(subm[1]), _i32(dc[1]), _i32(dch[1]),
        _i32(subm[2]), _i32(dc[2]), _i32(dch[2]),
        _i32(subm[3]))
    return {"subm": subm, "down": list(zip(dc, dch))}
