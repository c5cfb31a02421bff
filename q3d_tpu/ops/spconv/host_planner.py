"""Host-side rulebook planning — build every sparse-conv gather table on the
CPU (C++, q3d_tpu/runtime/src/rulebook.cpp) so the jitted TPU program
contains only gathers + MXU GEMMs.

The reference runs spconv's rulebook CUDA kernels inline with the conv; on
TPU the rulebooks are a pure host-computable function of the integer voxel
coordinates, so a serving pipeline overlaps frame i+1's rulebook build with
frame i's device compute (see bench.py --host-rulebooks).

A *plan* is the static sequence of rulebook-producing ops a backbone
executes; plans are derived from the same module parameters the backbone
uses, and ``tests/test_spconv.py::test_host_rulebooks_match_engine`` pins
host == device equality.
"""

import numpy as np

from .modules import subm_cache_key, down_cache_key, down_out_spatial
from .pallas_conv import block_for


def _preps_for(native, chunk, capacity, cin, prep_dtypes=(None, "int8")):
    """One-hot-kernel preps for kernel-routed widths (cin >= 16, matching
    pallas_conv.gather_conv_chunked_fast's routing).  The block policy is
    per-DTYPE (int8 prefers bigger blocks than bf16 — block_for), so one
    prep is built per distinct (bm, s, pack) the policies produce; each
    lands under its own ``prep_key``, and a consumer whose policy choice
    differs safely misses instead of mixing span grids.  Returns a list of
    (bm, s, pack, prep).

    prep_dtypes: which execution dtypes this build serves.  A serving
    pipeline deploys ONE dtype — building only its preps keeps the host
    build off the max(host, device) critical path (r4: both-dtype builds
    cost 22.9 ms vs 15 ms single at the bench envelope)."""
    if cin < 16:
        return []
    shapes = set()
    for dtype in prep_dtypes:
        # prep indep of uncond; span granule = Q * pack (the C++ q param)
        bm, s, _, pack = block_for(capacity, cin, dtype)
        if capacity >= s and capacity >= bm:
            shapes.add((bm, s, pack))
    return [(bm, s, pack,
             native.chunk_prep_spans(chunk, capacity, bm=bm, s=s,
                                     q=32 * pack))
            for bm, s, pack in sorted(shapes)]


def prep_key(bm, s, cache_key, pack=1):
    """Cache key of a one-hot-kernel prep: self-describing in
    (bm, s, pack)."""
    return f"prep|{bm}x{s}p{pack}|{cache_key}"


def _flatten_coords(voxel_coords, sparse_shape):
    """(B, V, nd) [z, y, x] with -1 pads -> (B*V, 1+nd) [b, z, y, x],
    rows sorted by ascending linearized key (pads last) — the numpy twin of
    ``SparseConvTensor.sort_rows`` so host-built gather tables reference the
    same row ids the device tensor uses."""
    B, V, nd = voxel_coords.shape
    b_col = np.broadcast_to(
        np.arange(B, dtype=np.int32)[:, None, None], (B, V, 1))
    b_col = np.where(voxel_coords[..., :1] >= 0, b_col, -1)
    flat = np.concatenate([b_col, voxel_coords.astype(np.int32)],
                          axis=-1).reshape(B * V, 1 + nd)
    key = flat[:, 0].astype(np.int64)
    for d in range(nd):
        key = key * int(sparse_shape[d]) + flat[:, 1 + d]
    key = np.where(flat[:, 0] >= 0, key, np.int64(2) ** 62)
    return flat[np.argsort(key, kind="stable")]


def voxel_backbone_plan(sparse_shape, caps, res_backbone=False):
    """Stage plan shared by VoxelBackBone8x / VoxelResBackBone8x (same
    coordinate topology: subm stage 1, three k3 strided convs, a (3,1,1)
    z-compression).  caps: dict from _capacity_schedule."""
    def keys(i):
        return [f"subm{i}"] + ([f"res{i}"] if res_backbone else [])
    return [
        ("subm", keys(1), 3, 1, 16),
        ("down", 3, 2, 1, caps.get("x_conv2"), 16),
        ("subm", keys(2), 3, 1, 32),
        ("down", 3, 2, 1, caps.get("x_conv3"), 32),
        ("subm", keys(3), 3, 1, 64),
        ("down", 3, 2, (0, 1, 1), caps.get("x_conv4"), 64),
        ("subm", keys(4), 3, 1, 128),
        ("down", (3, 1, 1), (2, 1, 1), 0, caps.get("out"), 128),
    ]


_RES_KEYS = {"subm1": ["res1"], "subm2": ["res2"], "subm3": ["res3"],
             "subm4": ["res4"]}


def voxelnext_plan(model_cfg):
    """Stage plan for VoxelResBackBone8xVoxelNeXt: residual stages to stride
    8 plus conv5/conv6 extra downsamples.  All downsample out_capacities are
    None (inherit input capacity — the module's default).  The 2D conv_out /
    shared_conv books depend on the device-computed bev_sum_pool coordinate
    set and stay on the device."""
    ks = [int(k) for k in model_cfg.get("SPCONV_KERNEL_SIZES", [3, 3, 3, 3])]
    ch = [int(c) for c in model_cfg.get("CHANNELS", [16, 32, 64, 128, 128])]
    chans = ch + [ch[-1]] * (6 - len(ch))
    plan = [("subm", ["subm1", "res1"], 3, 1, chans[0])]
    for i, (stage, k) in enumerate(zip(range(2, 7),
                                       [ks[0], ks[1], ks[2], ks[3], ks[3]])):
        plan.append(("down", k, 2, k // 2, None, chans[i]))
        plan.append(("subm", [f"res{stage}"], 3, 1, chans[i + 1]))
    return plan


def unet_plan(caps):
    """UNetV2: VoxelBackBone8x encoder + decoder subm books.  Decoder
    ``conv_m``/``conv_t`` layers run on the SAME coordinate sets as encoder
    stages (inverse convs restore the pre-downsample indices), so their
    books are aliases: up4_* at stride 8 (= subm4's set), up3_* at stride 4,
    up2_* at stride 2.  The stride-1 ``conv5`` reuses indice_key subm1
    directly.  Inverse-conv rulebooks themselves are built on device (not
    cached by the module)."""
    plan = [
        ("subm", ["subm1"], 3, 1, 16),
        ("down", 3, 2, 1, caps.get("x_conv2"), 16),
        ("subm", ["subm2", "up2_m", "up2_t"], 3, 1, 32),
        ("down", 3, 2, 1, caps.get("x_conv3"), 32),
        ("subm", ["subm3", "up3_m", "up3_t"], 3, 1, 64),
        ("down", 3, 2, (0, 1, 1), caps.get("x_conv4"), 64),
        ("subm", ["subm4", "up4_m", "up4_t"], 3, 1, 128),
        ("down", (3, 1, 1), (2, 1, 1), 0, caps.get("out"), 128),
    ]
    return plan


def pillar_plan(res_backbone=False):
    """Stage plan for PillarBackBone8x / PillarRes18BackBone8x
    (models/backbones_3d/spconv_backbone_2d.py; reference
    ``spconv_backbone_2d.py:114,207``): 2D sparse stages 32/64/128/256 at
    strides 1/2/4/8; the stride-16 conv5 stage is dense and needs no books.
    Downsample convs pass no out_capacity (inherit input capacity)."""
    def keys(i):
        return [f"res{i}"] if res_backbone else [f"subm{i}"]
    return [
        ("subm", keys(1), 3, 1, 32),
        ("down", 3, 2, 1, None, 32),
        ("subm", keys(2), 3, 1, 64),
        ("down", 3, 2, 1, None, 64),
        ("subm", keys(3), 3, 1, 128),
        ("down", 3, 2, 1, None, 128),
        ("subm", keys(4), 3, 1, 256),
    ]


def pillar_coords_from_points(points, points_mask, point_cloud_range,
                              voxel_size, grid_size, max_pillars):
    """Numpy twin of DynamicPillarVFE's pillar-coordinate derivation
    (models/backbones_3d/vfe/dynamic_pillar_vfe.py): raw (B, N, C) points ->
    (P, 3) int32 [b, y, x] sorted by linearized key with -1 pads — the exact
    coordinate set (and row order) the device pillar tensor uses, so
    host-built 2D rulebooks reference the same row ids."""
    pts = np.asarray(points)
    mask = np.asarray(points_mask).astype(bool)
    B, N = pts.shape[:2]
    nx, ny = int(grid_size[0]), int(grid_size[1])
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    x0, y0 = float(point_cloud_range[0]), float(point_cloud_range[1])
    P = int(max_pillars)

    flat = pts.reshape(B * N, -1)
    b_idx = np.repeat(np.arange(B, dtype=np.int64), N)
    cx = np.floor((flat[:, 0] - x0) / vx).astype(np.int64)
    cy = np.floor((flat[:, 1] - y0) / vy).astype(np.int64)
    ok = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) & mask.reshape(-1)
    key = (b_idx * ny + cy) * nx + cx
    BIG = np.int64(2) ** 62
    key = np.where(ok, key, BIG)
    uk = np.unique(key)
    uk = uk[uk != BIG][:P]
    coords = np.full((P, 3), -1, np.int32)
    n = uk.shape[0]
    coords[:n, 0] = (uk // (ny * nx)).astype(np.int32)
    coords[:n, 1] = ((uk // nx) % ny).astype(np.int32)
    coords[:n, 2] = (uk % nx).astype(np.int32)
    return coords


def build_rulebooks(plan, voxel_coords, sparse_shape,
                    prep_dtypes=(None, "int8")):
    """Execute a plan on host.  voxel_coords: (B, V, nd) numpy, or an
    already-flattened key-sorted (P, 1+nd) [b, ...] array with -1 pads
    (the pillar path).

    Plan steps:
      ("subm", [indice_keys], kernel, dilation)
      ("down", kernel, stride, padding, out_capacity_param)
    where ``out_capacity_param`` is the MODULE's out_capacity (possibly
    None); the cache key embeds the param while the actual table capacity
    falls back to the current voxel count (the module's inherit rule).

    Returns {cache_key: np arrays} for SparseConvTensor rulebook_cache
    seeding, or None when the native library is unavailable."""
    from ...runtime import native
    if not native.available():
        return None
    native.arena_reset()      # new frame: recycle reusable output buffers
    spatial = tuple(int(s) for s in sparse_shape)
    vox = np.asarray(voxel_coords)
    coords = vox.astype(np.int32) if vox.ndim == 2 \
        else native.flatten_sort_coords(vox, spatial)
    out = {}

    def _chunkable(k):
        ks = k if hasattr(k, "__len__") else [k] * len(spatial)
        return int(ks[-1]) == 3

    for step in plan:
        if step[0] == "subm":
            _, ikeys, k, dil, cin = step
            if _chunkable(k):
                # chunked anchor+code books feed the engine's chunk cache
                # directly (3x less host work + transfer than (N, 27))
                chunk = native.subm_chunk_rulebook(coords, spatial, k, dil)
                preps = _preps_for(native, chunk, coords.shape[0], cin,
                                   prep_dtypes)
                for kk in ikeys:
                    ck = subm_cache_key(kk, spatial, k, dil)
                    out["chunk|" + ck] = chunk
                    for bm, s, pk, prep in preps:
                        out[prep_key(bm, s, ck, pk)] = prep
            else:
                gather = native.subm_rulebook(coords, spatial, k, dil)
                for kk in ikeys:
                    out[subm_cache_key(kk, spatial, k, dil)] = gather
        else:
            _, k, s, p, cap_param, cin = step
            cap = cap_param or coords.shape[0]
            if _chunkable(k):
                oc, chunk, out_spatial = native.downsample_chunk_rulebook(
                    coords, spatial, k, s, p, cap)
                ck = down_cache_key(spatial, k, s, p, cap_param)
                # stored len-2: out_spatial is static math device-side
                out["chunkdown|" + ck] = (oc, chunk)
                for bm, ss, pk, prep in _preps_for(native, chunk,
                                                   coords.shape[0], cin,
                                                   prep_dtypes):
                    out[prep_key(bm, ss, ck, pk)] = prep
            else:
                oc, gather, out_spatial = native.downsample_rulebook(
                    coords, spatial, k, s, p, cap)
                out[down_cache_key(spatial, k, s, p, cap_param)] = (oc, gather)
            coords, spatial = oc, out_spatial
    return out


def build_for_backbone(backbone_name, model_cfg, grid_size, voxel_coords,
                       input_capacity, prep_dtypes=(None, "int8")):
    """Convenience: plan + build for a registered voxel backbone.  Returns
    None for unsupported backbones (model falls back to device rulebooks).

    VoxelBackBone8x / VoxelResBackBone8x use the one-call C++ plan executor
    (native.build_voxel_backbone_books); the final (3,1,1) z-compression
    book is intentionally absent — the device builds it in ~0.5 ms while
    the host path saves ~2.  VoxelResBackBone8xVoxelNeXt and UNetV2 run the
    generic per-step plan builder."""
    from ...runtime import native
    if not native.available():
        return None
    native.arena_reset()      # new frame: recycle reusable output buffers
    from ...models.backbones_3d.spconv_backbone import _capacity_schedule
    if backbone_name == "VoxelResBackBone8xVoxelNeXt":
        nx, ny, nz = (int(g) for g in grid_size)
        return build_rulebooks(voxelnext_plan(model_cfg), voxel_coords,
                               (nz + 1, ny, nx), prep_dtypes)
    if backbone_name == "UNetV2":
        # UNetV2's modules pass no out_capacity (inherit) — keys use None
        nx, ny, nz = (int(g) for g in grid_size)
        return build_rulebooks(unet_plan({}), voxel_coords,
                               (nz + 1, ny, nx), prep_dtypes)
    if backbone_name not in ("VoxelBackBone8x", "VoxelResBackBone8x"):
        return None
    nx, ny, nz = (int(g) for g in grid_size)
    sparse_shape = (nz + 1, ny, nx)
    caps = _capacity_schedule(model_cfg, input_capacity)
    vox = np.asarray(voxel_coords)
    n = vox.shape[0] * vox.shape[1]
    cap_list = [caps.get("x_conv2") or n, caps.get("x_conv3") or n,
                caps.get("x_conv4") or n]
    books = native.build_voxel_backbone_books(vox, sparse_shape, cap_list)

    res = backbone_name == "VoxelResBackBone8x"
    out = {}
    spatial = sparse_shape
    ikeys = ["subm1", "subm2", "subm3", "subm4"]
    pads = [1, 1, (0, 1, 1)]
    ns = [n, cap_list[0], cap_list[1], cap_list[2]]
    chans = [16, 32, 64, 128]
    for stage in range(4):
        preps = _preps_for(native, books["subm"][stage], ns[stage],
                           chans[stage], prep_dtypes)
        for kk in [ikeys[stage]] + (_RES_KEYS.get(ikeys[stage], [])
                                    if res else []):
            ck = subm_cache_key(kk, spatial, 3, 1)
            out["chunk|" + ck] = books["subm"][stage]
            for bm, ss, pk, prep in preps:
                out[prep_key(bm, ss, ck, pk)] = prep
        if stage == 3:
            break
        oc, chunk = books["down"][stage]
        dk = down_cache_key(spatial, 3, 2, pads[stage], cap_list[stage])
        out["chunkdown|" + dk] = (oc, chunk)
        for bm, ss, pk, prep in _preps_for(native, chunk, ns[stage],
                                           chans[stage], prep_dtypes):
            out[prep_key(bm, ss, dk, pk)] = prep
        spatial = down_out_spatial(spatial, 3, 2, pads[stage])
    return out


def build_for_pillar_backbone(backbone_name, points, points_mask,
                              point_cloud_range, voxel_size, grid_size,
                              max_pillars):
    """Host rulebooks for the 2D pillar backbones (PillarNet family).

    Derives the pillar coordinate set from the raw points exactly as
    DynamicPillarVFE does on device, then runs the generic 2D plan.
    Returns None when unsupported / native lib missing."""
    from ...runtime import native
    if not native.available():
        return None
    if backbone_name not in ("PillarBackBone8x", "PillarRes18BackBone8x"):
        return None
    coords = pillar_coords_from_points(points, points_mask,
                                       point_cloud_range, voxel_size,
                                       grid_size, max_pillars)
    nx, ny = int(grid_size[0]), int(grid_size[1])
    res = backbone_name == "PillarRes18BackBone8x"
    return build_rulebooks(pillar_plan(res), coords, (ny, nx))
