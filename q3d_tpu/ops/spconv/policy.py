"""Single source of truth for the one-hot span kernel's block/capacity
policy, shared by the device path (``pallas_conv``), the host planner
(``host_planner``) and the native runtime wrappers (``runtime/native.py``).

VERDICT r3 #5: these constants used to be triplicated with comment-only
sync ("must match"), and r3's own postmortem (commit 66a3b2c) showed that
drift silently disabling the kernel for a full bench cycle.  Now every
consumer imports this module and ``tests/test_native_runtime.py`` sweeps
capacities asserting python == native prep output.

Reference parity note: the reference has no analogue — spconv sizes its
CUDA rulebooks dynamically; on TPU every buffer is static, so capacity
policy is a first-class tuning surface.
"""

# span granule (rows): span starts are quantized down to multiples of Q —
# element-indexed BlockSpec starts stay tile-aligned for every dtype
# (int8 sublane tile = 32)
Q = 32
# defaults; overridable per call
DEFAULT_BM = 128          # output sites per block
DEFAULT_S = 256           # span rows per (block, offset) — must be mult of Q

# overflow-COO capacity ladder granule: caps are rounded up to multiples of
# this so frame-to-frame variation in the measured overflow maps to a small
# set of compiled shapes (each distinct cap is a distinct jitted program)
CAP_GRANULE = 512


def pack_for(cin):
    """Row-packing factor P for the one-hot span kernel (r5).

    P consecutive window rows share ONE span row of P*3*cin lanes, chosen
    so the packed width is an exact multiple of the 128-lane tile:
    C16 -> P=8 (384 lanes), C32 -> P=4 (384), C64 -> P=2 (384).  On paper
    this divides the (BM, S) one-hot compare — the dtype-neutral VPU floor
    — by P, removes the span matmul's lane-padding waste (C16: 48 lanes
    padded to 128 = 2.7x), and shrinks span DMA/VMEM bytes the same 2.7x.

    MEASURED on the 2026-08 toolchain (tools/profile_conv_paths.py
    --configs '512:768:p1,512:768,...', v5e, bench envelope, int8 ms/conv):
    C16 packed 1.64-1.76 vs 1.005 unpacked; C32 1.17-2.29 vs 0.924;
    C64 1.10-1.24 vs 0.736 — the log2(P) sub-window select tree (lane
    rotations at 3C-lane offsets, off the 128 tile grid) costs more than
    the saved compares + padding on this Mosaic.  DEFAULT OFF; the full
    machinery (kernel path, preps with q = 32*P granule, native parity,
    exactness tests) stays in place — re-probe with
    ``Q3D_SPAN_PACK=auto`` or the :pN sweep suffix after a toolchain bump
    (sub-tile shuffles are exactly the cost class these releases keep
    moving).
    """
    import os
    if os.environ.get("Q3D_SPAN_PACK", "off") == "off":
        return 1
    w = 3 * int(cin)
    for p in (8, 4, 2):
        if (w * p) % 128 == 0 and w * p <= 512:
            return p
    return 1


def block_for(capacity, cin, dtype=None):
    """(bm, s, uncond_b, pack) — ``choose_block`` plus the packing factor,
    with s rounded up to the packed span granule (Q * pack) so span starts
    stay tile-aligned in packed rows.  Single source for the device
    wrapper, the host planner and the prep cache keys."""
    bm, s, uncond = choose_block(capacity, cin, dtype)
    pack = pack_for(cin)
    g = Q * pack
    s = -(-s // g) * g
    return bm, s, uncond, pack
# headroom over the measured overflow count (frames at one envelope vary
# ~±35% around the mean in r4 measurements; 1.6x holds that with margin)
CAP_HEADROOM = 1.6


# ---------------------------------------------------------------------------
# measured-policy cache (VERDICT r4 #5): the hand table below encodes sweep
# results for ONE toolchain; Mosaic cost-model changes have silently
# invalidated it twice (r3, r4 postmortems).  tools/autotune_policy.py
# re-sweeps on the CURRENT toolchain and commits the optima to
# policy_cache.json keyed by the jax/jaxlib version; choose_block prefers a
# cache entry for the running toolchain and falls back to the builtin table
# otherwise.  ``policy_source()`` reports which one is live — bench.py
# records it in the benchmark artifact so a silent mistune is visible.
# ---------------------------------------------------------------------------

_POLICY_CACHE = None


def toolchain_tag():
    import jax
    try:
        import jaxlib
        jl = getattr(jaxlib, "__version__", "?")
    except Exception:  # noqa: BLE001
        jl = "?"
    return f"jax{jax.__version__}+jaxlib{jl}"


def _load_cache():
    global _POLICY_CACHE
    if _POLICY_CACHE is None:
        import json
        from pathlib import Path
        p = Path(__file__).with_name("policy_cache.json")
        try:
            _POLICY_CACHE = json.loads(p.read_text())
        except Exception:  # noqa: BLE001
            _POLICY_CACHE = {}
    return _POLICY_CACHE


def capacity_bucket(capacity, cin):
    """The builtin table's capacity tiers, named for cache keys."""
    if cin <= 64 and capacity >= 90000:
        return "ref"
    if capacity >= 2048:
        return "bench"
    if capacity >= 512:
        return "small"
    return "tiny"


def _cache_lookup(capacity, cin, dtype):
    cache = _load_cache().get(toolchain_tag())
    if not cache:
        return None
    tag = "int8" if (dtype is not None and "int8" in str(dtype)) else "fp"
    ent = cache.get(f"{capacity_bucket(capacity, cin)}|{cin}|{tag}")
    if ent is None:
        return None
    bm, s, uncond = int(ent[0]), int(ent[1]), bool(ent[2])
    if capacity >= s and capacity >= bm:
        return bm, s, uncond
    return None


def policy_source():
    """'cache' when policy_cache.json carries entries for the RUNNING
    toolchain (autotuned), else 'builtin' (hand table — possibly tuned on
    an older toolchain)."""
    return "cache" if _load_cache().get(toolchain_tag()) else "builtin"


def choose_block(capacity, cin, dtype=None):
    """(bm, s, uncond_b) policy per conv shape, from v5e sweeps
    (tools/profile_conv_paths.py, 2026-08, int8 per-conv ms at the bench
    envelope): narrow stages are per-(block, group)-iteration overhead-bound,
    so fewer/bigger blocks win big (C16@40k: 0.65 @512/1024 vs 0.78 @256/512;
    C32@38k: 0.68 @512/768 vs 0.89), while wide stages prefer small spans
    (C64@30k: 0.66 @256/512; C128@17k: 0.42 @256/384).

    Third element: ``uncond_b`` — compute the span-B contribution on every
    group (branch-free straight-line Mosaic code) instead of behind a
    lax.cond.  Measured faster at the narrowest and widest stages (C16@40k:
    0.56 @256/384-uncond vs 0.65 cond-best; C128@17k: 0.37 vs 0.42) and
    slower in between (the extra matmul outweighs the branch there).

    ONE shared policy for all dtypes: preps are built once per rulebook by
    the single-core host planner, and a per-dtype prep set would double the
    host build (~15 ms, already near the max(host, device) critical path).
    The policy is tuned for the int8 deployment mode; measured bf16 times at
    these configs are within noise of its own former configs."""
    cached = _cache_lookup(capacity, cin, dtype)
    if cached is not None:
        return cached
    # NOTE (r2): isolated-conv sweeps (tools/profile_conv_paths.py) suggest
    # bigger int8 blocks (C16@40k 0.632 @768/768u vs 0.762; C128@17k 0.280
    # @512/384u vs 0.381) but every in-graph A/B REGRESSED the end-to-end
    # int8 time (19.3 -> 20.0-20.7 ms; VMEM pressure from neighboring
    # fusions) — the shared policy below is the measured in-graph optimum
    # for both dtypes.  ``dtype`` is plumbed (and the host planner builds
    # preps per distinct policy) so future per-dtype splits stay cheap to
    # try.
    # reference-envelope tier (2026-08 r3 sweep at 100-200k rows / 0.075 m,
    # tools/profile_conv_paths.py --size ref): C16@160k 512/768 5.03/4.20
    # (bf16/int8 ms) vs 5.63/4.89 @256/384u; C32@200k 512/768u 7.17/6.04
    if cin <= 16 and capacity >= 100000:
        return 512, 768, False
    if cin <= 32 and capacity >= 100000:
        return 512, 768, True
    if cin <= 64 and capacity >= 90000:      # C64@100k: 4.23/3.58 vs
        return 512, 768, True                # 4.39/3.70 @256/512
    # bench-envelope tier, re-swept r4 on the 2026-08 toolchain (int32
    # one-hot compares changed the INT8 optima;
    # tools/profile_conv_paths.py --size bench, isolated-conv int8 ms):
    #   C16@40k:  int8 512/768 0.459 vs 256/384u 0.952
    #   C32@38k:  int8 512/1024 0.875 vs 512/768 1.153
    #   C64@30k:  int8 256/512 0.764 (kept); C128@17k: 256/384u 0.381 (kept)
    # End-to-end A/B (bench.py, r4): int8 19.51 -> 19.16 ms with these.
    # bf16 keeps the r2 shared picks — the sweep's isolated bf16 "optima"
    # (256/512 C16, 256/384u C32, 512/768u C64, 256/384 C128) REGRESSED
    # end-to-end 24.87 -> 25.83 ms (the r2 VMEM-pressure effect), so they
    # were reverted.  The dtype split costs one extra host prep per
    # differing stage (~ms, built once per rulebook).
    int8 = dtype is not None and "int8" in str(dtype)
    if cin <= 16 and capacity >= 512:
        return (512, 768, False) if int8 else (256, 384, True)
    if cin <= 32 and capacity >= 2048:
        return (512, 1024, False) if int8 else (512, 768, False)
    if cin >= 128 and capacity >= 512:
        return 256, 384, True
    if cin <= 64 and capacity >= 2048:
        return 256, 512, False
    if capacity >= 512:
        return 256, 512, False
    return DEFAULT_BM, DEFAULT_S, False


def cap_from_count(count):
    """Overflow-COO capacity for a MEASURED overflow count: headroom +
    round up to the CAP_GRANULE ladder (shape-stable across frames)."""
    need = int(count * CAP_HEADROOM)
    rungs = max(1, -(-max(need, 1) // CAP_GRANULE))
    return rungs * CAP_GRANULE


def overflow_cap(m, measured=None):
    """Overflow-COO list capacity for an m-row chunk table.

    measured: true overflow count when known (the native prep counts it in
    the same pass that fills the list) -> tight ladder cap.  Without a
    measurement, a conservative fraction of m: r4 measurements
    (2026-08, synthetic lidar scenes) put the worst stage at 6.4% of rows
    (C128 subm @ 44.8k rows, reference 0.075 m envelope), downsample convs
    near zero, and the whole bench 0.1 m envelope under 100 entries; m//12
    (8.3%) keeps headroom over the worst case.  Oversizing costs real MXU
    time (apply_overflow runs G masked GEMMs over ALL cap rows every conv),
    which is why the measured path exists: the ok-flag still falls back to
    the exact gather path if a frame ever exceeds the cap."""
    if measured is not None:
        return min(cap_from_count(measured), max(CAP_GRANULE, m // 8))
    return max(512, m // 12)
