"""One-hot span-gather sparse conv — a Pallas TPU kernel that replaces the
row-gather hot loop of the sparse-conv engine with MXU matmuls.

Why: XLA's row gather costs ~3.6 ns/row on v5e regardless of row width or
dtype, and the chunked rulebook path needs G = K/3 gathered rows per output
site — ~20 ms of pure gather issue latency across a CenterPoint backbone,
dtype-independent (so int8 cannot beat bf16 there).  But chunk anchors are
SORTED and spatially local: over a block of BM consecutive output sites, the
anchors of one kernel-offset group fall inside a small contiguous span of
the x-window matrix.  That turns the gather into

    onehot(BM, S) @ span(S, W)            -- an MXU matmul

followed by the code-realignment (channel shift by the anchor's position in
its x-triple) and the conv GEMM against that offset's weight slice, all
fused in one kernel.  The per-(block, offset) span is DMA'd by the Pallas
pipeline (double-buffered across grid steps), so the kernel is MXU-bound —
and therefore int8 runs ~2x bf16, unlike the latency-bound gather.

Exactness: identical to ``engine.gather_conv_chunked`` whenever every
anchor of a block lies within S rows of the block's span start.  The
wrapper computes that predicate on-device and ``lax.cond``-selects the
plain gather path for the (rare) violating convolutions, so results are
exact on every input.

Reference parity: this executes the same rulebooks as spconv's
gather-GEMM-scatter (see engine.py); it is purely an execution-strategy
change, invisible to models.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import engine

# block/capacity policy lives in ONE module (policy.py) shared with the
# host planner and the native runtime wrappers; re-exported here for
# existing importers
from .policy import (Q, DEFAULT_BM, DEFAULT_S,  # noqa: F401
                     block_for, choose_block, overflow_cap, pack_for)


def _ceil128(w):
    return -(-int(w) // 128) * 128


def _realign(x, sub, code, pack, cw, wpad, c_ch):
    """Un-pack + code-realign one gathered row block (r5 packed kernel).

    x: (BM, pack*cw) — the matmul-gathered PACKED span rows; ``sub`` =
    which of the ``pack`` windows each output row wants; ``code`` = the
    x-tap realignment shift (engine.chunk_anchor_code).  Returns
    (BM, wpad) rows aligned for the weight GEMM: window ``sub`` moved to
    lane 0 via a log2(pack) binary select tree, then shifted right by
    code*c_ch lanes (values pushed past the logical window meet zero
    weight rows / are dropped — exact either way)."""
    p = pack
    # keep the select key 2-D int32 throughout: Mosaic rejects 1-D bool
    # minor-dim reshapes (vector<Nxi1> -> vector<Nx1xi1>), same class of
    # restriction as the r4 16-bit reshape removal
    s_rem = sub[:, None] if p > 1 else None
    while p > 1:
        p //= 2
        take_hi = s_rem >= p
        x = jnp.where(take_hi, x[:, p * cw:], x[:, :p * cw])
        s_rem = jnp.where(take_hi, s_rem - p, s_rem)
    bm = x.shape[0]
    z = jnp.zeros((bm, c_ch), x.dtype)
    tail = wpad - cw
    zt = [jnp.zeros((bm, tail), x.dtype)] if tail else []
    r0 = jnp.concatenate([x] + zt, axis=-1) if tail else x
    r1 = jnp.concatenate([z, x[:, :cw - c_ch]] + zt, axis=-1)
    r2 = jnp.concatenate([z, z, x[:, :cw - 2 * c_ch]] + zt, axis=-1)
    ccol = code[:, None]
    return jnp.where(ccol == 1, r1, jnp.where(ccol == 2, r2, r0))


def _kernel_v2(ss_ref, anchor_ref, code_ref, f3_hbm, w_ref, out_ref, *,
               bm, sp, gk, cw, wpad, c_ch, pack, acc_dtype):
    """One grid step per output block; the kernel loops over the G kernel-
    offset groups internally with double-buffered span DMAs, so the per-
    grid-step pipeline overhead is paid once per ~G*2 MXU matmuls instead
    of once per matmul.  Span B (the post-jump anchor cluster) is fetched
    and multiplied only for the (rare) blocks that need it.

    ss_ref (scalar prefetch): (3, NB, G) int32 — [span_a_q, span_b_q,
    use_b] in Q-granules of PACKED rows; anchors outside both spans were
    routed to the overflow-COO residual outside the kernel.

    r5 packing: f3_hbm is the window matrix reshaped (N/pack, pack*cw);
    ``sp`` span rows are PACKED rows, anchors are still logical (the kernel
    splits a -> a//pack row + a%pack window), so each span fetch carries
    ``pack`` windows and the one-hot compare shrinks by the same factor."""
    i = pl.program_id(0)
    wk = pack * cw

    def body(span_buf, acc_ref, sems):
        def dma(g, slot, which):
            s0 = ss_ref[which, i * gk + g] * Q
            return pltpu.make_async_copy(
                f3_hbm.at[pl.ds(s0, sp), :],
                span_buf.at[2 * slot + which],
                sems.at[2 * slot + which],
            )

        def start(g, slot, which, pred):
            @pl.when(pred)
            def _():
                dma(g, slot, which).start()

        def wait(g, slot, which, pred):
            @pl.when(pred)
            def _():
                dma(g, slot, which).wait()

        start(0, 0, 0, True)
        start(0, 0, 1, ss_ref[2, i * gk] == 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (bm, sp), 1)  # hoisted
        for g in range(gk):                      # static unroll
            slot = g % 2
            nslot = 1 - slot
            use_b = ss_ref[2, i * gk + g] == 1
            if g + 1 < gk:
                start(g + 1, nslot, 0, True)
                start(g + 1, nslot, 1, ss_ref[2, i * gk + g + 1] == 1)
            wait(g, slot, 0, True)
            a = anchor_ref[g]                    # (BM,) logical anchors
            code = code_ref[g]
            ap = jnp.floor_divide(a, pack) if pack > 1 else a
            sub = a - ap * pack if pack > 1 else None
            s0a = ss_ref[0, i * gk + g] * Q
            ila = ap - s0a
            in_a = (ila >= 0) & (ila < sp)
            span_a = span_buf[2 * slot]
            oha = (iota == ila[:, None]).astype(span_a.dtype)
            rows = jnp.dot(oha, span_a, preferred_element_type=acc_dtype)

            wait(g, slot, 1, use_b)

            def with_b():
                s0b = ss_ref[1, i * gk + g] * Q
                ilb = jnp.where(in_a, -1, ap - s0b)
                ohb = (iota == ilb[:, None]).astype(span_a.dtype)
                return rows + jnp.dot(ohb, span_buf[2 * slot + 1],
                                      preferred_element_type=acc_dtype)

            rows2 = jax.lax.cond(use_b, with_b, lambda: rows)
            rows2 = rows2.astype(span_a.dtype)   # exact: selected values
            rows2 = _realign(rows2, sub, code, pack, cw, wpad, c_ch)
            contrib = jnp.dot(rows2, w_ref[g],
                              preferred_element_type=acc_dtype)
            if g == 0:
                acc_ref[...] = contrib
            else:
                acc_ref[...] = acc_ref[...] + contrib
        out_ref[...] = acc_ref[...]

    pl.run_scoped(
        body,
        pltpu.VMEM((4, sp, wk), f3_hbm.dtype),
        pltpu.VMEM((bm, out_ref.shape[-1]), acc_dtype),
        pltpu.SemaphoreType.DMA((4,)),
    )


def _kernel_v3(ss_ref, anchor_ref, code_ref, f3_ref, w_ref, out_ref, *,
               bm, sp, gk, cw, wpad, c_ch, pack, acc_dtype, uncond_b):
    """VMEM-resident variant: the whole (packed) window matrix lives in
    VMEM, so a span is a direct aligned dynamic-slice read — no DMA
    machinery, no latency to hide.  Preferred whenever f3 fits (packing
    cuts the footprint ~2.7x at narrow channels, so most stages now do).

    uncond_b: compute the span-B contribution unconditionally (masked
    one-hot) instead of behind a lax.cond — trades a second matmul on every
    group for branch-free straight-line code the Mosaic pipeline can
    software-pipeline.

    The one-hot construction (an (BM, SP) iota-vs-anchor compare per group)
    is the kernel's VPU-bound floor at narrow channels.  It runs in int32
    (the 2026-08 Mosaic release dropped both 16-bit minor-dim reshapes and
    packed 16-bit vector compares); the r5 row-packing divides its size by
    ``pack`` instead of fighting the layout rules."""
    i = pl.program_id(0)
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (bm, sp), 1)
    acc = None
    for g in range(gk):                          # static unroll
        a = anchor_ref[g]                        # (BM,) logical anchors
        code = code_ref[g]
        ap = jnp.floor_divide(a, pack) if pack > 1 else a
        sub = a - ap * pack if pack > 1 else None
        s0a = ss_ref[0, i * gk + g] * Q
        span_a = f3_ref[pl.ds(s0a, sp), :]
        ila = ap - s0a
        in_a = (ila >= 0) & (ila < sp)
        oha = (iota32 == ila[:, None]).astype(span_a.dtype)
        rows = jnp.dot(oha, span_a, preferred_element_type=acc_dtype)

        if uncond_b:
            s0b = ss_ref[1, i * gk + g] * Q
            span_b = f3_ref[pl.ds(s0b, sp), :]
            live_b = (ss_ref[2, i * gk + g] == 1) & ~in_a
            ilb = jnp.where(live_b, ap - s0b, -1)
            ohb = (iota32 == ilb[:, None]).astype(span_b.dtype)
            rows2 = rows + jnp.dot(ohb, span_b,
                                   preferred_element_type=acc_dtype)
        else:
            use_b = ss_ref[2, i * gk + g] == 1

            def with_b():
                s0b = ss_ref[1, i * gk + g] * Q
                span_b = f3_ref[pl.ds(s0b, sp), :]
                ilb = jnp.where(in_a, -1, ap - s0b)
                ohb = (iota32 == ilb[:, None]).astype(span_b.dtype)
                return rows + jnp.dot(ohb, span_b,
                                      preferred_element_type=acc_dtype)

            rows2 = jax.lax.cond(use_b, with_b, lambda: rows)
        rows2 = rows2.astype(f3_ref.dtype)       # exact: selected values
        rows2 = _realign(rows2, sub, code, pack, cw, wpad, c_ch)
        contrib = jnp.dot(rows2, w_ref[g], preferred_element_type=acc_dtype)
        acc = contrib if acc is None else acc + contrib
    out_ref[...] = acc


# f3 sizes up to this many bytes take the VMEM-direct kernel (v3); larger
# ones stream spans by DMA (v2).  ~16 MB VMEM minus out/weight/temp room.
VMEM_F3_LIMIT = 12 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("bm", "sp", "cin", "pack", "interpret",
                                    "uncond"))
def _onehot_conv_call(f3, anchor, code, span_q, weight, bm, sp, cin, pack,
                      interpret, uncond=False):
    """f3 (Npad/pack, pack*cw) packed window matrix; anchor/code (G, Mpad)
    with LOGICAL anchors; span_q (3, NB, G) int32 [sa_q, sb_q, use_b] in
    Q-granules of packed rows; weight (G, wpad, Cout); cin = LOGICAL input
    channels (the realignment shift); sp = span rows (packed)
    -> (Mpad, Cout) acc_dtype."""
    gk, mpad = anchor.shape
    wk = f3.shape[1]
    cw = wk // pack
    wpad = _ceil128(cw) if pack > 1 else cw
    cout = weight.shape[2]
    nb = mpad // bm
    acc_dtype = jnp.int32 if f3.dtype == jnp.int8 else jnp.float32
    use_vmem = f3.size * f3.dtype.itemsize <= VMEM_F3_LIMIT
    # SMEM pads the minor dim to 128 lanes: (3, NB, G) would burn
    # 3*NB*128*4 B and blow the 1 MB SMEM at 160k-voxel capacities;
    # flattened (3, NB*G) pads once (kernels index [which, i*G + g])
    span_q = span_q.reshape(3, -1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((gk, bm), lambda i, ss: (0, i)),
            pl.BlockSpec((gk, bm), lambda i, ss: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM if use_vmem else pltpu.ANY),
            pl.BlockSpec((gk, wpad, cout), lambda i, ss: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, cout), lambda i, ss: (i, 0)),
    )
    kw = dict(bm=bm, sp=sp, gk=gk, cw=cw, wpad=wpad, c_ch=cin, pack=pack,
              acc_dtype=acc_dtype)
    if use_vmem:
        kern = functools.partial(_kernel_v3, uncond_b=uncond, **kw)
    else:
        kern = functools.partial(_kernel_v2, **kw)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, cout), acc_dtype),
        interpret=interpret,
    )(span_q, anchor, code, f3, weight)


def _pad_rows(x, mult, fill=0):
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                   constant_values=fill)


def split_chunk_table(chunk_idx, capacity):
    """Combined chunk ids (anchor + code*N, 3N = miss) -> (anchor with -1
    miss, code) int32 pairs.  Pure function of the rulebook — cache it."""
    code = jnp.clip(chunk_idx // capacity, 0, 2).astype(jnp.int32)
    anchor = chunk_idx - code * capacity
    anchor = jnp.where(chunk_idx >= 3 * capacity, -1, anchor)
    return anchor.astype(jnp.int32), code


def block_spans(anchor, capacity, bm, s, pack=1):
    """Two span starts per (block, offset) + per-entry coverage.

    anchor: (Mpad, G) with -1 miss, LOGICAL rows.  Span A starts at the
    block's min anchor; span B ends just past its max — together they cover
    every block whose anchors form at most two clusters (the single z/y-row
    crossing case that breaks one contiguous span).  Returns
    (span_q (3, NB, G) int32 in granule units, covered (Mpad, G) bool).
    Anchors not covered are handled by the overflow residual pass.

    ``pack``: span-start granule = Q * pack logical rows (Q PACKED rows) —
    the same parameterization the C++ twin exposes as ``q``
    (runtime/src/rulebook.cpp chunk_prep_impl); span length ``s`` stays in
    logical rows and must divide by the granule."""
    q = Q * pack
    assert s % q == 0, (s, q)
    mpad, gk = anchor.shape
    nb = mpad // bm
    a = anchor.reshape(nb, bm, gk)
    big = jnp.int32(1 << 30)
    amin = jnp.min(jnp.where(a < 0, big, a), axis=1)          # (NB, G)
    amax = jnp.max(a, axis=1)                                 # -1 if all miss
    npad_q = (capacity + q - 1) // q
    hi = jnp.maximum(npad_q - s // q, 0)
    sa = jnp.clip(jnp.where(amin == big, 0, amin // q), 0, hi)
    # B covers [amax - S + 1, amax]: start = ceil((amax + 1 - s) / q)
    sb = jnp.clip(jnp.where(amax < 0, 0, (amax + 1 - s + q - 1) // q),
                  0, hi)
    in_a = (a >= sa[:, None, :] * q) & (a < sa[:, None, :] * q + s)
    in_b = (a >= sb[:, None, :] * q) & (a < sb[:, None, :] * q + s)
    # span B only earns its DMA + matmul when it covers anchors A misses
    use_b = jnp.any(in_b & ~in_a & (a >= 0), axis=1).astype(jnp.int32)
    covered = ((a < 0) | in_a | (in_b & use_b[:, None, :].astype(bool)))
    covered = covered.reshape(mpad, gk)
    return jnp.stack([sa, sb, use_b]), covered


def overflow_entries(anchor, code, covered, cap):
    """COO list of the rulebook entries the spans miss.

    Returns (midx, ga, gcode, gslot, ok): (cap,) arrays — output row id,
    anchor, code, offset group of each overflow entry (-1 padded) — and
    ok = the list fit.  Pure function of the rulebook: cache it."""
    mpad, gk = anchor.shape
    ovf = (anchor >= 0) & ~covered                            # (Mpad, G)
    flat = ovf.reshape(-1)
    slots = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = slots[-1] + 1
    slot = jnp.where(flat & (slots < cap), slots, cap)
    def fill(vals, init):
        return jnp.full(cap + 1, init, jnp.int32).at[slot].set(vals)[:cap]
    lin = jnp.arange(mpad * gk, dtype=jnp.int32)
    midx = fill(lin // gk, -1)
    ga = fill(anchor.reshape(-1), -1)
    gcode = fill(code.reshape(-1), 0)
    gslot = fill(lin % gk, 0)
    return midx, ga, gcode, gslot, count <= cap


def apply_overflow(acc, f3, w3, ovf, c_ch):
    """Add the overflow entries' contributions to the kernel output.

    acc (Mpad, Cout); f3 (N, W); w3 (G, W, Cout); ovf from
    ``overflow_entries``.  ~cap row gathers + G small GEMMs + one
    scatter-add — negligible next to the kernel."""
    midx, ga, gcode, gslot, _ = ovf
    rows = jnp.take(f3, ga, axis=0, mode="fill", fill_value=0)  # (cap, W)
    w_ch = rows.shape[1]
    z = jnp.zeros((rows.shape[0], c_ch), rows.dtype)
    r1 = jnp.concatenate([z, rows[:, :w_ch - c_ch]], axis=-1)
    r2 = jnp.concatenate([z, z, rows[:, :w_ch - 2 * c_ch]], axis=-1)
    rows = jnp.where((gcode == 1)[:, None], r1,
                     jnp.where((gcode == 2)[:, None], r2, rows))
    contrib = jnp.zeros((rows.shape[0], acc.shape[1]), acc.dtype)
    for g in range(w3.shape[0]):
        mask = (gslot == g) & (midx >= 0)
        rg = rows * mask[:, None].astype(rows.dtype)
        contrib = contrib + jnp.dot(
            rg, w3[g],
            preferred_element_type=acc.dtype).astype(acc.dtype)
    safe_m = jnp.where(midx >= 0, midx, acc.shape[0])
    return acc.at[safe_m].add(contrib, mode="drop")


def onehot_conv_available(capacity, w_ch, s=DEFAULT_S, bm=DEFAULT_BM):
    """Static feasibility: span must fit inside the table."""
    return capacity >= s and capacity >= bm


def gather_conv_chunked_fast(features, keys, xcol, nx, chunk_idx, weight,
                             out_valid=None, out_scale=None,
                             preferred_dtype=jnp.float32, gemm_transform=None,
                             bm=None, s=None, uncond=False, interpret=None,
                             prep=None, force_kernel=False,
                             allow_kernel=True, pack=None):
    """Drop-in accelerated ``engine.gather_conv_chunked``: one-hot span
    kernel + exact overflow-COO residual.  Falls back to the plain gather
    path (lax.cond) only when the overflow list overflows its capacity.

    prep: optional cached result of ``prepare_chunk`` — pass it when
    several convs share one rulebook (it must have been built with the
    same (bm, s, pack)).
    pack: row-packing factor (policy.pack_for default); 1 disables.
    """
    if gemm_transform is not None:
        return engine.gather_conv_chunked(
            features, keys, xcol, nx, chunk_idx, weight, out_valid=out_valid,
            out_scale=out_scale, preferred_dtype=preferred_dtype,
            gemm_transform=gemm_transform)
    n, cin = features.shape
    m, gk = chunk_idx.shape
    kk, _, cout = weight.shape
    if bm is None or s is None:
        bm, s, uncond, pk = block_for(n, cin, features.dtype)
        if pack is None:
            pack = pk
    if pack is None:
        pack = pack_for(cin)
    if s % (Q * pack) != 0:
        pack = 1
    # measured v5e routing (tools/profile_conv_paths.py, bm256/s512): the
    # one-hot kernel beats the row gather at EVERY backbone stage and both
    # dtypes (C=16: 0.89 vs 1.87 bf16, 0.83 vs 1.33 int8; C=128: 0.68 vs
    # 2.24 bf16, 0.37 vs 1.36 int8), so all chunkable convs with cin >= 16
    # route to it.  The kernel requires HOST-built rulebooks (allow_kernel):
    # with device-built books the XLA scheduling of the prep +
    # scalar-prefetch chain regresses badly (measured 2x on v5e), and the
    # gather path wins
    wide_enough = (cin >= 16 and allow_kernel) or force_kernel
    if not (wide_enough and onehot_conv_available(n, 3 * cin, s, bm)):
        return engine.gather_conv_chunked(
            features, keys, xcol, nx, chunk_idx, weight, out_valid=out_valid,
            out_scale=out_scale, preferred_dtype=preferred_dtype)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    if prep is None:
        prep = prepare_chunk(chunk_idx, n, bm, s, pack=pack)
    anchor, code, span_q, ovf, ok = prep

    f3 = engine.x_window_matrix(features, keys, xcol, nx)     # (N, 3C)
    w3 = weight.reshape(gk, 3 * cin, cout)
    if pack > 1:
        # r5: P window rows per span row — zero lane padding (P*3C is a
        # 128 multiple by construction), 1/P one-hot compares, 1/P span
        # footprint.  A pure reshape: no extra data movement.
        f3k = _pad_rows(f3, Q * pack).reshape(-1, pack * 3 * cin)
        wp = (-(3 * cin)) % 128
    else:
        f3p = _pad_rows(f3, Q)
        # lane-align the window width for Mosaic DMA slices (zero weight
        # rows null out the pad lanes)
        wp = (-(3 * cin)) % 128
        f3k = jnp.pad(f3p, ((0, 0), (0, wp))) if wp else f3p
    w3k = jnp.pad(w3, ((0, 0), (0, wp), (0, 0))) if wp else w3
    sp = s // pack

    def fast(_):
        acc = _onehot_conv_call(f3k, anchor.T, code.T, span_q, w3k, bm, sp,
                                cin, pack, interpret, uncond)
        acc = apply_overflow(acc, f3, w3, ovf, cin)[:m]
        return acc.astype(jnp.float32) if features.dtype == jnp.int8 \
            else acc.astype(features.dtype)

    def slow(_):
        return engine.gather_conv_chunked(
            features, keys, xcol, nx, chunk_idx, weight,
            preferred_dtype=preferred_dtype)

    out = jax.lax.cond(ok, fast, slow, operand=None)
    if out_scale is not None:
        out = out * out_scale
    if out_valid is not None:
        out = out * out_valid[:, None].astype(out.dtype)
    return out


def prepare_chunk(chunk_idx, capacity, bm=DEFAULT_BM, s=DEFAULT_S, cap=None,
                  pack=1):
    """Split + pad a combined chunk table, compute its block spans and the
    overflow-COO list.  Cache per rulebook (pure function of indices).
    ``pack`` must match the execution-time packing (span granule Q*pack)."""
    anchor, code = split_chunk_table(chunk_idx, capacity)
    anchor = _pad_rows(anchor, bm, fill=-1)
    code = _pad_rows(code, bm, fill=0)
    span_q, covered = block_spans(anchor, capacity, bm, s, pack=pack)
    ovf = overflow_entries(anchor, code, covered,
                           cap or overflow_cap(chunk_idx.shape[0]))
    return anchor, code, span_q, ovf, ovf[-1]


def complete_prep(chunk_idx, capacity, reduced, bm):
    """Expand a host-reduced prep (``native.chunk_prep_spans``: span_q + the
    overflow COO) into the full prepare_chunk tuple by deriving anchor/code
    from the chunk table on device — two compares + a multiply-subtract,
    so the host needn't ship 2x the chunk's bytes.  (span_q carries its
    granule implicitly: the host built it with q = Q * pack, and the
    consumer must execute with the same pack — the prep cache key pins
    this.)"""
    span_q, ovf = reduced
    anchor, code = split_chunk_table(chunk_idx, capacity)
    anchor = _pad_rows(anchor, bm, fill=-1)
    code = _pad_rows(code, bm, fill=0)
    return anchor, code, span_q, ovf, ovf[-1]
