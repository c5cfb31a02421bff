"""Microbenchmark: chunk-gather vs one-hot Pallas kernel per conv shape.

Times a single submanifold conv layer on synthetic lidar-ring coordinates at
each backbone stage's (rows, channels) on the real device, for bf16 and int8,
on both execution paths.  Informs the per-stage path routing in
q3d_tpu/ops/spconv/modules.py (the `wide_enough` predicate).

Usage: python tools/profile_conv_paths.py [--iters 30]
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", default="bench", choices=["ref", "bench"])
    ap.add_argument("--bm", type=int, default=128)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--configs", default=None,
                    help="comma list of bm:s[:u][:pN] tuples to sweep "
                         "(one-hot kernel only, e.g. 256:512, 256:384:u "
                         "for uncond-B, 512:768:p8 to force pack=8, "
                         "512:768:u:p4); pack defaults to the policy's "
                         "pack_for(C); overrides --bm/--s")
    ap.add_argument("--dtypes", default="bf16,int8")
    ap.add_argument("--no-gather", action="store_true",
                    help="skip the plain gather-path baseline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.runtime import native
    from q3d_tpu.ops.spconv import engine, pallas_conv
    from q3d_tpu.ops.spconv.sparse_tensor import SparseConvTensor, linearize

    cfg_name = ("centerpoint_ref.yaml" if args.size == "ref"
                else "centerpoint_bench.yaml")
    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/synthetic_models" / cfg_name), EDict())
    dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                          batch_size=1, training=False)
    raw = next(iter(loader))
    vox = np.asarray(raw["voxel_coords"])
    nx, ny, nz = (int(g) for g in dataset.grid_size)
    sparse_shape = (nz + 1, ny, nx)
    # per-stage downsample output caps: cfg OUT_CAPACITY_FACTORS x input cap
    fac = cfg.MODEL.BACKBONE_3D.get("OUT_CAPACITY_FACTORS",
                                    {"x_conv2": 0.95, "x_conv3": 0.75,
                                     "x_conv4": 0.42})
    in_cap = int(np.asarray(raw["voxel_coords"]).shape[1])
    caps = [int(in_cap * fac[k]) // 8 * 8
            for k in ("x_conv2", "x_conv3", "x_conv4")]
    log(f"caps: in={in_cap} {caps}")
    books = native.build_voxel_backbone_books(vox, sparse_shape, caps)
    coords0 = native.flatten_sort_coords(vox, sparse_shape)

    # per-stage (coords, spatial, chunk_book, channels)
    stages = []
    sp = sparse_shape
    cur = coords0
    chans = [16, 32, 64, 128]
    pads = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]
    for i in range(4):
        stages.append((cur, sp, books["subm"][i], chans[i]))
        if i == 3:
            break
        oc, _ = books["down"][i]
        cur = oc
        sp = tuple((sp[d] + 2 * pads[i][d] - 3) // 2 + 1 for d in range(3))

    def time_loop(jfn, *arrs, iters=args.iters):
        _ = jax.block_until_ready(jfn(*arrs, 1))
        ts = min(time.perf_counter() - t0 for t0 in
                 [time.perf_counter()] if False) if False else None
        def run(k):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(*arrs, k))
            return time.perf_counter() - t0
        t_short = min(run(1), run(1))
        t_long = run(1 + iters)
        return max(t_long - t_short, 1e-9) / iters

    results = {}
    for si, (coords, sp, chunk_np, C) in enumerate(stages):
        N = coords.shape[0]
        key_np = np.asarray(
            linearize(jnp.asarray(coords), sp, 1)).astype(np.int32)
        st_keys = jnp.asarray(key_np)
        xcol = jnp.asarray(coords[:, -1])
        chunk = jnp.asarray(chunk_np)
        nxs = int(sp[-1])
        def _parse(c):
            parts = c.split(":")
            uncond = False
            pack = None
            for suf in parts[2:]:
                if suf == "u":
                    uncond = True
                elif suf.startswith("p"):
                    pack = int(suf[1:])
                else:
                    raise ValueError(f"unrecognized config suffix {suf!r} "
                                     f"in {c!r} (expected 'u' or 'pN')")
            return int(parts[0]), int(parts[1]), uncond, pack
        configs = ([_parse(c) for c in args.configs.split(",")]
                   if args.configs else [(args.bm, args.s, False, None)])
        dtype_map = {"bf16": jnp.bfloat16, "int8": jnp.int8}
        for dname in args.dtypes.split(","):
            dtype = dtype_map[dname]
            if dtype == jnp.int8:
                feats = jnp.asarray(
                    np.random.randint(-127, 127, (N, C)), jnp.int8)
                w = jnp.asarray(np.random.randint(-8, 8, (27, C, C)), jnp.int8)
            else:
                feats = jnp.asarray(np.random.randn(N, C), dtype)
                w = jnp.asarray(np.random.randn(27, C, C) * 0.1, dtype)

            def gfn(feats, keys, xcol, chunk, w, k, _nx=nxs):
                def body(i, s):
                    # value-dependent zero XLA cannot fold (prevents hoisting)
                    eps = (s * 1e-38).astype(jnp.int32)
                    f = feats + eps.astype(feats.dtype)
                    out = engine.gather_conv_chunked(f, keys, xcol, _nx,
                                                     chunk, w)
                    return out.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            if args.no_gather:
                tg = float("nan")
            else:
                jg = jax.jit(gfn, static_argnames=())
                tg = time_loop(jg, feats, st_keys, xcol, chunk, w)
            entry = {"N": N, "C": C, "gather_ms": round(tg * 1e3, 3)}
            for bm, s, uncond, pk in configs:
                if not pallas_conv.onehot_conv_available(N, 3 * C, s, bm):
                    continue
                pack = pk if pk is not None else pallas_conv.pack_for(C)
                if s % (32 * pack) != 0:
                    pack = 1
                prep = pallas_conv.prepare_chunk(chunk, N, bm, s, pack=pack)
                prep = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, prep))
                n_ovf = int(np.asarray((prep[3][0] >= 0).sum()))
                ok = bool(np.asarray(prep[4]))

                def kfn(feats, keys, xcol, chunk, w, k, _nx=nxs,
                        _prep=prep, _bm=bm, _s=s, _u=uncond, _p=pack):
                    def body(i, s_):
                        eps = (s_ * 1e-38).astype(jnp.int32)
                        f = feats + eps.astype(feats.dtype)
                        out = pallas_conv.gather_conv_chunked_fast(
                            f, keys, xcol, _nx, chunk, w, prep=_prep,
                            force_kernel=True, bm=_bm, s=_s, uncond=_u,
                            pack=_p)
                        return out.astype(jnp.float32).sum()
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

                jk = jax.jit(kfn)
                try:
                    tk = time_loop(jk, feats, st_keys, xcol, chunk, w)
                except Exception as e:  # noqa: BLE001
                    log(f"kernel failed stage{si+1} {dname} "
                        f"bm{bm}/s{s}: {e}")
                    tk = float("nan")
                tag = f"bm{bm}_s{s}" + ("_u" if uncond else "") \
                    + (f"_p{pack}" if pack > 1 else "")
                entry[f"onehot_{tag}_ms"] = round(tk * 1e3, 3)
                log(f"stage{si+1} {dname}: N={N} C={C} {tag} "
                    f"onehot {tk*1e3:.3f} ms (ovf {n_ovf} ok={ok}) "
                    f"gather {tg*1e3:.3f} ms")
            results[f"stage{si+1}_{dname}"] = entry

    import json
    print(json.dumps(results))





def chain_bench():
    """Chained-stage variant: 5 convs back-to-back per stage (as in the
    model), comparing gather vs one-hot routing; plus downsample books."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.runtime import native
    from q3d_tpu.ops.spconv import engine, pallas_conv
    from q3d_tpu.ops.spconv.sparse_tensor import linearize
    import time as _t

    cfg_name = ("centerpoint_ref.yaml" if args.size == "ref"
                else "centerpoint_bench.yaml")
    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/synthetic_models" / cfg_name), EDict())
    dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                          batch_size=1, training=False)
    raw = next(iter(loader))
    vox = np.asarray(raw["voxel_coords"])
    nx, ny, nz = (int(g) for g in dataset.grid_size)
    sparse_shape = (nz + 1, ny, nx)
    books = native.build_voxel_backbone_books(vox, sparse_shape,
                                              [38000, 30000, 16800])
    coords0 = native.flatten_sort_coords(vox, sparse_shape)

    def timed(jfn, *arrs, iters=20):
        jax.block_until_ready(jfn(*arrs, 1))
        def run(k):
            t0 = _t.perf_counter()
            jax.block_until_ready(jfn(*arrs, k))
            return _t.perf_counter() - t0
        ts = min(run(1), run(1))
        return max(run(1 + iters) - ts, 1e-9) / iters

    for C, si, coords, sp in ((16, 0, coords0, sparse_shape),
                              (32, 1, books["down"][0][0], (21, 512, 512))):
        N = coords.shape[0]
        chunk = jnp.asarray(books["subm"][si])
        keys = jnp.asarray(np.asarray(
            linearize(jnp.asarray(coords), sp, 1)).astype(np.int32))
        xcol = jnp.asarray(coords[:, -1])
        nxs = int(sp[-1])
        dt = jnp.int8 if os.environ.get("CHAIN_INT8") else jnp.bfloat16
        if dt == jnp.int8:
            feats = jnp.asarray(np.random.randint(-40, 40, (N, C)), jnp.int8)
            ws = [jnp.asarray(np.random.randint(-4, 4, (27, C, C)), jnp.int8)
                  for _ in range(5)]
        else:
            feats = jnp.asarray(np.random.randn(N, C), dt)
            ws = [jnp.asarray(np.random.randn(27, C, C) * 0.05, dt)
                  for _ in range(5)]
        span_s = int(os.environ.get("CHAIN_S", "256"))
        span_bm = int(os.environ.get("CHAIN_BM", "128"))
        prep = native.chunk_prep(np.asarray(chunk), N, bm=span_bm, s=span_s)
        prep = jax.device_put(prep)

        def chain(use_kernel, feats, chunk, ws, k):
            def body(i, s):
                f = feats + (s * 1e-38).astype(jnp.int32).astype(feats.dtype)
                for w in ws:
                    if use_kernel:
                        f = pallas_conv.gather_conv_chunked_fast(
                            f, keys, xcol, nxs, chunk, w, prep=prep,
                            force_kernel=True, bm=span_bm, s=span_s)
                    else:
                        f = engine.gather_conv_chunked(f, keys, xcol, nxs,
                                                       chunk, w)
                    f = jnp.clip(jnp.maximum(f, 0), 0, 40).astype(
                        feats.dtype)
                return f.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        jg = jax.jit(functools.partial(chain, False))
        jk = jax.jit(functools.partial(chain, True))
        tg = timed(jg, feats, chunk, ws)
        tk = timed(jk, feats, chunk, ws)
        log(f"chain stage{si+1} C={C}: gather5 {tg*1e3:.3f} ms  "
            f"kernel5 {tk*1e3:.3f} ms")


if __name__ == "__main__":
    if "--chain" in sys.argv:
        chain_bench()
    else:
        main()
