"""Block-level latency attribution inside the sparse 3D backbone.

Times cumulative prefixes of VoxelResBackBone8x (sort / s1 / down2 / s2 /
s3 / s4 / full) as separate device-loop programs and diffs them — the
fine-grained companion of tools/profile_stages.py.

Usage: python tools/profile_backbone.py [--quant int8] [--host-rulebooks]
"""

import argparse
import json
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
    ap.add_argument("--size", default="bench")
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--host-rulebooks", action="store_true")
    ap.add_argument("--no-residency", action="store_true",
                    help="int8 without the int8-residency/BN-fold deploy path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from q3d_tpu.models import load_data_to_device
    from q3d_tpu.quant.api import int8_deploy_recipe
    from q3d_tpu.quant.rules import quant_rules_scope

    cfg_name = ("centerpoint_ref.yaml" if args.size == "ref"
                else "centerpoint_bench.yaml" if args.size == "bench"
                else "centerpoint_tiny.yaml")
    cfg, model, raw = benchmod.build(cfg_name, 1)
    batch16 = load_data_to_device(raw, compute_dtype=jnp.bfloat16)
    batch16 = {k: v for k, v in batch16.items()
               if k in ("voxels", "voxel_coords", "voxel_num_points",
                        "batch_size")}
    if args.host_rulebooks:
        from q3d_tpu.ops.spconv import host_planner
        B, V = raw["voxel_coords"].shape[:2]
        books = host_planner.build_for_backbone(
            cfg.MODEL.BACKBONE_3D.NAME, cfg.MODEL.BACKBONE_3D,
            model.dataset.grid_size, raw["voxel_coords"], B * V)
        if books is not None:
            batch16 = dict(batch16)
            batch16["rulebooks"] = load_data_to_device(
                {"rulebooks": books})["rulebooks"]

    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch16)
    jax.block_until_ready(variables)
    if args.quant == "int8":
        from q3d_tpu.quant.api import prepare_int8_deploy
        log("calibrating int8 deploy ...")
        rules, variables = prepare_int8_deploy(
            model, variables, [batch16] * 2, residency=not args.no_residency)
        variables = jax.device_put(variables)
    else:
        rules = None
    log("init done")

    with quant_rules_scope(rules):
        b_after_vfe = jax.jit(lambda v, b: model.apply(
            v, b, method=lambda m, bb: m.vfe(dict(bb), False)))(
                variables, batch16)

    def time_prefix(stop):
        def fn(variables, feed, k):
            def body(i, s):
                f = dict(feed)
                f["voxel_features"] = f["voxel_features"] + \
                    (s * 1e-30).astype(f["voxel_features"].dtype)
                with quant_rules_scope(rules):
                    out = model.apply(
                        variables, f,
                        method=lambda m, bb: m.backbone_3d(
                            dict(bb), False, stop_after=stop))
                return out["encoded_spconv_tensor"].features.sum().astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        jfn = jax.jit(fn)

        def t(k):
            t0 = time.perf_counter()
            _ = float(np.asarray(jfn(variables, b_after_vfe, k)))
            return time.perf_counter() - t0
        _ = t(1)
        t1 = min(t(1), t(1))
        return max(t(1 + args.iters) - t1, 1e-9) / args.iters

    stops = ["sort", "s1", "down2", "s2", "s3", "s4", None]
    cum = {}
    for stop in stops:
        cum[stop or "full"] = time_prefix(stop)
        log(f"prefix {stop or 'full':>6}: {cum[stop or 'full']*1e3:8.2f} ms")
    names = [s or "full" for s in stops]
    log("--- per-block delta ---")
    prev = 0.0
    deltas = {}
    for n in names:
        deltas[n] = cum[n] - prev
        prev = cum[n]
        log(f"{n:>6}: {deltas[n]*1e3:8.2f} ms")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in deltas.items()}))


if __name__ == "__main__":
    main()
