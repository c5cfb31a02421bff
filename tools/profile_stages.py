"""Per-stage device-loop latency breakdown for the headline bench model.

Times each pipeline stage (vfe / backbone_3d / map_to_bev / backbone_2d /
dense_head) as its OWN fori_loop device program, so tunnel dispatch latency
cancels out (same trick as bench.py's _make_loop_runner).  This localizes
the device residual that bench.py measures end-to-end.

Usage:
    python tools/profile_stages.py [--size bench] [--quant int8]
        [--host-rulebooks] [--iters 10] [--batch 1]
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
    ap.add_argument("--size", default="bench",
                    choices=["ref", "bench", "tiny"])
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--host-rulebooks", action="store_true")
    ap.add_argument("--no-residency", action="store_true",
                    help="int8 without the int8-residency/BN-fold deploy path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(ROOT))
    import bench as benchmod
    from q3d_tpu.models import load_data_to_device
    from q3d_tpu.quant.api import int8_deploy_recipe
    from q3d_tpu.quant.rules import quant_rules_scope

    cfg_name = ("centerpoint_ref.yaml" if args.size == "ref"
                else "centerpoint_bench.yaml" if args.size == "bench"
                else "centerpoint_tiny.yaml")
    cfg, model, raw = benchmod.build(cfg_name, args.batch)
    batch16 = load_data_to_device(raw, compute_dtype=jnp.bfloat16)
    batch16 = {k: v for k, v in batch16.items()
               if k in ("voxels", "voxel_coords", "voxel_num_points",
                        "batch_size")}
    if args.host_rulebooks:
        from q3d_tpu.ops.spconv import host_planner
        B, V = raw["voxel_coords"].shape[:2]
        t0 = time.perf_counter()
        books = host_planner.build_for_backbone(
            cfg.MODEL.BACKBONE_3D.NAME, cfg.MODEL.BACKBONE_3D,
            model.dataset.grid_size, raw["voxel_coords"], B * V)
        log(f"host rulebooks: {(time.perf_counter()-t0)*1e3:.1f} ms")
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

    # ---- stage functions: each consumes the *fixed* output of the previous
    def run_stage(stage_fn, feed, perturb_key=None):
        """Device-loop time stage_fn(feed); every float leaf of the feed is
        perturbed by the loop carry so XLA can't hoist the body."""
        def fn(variables, feed, k):
            def body(i, s):
                f = jax.tree_util.tree_map(
                    lambda x: x + (s * 1e-30).astype(x.dtype)
                    if hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating) else x,
                    feed)
                with quant_rules_scope(rules):
                    out = stage_fn(variables, f)
                return out.astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        jfn = jax.jit(fn)
        _ = float(np.asarray(jfn(variables, feed, 1)))
        t_short = min(
            *[_timed(jfn, variables, feed, 1) for _ in range(2)])
        t_long = _timed(jfn, variables, feed, 1 + args.iters)
        return max(t_long - t_short, 1e-9) / args.iters

    def _timed(jfn, variables, feed, k):
        t0 = time.perf_counter()
        _ = float(np.asarray(jfn(variables, feed, k)))
        return time.perf_counter() - t0

    # Build intermediate feeds by running each stage once (jitted, eval).
    def apply_method(m_fn, feed):
        return model.apply(variables, feed, method=m_fn)

    with quant_rules_scope(rules):
        def m_vfe(m, b):
            return m.vfe(dict(b), False)
        feed0 = dict(batch16)
        b_after_vfe = jax.jit(lambda v, b: model.apply(
            v, b, method=lambda m, bb: m.vfe(dict(bb), False)))(
                variables, feed0)

        def _bb3d(m, bb):
            return m.backbone_3d(dict(bb), False)
        b_after_3d = jax.jit(lambda v, b: model.apply(
            v, b, method=_bb3d))(variables, b_after_vfe)

        def _map(m, bb):
            return m.map_to_bev_module(dict(bb), False)
        b_after_bev = jax.jit(lambda v, b: model.apply(
            v, b, method=_map))(variables, b_after_3d)

        def _bb2d(m, bb):
            return m.backbone_2d(dict(bb), False)
        b_after_2d = jax.jit(lambda v, b: model.apply(
            v, b, method=_bb2d))(variables, b_after_bev)

    results = {}

    results["vfe"] = run_stage(
        lambda v, f: model.apply(
            v, f, method=lambda m, bb: m.vfe(dict(bb), False)
        )["voxel_features"].sum(),
        batch16)

    results["backbone_3d"] = run_stage(
        lambda v, f: model.apply(
            v, f, method=_bb3d)["encoded_spconv_tensor"].features.sum(),
        b_after_vfe)

    results["map_to_bev"] = run_stage(
        lambda v, f: model.apply(
            v, f, method=_map)["spatial_features"].sum(),
        b_after_3d)

    results["backbone_2d"] = run_stage(
        lambda v, f: model.apply(
            v, f, method=_bb2d)["spatial_features_2d"].sum(),
        {"spatial_features": b_after_bev["spatial_features"],
         "batch_size": b_after_bev["batch_size"]})

    results["dense_head"] = run_stage(
        lambda v, f: model.apply(
            v, f, method=lambda m, bb: m.dense_head(dict(bb), False)
        )["final_scores"].sum(),
        {"spatial_features_2d": b_after_2d["spatial_features_2d"],
         "batch_size": b_after_2d["batch_size"]})

    total = sum(results.values())
    for k, v in results.items():
        log(f"{k:>14}: {v*1e3:8.2f} ms  ({100*v/total:5.1f}%)")
    log(f"{'SUM':>14}: {total*1e3:8.2f} ms")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
