"""Headline benchmark: CenterPoint INT8 vs bf16 ("FP16") frames/sec on one chip.

Mirrors BASELINE.json's north-star metric (the reference claims a 35%
inference-time reduction from hybrid PTQ on CenterPoint — README.md:15):
we measure end-to-end jitted inference (voxel features -> sparse backbone ->
BEV pyramid -> CenterHead decode + NMS) at the nuScenes compute envelope on
synthetic scenes, in bf16 and in true-int8 deploy mode, and report the
speedup ratio.  ``vs_baseline`` = ratio / 1.35 (>= 1.0 beats the target).

Prints ONE JSON line on stdout; diagnostics go to stderr.
Usage: python bench.py [--size bench|tiny] [--iters N]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent

# persistent compile cache: the axon tunnel's remote compiler takes tens of
# minutes per large program; cached executables make reruns near-instant
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(cfg_name, batch_size=1):
    import jax
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device

    cfg = cfg_from_yaml_file(str(ROOT / "tools/cfgs/synthetic_models" /
                                 cfg_name), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raw = next(iter(loader))
    return cfg, model, raw


def time_mode(model, variables, batch, rules, iters, warmup=2):
    """Trustworthy device timing under the axon tunnel: block_until_ready
    does NOT synchronize there, but the single chip executes dispatches
    IN ORDER — so k dispatches + one host fetch of the LAST result bounds
    all k executions.  Chain-length differencing removes the fetch/dispatch
    overhead."""
    import jax
    import numpy as np
    from q3d_tpu.quant.rules import quant_rules_scope

    def fn(variables, batch):
        with quant_rules_scope(rules):
            out = model.apply(variables, batch, train=False)
        return out["final_scores"].sum()

    jfn = jax.jit(fn)
    s = None
    for _ in range(warmup):
        s = jfn(variables, batch)
    _ = float(np.asarray(s))                    # compile done, fetch path warm

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            s = jfn(variables, batch)
        _ = float(np.asarray(s))
        return time.perf_counter() - t0

    t_short = run(1)
    t_long = run(1 + iters)
    return max(t_long - t_short, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="bench", choices=["bench", "tiny"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from q3d_tpu.models import load_data_to_device
    from q3d_tpu.quant.api import int8_deploy_recipe, quantize_model
    from q3d_tpu.quant.rules import quant_rules_scope

    cfg_name = ("centerpoint_bench.yaml" if args.size == "bench"
                else "centerpoint_tiny.yaml")
    log(f"devices: {jax.devices()}")
    cfg, model, raw = build(cfg_name, args.batch)

    batch16 = load_data_to_device(raw, compute_dtype=jnp.bfloat16)
    # only ship what the model consumes — stray host metadata arrays have
    # tripped device_put on flaky tunnel states
    batch16 = {k: v for k, v in batch16.items()
               if k in ("voxels", "voxel_coords", "voxel_num_points",
                        "batch_size")}
    log("initializing params (jitted) ...")
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0), batch16)
    jax.block_until_ready(variables)
    log(f"init done in {time.perf_counter() - t0:.1f}s")

    log("timing bf16 ...")
    dt16 = time_mode(model, variables, batch16, None, args.iters)
    fps16 = args.batch / dt16
    log(f"bf16: {dt16 * 1e3:.2f} ms/batch -> {fps16:.2f} frames/s")

    rules = int8_deploy_recipe()
    with quant_rules_scope(rules):
        qvars = jax.jit(
            lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                        batch16)
    qvars = dict(qvars)
    for coll in ("params", "batch_stats"):
        if coll in variables:
            qvars[coll] = variables[coll]
    log("timing int8 ...")
    dt8 = time_mode(model, qvars, batch16, rules, args.iters)
    fps8 = args.batch / dt8
    log(f"int8: {dt8 * 1e3:.2f} ms/batch -> {fps8:.2f} frames/s")

    ratio = fps8 / fps16
    log(f"speedup int8/bf16 = {ratio:.3f}x (target 1.35x)")
    print(json.dumps({
        "metric": "centerpoint_synthetic_int8_vs_bf16_fps_ratio",
        "value": round(ratio, 4),
        "unit": "x",
        "vs_baseline": round(ratio / 1.35, 4),
        "detail": {"fps_bf16": round(fps16, 3), "fps_int8": round(fps8, 3),
                   "ms_bf16": round(dt16 * 1e3, 3), "ms_int8": round(dt8 * 1e3, 3),
                   "batch": args.batch, "config": cfg_name},
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — driver needs ONE JSON line
        log(f"bench failed ({type(e).__name__}: {e}); retrying at tiny size")
        sys.argv = [sys.argv[0], "--size", "tiny", "--iters", "10"]
        main()
