"""Per-stage latency / memory / FLOPs profiling CLI.

TPU equivalent of the reference's ``quant/count_time_n_memory.py`` workbench
(per-module wall-time + memory hooks) and ``quant/collect_gpu_stats.py``.

Usage:
    python tools/profile_model.py --cfg_file cfgs/synthetic_models/centerpoint_bench.yaml \
        [--quant int8] [--bf16] [--trace /tmp/q3d_trace]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--quant", choices=["none", "fake", "int8"],
                        default="none")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--trace", default=None,
                        help="also write a jax.profiler trace to this dir")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from q3d_tpu.config import cfg, cfg_from_yaml_file
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.quant.api import centerpoint_recipe, int8_deploy_recipe
    from q3d_tpu.quant.rules import quant_rules_scope
    from q3d_tpu.utils import profiler

    cfg_from_yaml_file(args.cfg_file, cfg)
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(
        next(iter(loader)),
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    rules = {"none": None, "fake": centerpoint_recipe(),
             "int8": int8_deploy_recipe()}[args.quant]
    with quant_rules_scope(rules):
        variables = jax.jit(
            lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                        batch)

    prof = profiler.StageProfiler(model, variables, batch, rules=rules)
    breakdown = prof.breakdown(iters=args.iters)
    print("per-stage latency (ms):")
    for k, v in breakdown.items():
        print(f"  {k:22s} {v * 1e3:8.2f}")

    def full(variables, batch):
        with quant_rules_scope(rules):
            out = model.apply(variables, batch, train=False)
        return out["final_scores"]

    cost = profiler.compiled_cost(full, variables, batch)
    mem = profiler.device_memory_stats()
    print("cost analysis:", json.dumps(cost))
    print("memory:", json.dumps(mem))

    if args.trace:
        with profiler.trace(args.trace):
            jax.block_until_ready(jax.jit(full)(variables, batch))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
