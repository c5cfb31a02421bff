"""Per-stage latency / memory / FLOPs profiling CLI.

TPU equivalent of the reference's ``quant/count_time_n_memory.py`` workbench
(per-module wall-time + memory hooks) and ``quant/collect_gpu_stats.py``.

``--report`` additionally emits the workbench's two headline artifacts
(reference count_time_n_memory.py:235-291 log_time/log_gpu top-20 and
:1026-1346 get_accuracy_graph / evaluate_with_bits):
  * per-module table (top-20): measured per-stage device time with
    flops-apportioned per-module estimates + activation/parameter bytes —
    the fusion-respecting analogue of eager per-module hooks (under XLA a
    module's "own wall time" does not exist; kernels fuse across modules);
  * accuracy-vs-bits curves over W in {16,8,4,3,2} x A in {16,8} via
    ``quant.sensitivity.bit_sweep`` (use ``--ckpt`` for a trained model,
    ``--bits-frames`` to bound eval cost).

Usage:
    python tools/profile_model.py --cfg_file cfgs/synthetic_models/centerpoint_bench.yaml \
        [--quant int8] [--bf16] [--trace /tmp/q3d_trace] [--report]
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
    parser.add_argument("--memory-profile", default=None,
                        help="write a pprof device memory profile (the "
                             "allocator-snapshot analogue of the reference's "
                             "collect_gpu_stats.py)")
    parser.add_argument("--report", action="store_true",
                        help="emit the workbench report: per-module top-20 "
                             "time/memory table + accuracy-vs-bits curves")
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint for the accuracy-vs-bits curves")
    parser.add_argument("--bits-frames", type=int, default=4,
                        help="eval frames per bit point in --report")
    parser.add_argument("--weight-bits", default="16,8,4,3,2")
    parser.add_argument("--act-bits", default="16,8")
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

    # achieved TFLOP/s + MFU vs the v5e single-chip peak (VERDICT r3 #3);
    # per-dtype peaks match bench.py PEAK_FLOPS
    total_s = sum(breakdown.values())
    if cost.get("flops", 0) > 0 and total_s > 0:
        peak = 394e12 if args.quant == "int8" else 197e12
        tf = cost["flops"] / total_s / 1e12
        print(f"achieved: {tf:.2f} TFLOP/s end-to-end = "
              f"{100 * tf * 1e12 / peak:.1f}% MFU of v5e peak "
              f"({'int8' if args.quant == 'int8' else 'bf16'} "
              f"{peak / 1e12:.0f} TFLOP/s)")

    if args.trace:
        with profiler.trace(args.trace):
            jax.block_until_ready(jax.jit(full)(variables, batch))
        print(f"trace written to {args.trace}")

    if args.memory_profile:
        # allocator-level snapshot (reference collect_gpu_stats.py:163-180
        # pickles torch.cuda.memory._snapshot(); the XLA equivalent is the
        # pprof-format device memory profile — inspect with `pprof`)
        jax.block_until_ready(jax.jit(full)(variables, batch))
        jax.profiler.save_device_memory_profile(args.memory_profile)
        print(f"device memory profile -> {args.memory_profile}")

    if args.report:
        module_report(model, variables, batch, rules, breakdown)
        accuracy_vs_bits(cfg, args)


def module_report(model, variables, batch, rules, stage_times, top=20):
    """Per-module top-20 table: activation bytes, parameter bytes, conv
    FLOPs, and a flops-apportioned share of the MEASURED stage time."""
    import numpy as np
    from q3d_tpu.quant.sensitivity import capture_layer_outputs
    from q3d_tpu.utils.checkpoint import _flatten_tree

    outs = capture_layer_outputs(model, variables, batch, rules=rules)
    # keep LEAF modules only — a parent's flops double-count its children
    names = sorted(outs)
    leaves = [n for n in names
              if not any(m != n and m.startswith(n + ".") for m in names)]
    outs = {n: outs[n] for n in leaves}
    params = _flatten_tree(variables.get("params", {}))
    stage_alias = {"map_to_bev": "map_to_bev_module"}

    rows = []
    for name, out in outs.items():
        toks = name.split(".")
        if not toks:
            continue
        stage = stage_alias.get(toks[0], toks[0])
        act_bytes = int(np.prod(out.shape)) * out.dtype.itemsize
        pbytes = pcount = 0
        for path, leaf in params.items():
            if list(path[:len(toks)]) == toks:
                n = int(np.prod(np.shape(leaf)))
                pcount += n
                pbytes += n * np.asarray(leaf).dtype.itemsize
        # conv/linear flops ~= 2 * output positions * params-per-position
        ch = out.shape[-1] if out.ndim >= 1 else 1
        positions = max(int(np.prod(out.shape)) // max(int(ch), 1), 1)
        flops = 2 * positions * pcount
        rows.append({"module": name, "stage": stage, "act_bytes": act_bytes,
                     "param_bytes": pbytes, "flops": flops})

    stage_flops = {}
    for r in rows:
        stage_flops[r["stage"]] = stage_flops.get(r["stage"], 0) + r["flops"]
    for r in rows:
        st = stage_times.get(r["stage"], 0.0)
        share = r["flops"] / max(stage_flops.get(r["stage"], 1), 1)
        r["est_ms"] = st * share * 1e3

    rows.sort(key=lambda r: -r["est_ms"])
    print(f"\nper-module report (top {top} of {len(rows)}; est_ms = "
          "measured stage time x module flops share):")
    print(f"  {'module':48s} {'est_ms':>8s} {'gflops':>8s} "
          f"{'act_MB':>8s} {'param_MB':>9s}")
    for r in rows[:top]:
        print(f"  {r['module'][:48]:48s} {r['est_ms']:8.3f} "
              f"{r['flops'] / 1e9:8.3f} {r['act_bytes'] / 2**20:8.2f} "
              f"{r['param_bytes'] / 2**20:9.3f}")
    return rows


def accuracy_vs_bits(cfg, args):
    """Accuracy-vs-bits curves (reference get_accuracy_graph /
    evaluate_with_bits): metric at W in weight_bits x A in act_bits."""
    import jax
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.eval_utils import eval_one_epoch
    from q3d_tpu.quant.api import centerpoint_recipe
    from q3d_tpu.quant.sensitivity import bit_sweep

    wb = [int(b) for b in args.weight_bits.split(",")]
    ab = [int(b) for b in args.act_bits.split(",")]
    data_cfg = dict(cfg.DATA_CONFIG)
    data_cfg["NUM_FRAMES"] = min(int(data_cfg.get("NUM_FRAMES", 8)),
                                 args.bits_frames)
    from q3d_tpu.config import EDict
    dataset, loader, _ = build_dataloader(EDict(data_cfg), cfg.CLASS_NAMES,
                                          args.batch_size, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(lambda k, b: model.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)
    if args.ckpt:
        from q3d_tpu.utils.checkpoint import load_checkpoint
        variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    def eval_fn(rules):
        ret = eval_one_epoch(model, variables, loader, dataset,
                             list(cfg.CLASS_NAMES), cfg, rules=rules)
        metrics = ret[1] if isinstance(ret, tuple) else ret
        return {k: v for k, v in metrics.items()
                if isinstance(v, (int, float))}

    print(f"\naccuracy-vs-bits curves (W {wb} x A {ab}, "
          f"{data_cfg['NUM_FRAMES']} frames):")
    results = bit_sweep(eval_fn, centerpoint_recipe(), weight_bits=wb,
                        act_bits=ab)
    for (w, a), metrics in results.items():
        head = sorted(metrics.items())[:4]
        print(f"  W{w:>2d}A{a:>2d}: "
              + "  ".join(f"{k}={v:.4f}" for k, v in head))
    return results


if __name__ == "__main__":
    main()
