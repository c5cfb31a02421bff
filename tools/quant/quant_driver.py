"""Shared PTQ driver — the TPU equivalent of the reference's per-model quant
scripts (``quant/quant_centerpoint.py:172``, ``quant/quant_second.py``).

Flow (reference §3.3 call stack): seed-pinned build -> load checkpoint ->
attach quant rules (module-path recipe) -> [static: stream calibration
batches, resolve entropy amax] -> eval_one_epoch, reporting FP vs quantized
metrics + latency side by side.
"""

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def run(recipe_name="centerpoint"):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--w_bits", type=int, default=8)
    parser.add_argument("--act_bits", type=int, default=8)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--no_sq", action="store_true")
    parser.add_argument("--static", action="store_true")
    parser.add_argument("--calib_batches", type=int, default=200)
    parser.add_argument("--amax_method", default="entropy",
                        choices=["entropy", "percentile", "mse", "max"])
    parser.add_argument("--deploy_int8", action="store_true",
                        help="run true-int8 GEMMs instead of fake-quant")
    parser.add_argument("--skip_fp_baseline", action="store_true")
    parser.add_argument("--infer_time", action="store_true")
    args = parser.parse_args()

    import jax
    from q3d_tpu.config import cfg, cfg_from_yaml_file
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.eval_utils import eval_one_epoch
    from q3d_tpu.utils import common_utils
    from q3d_tpu.quant import api as quant_api
    from q3d_tpu.utils.checkpoint import (load_checkpoint, load_pth_file,
                                          import_torch_state_dict)

    common_utils.set_random_seed(4)          # reference pins seed 4 (:173-180)
    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    logger.info(f"PTQ driver [{recipe_name}] w={args.w_bits} act={args.act_bits} "
                f"sq={not args.no_sq} alpha={args.alpha} static={args.static} "
                f"deploy_int8={args.deploy_int8}")

    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=False,
        logger=logger)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=test_set)
    example = load_data_to_device(next(iter(test_loader)))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            variables = import_torch_state_dict(load_pth_file(args.ckpt),
                                                variables, logger=logger)
        else:
            variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    if not args.skip_fp_baseline:
        logger.info("== FP32 baseline eval ==")
        fp_ret = eval_one_epoch(model, variables, test_loader, test_set,
                                cfg.CLASS_NAMES, cfg, logger=logger,
                                infer_time=args.infer_time)
    else:
        fp_ret = {}

    if args.deploy_int8:
        rules = quant_api.int8_deploy_recipe(sq=not args.no_sq,
                                             alpha=args.alpha,
                                             static=args.static)
    else:
        recipe_fn = {"centerpoint": quant_api.centerpoint_recipe,
                     "second": quant_api.second_recipe,
                     "pointpillar": quant_api.pointpillar_recipe,
                     "voxelnext": quant_api.voxelnext_recipe,
                     "transfusion": quant_api.transfusion_recipe}[recipe_name]
        rules = recipe_fn(w_bits=args.w_bits, act_bits=args.act_bits,
                          sq=not args.no_sq, alpha=args.alpha,
                          static=args.static)

    qvars = quant_api.quantize_model(model, variables, rules, example)
    if args.static:
        logger.info(f"== calibrating over {args.calib_batches} batches ==")
        qvars = quant_api.collect_stats(model, qvars, rules, iter(test_loader),
                                        num_batches=args.calib_batches,
                                        verbose=True)
        qvars = quant_api.compute_amax(qvars, method=args.amax_method)
        logger.info(f"== amax resolved ({args.amax_method}) ==")

    logger.info("== quantized eval ==")
    q_ret = eval_one_epoch(model, qvars, test_loader, test_set,
                           cfg.CLASS_NAMES, cfg, rules=rules, logger=logger,
                           infer_time=args.infer_time)

    logger.info("== summary ==")
    for k in sorted(set(fp_ret) | set(q_ret)):
        fv, qv = fp_ret.get(k), q_ret.get(k)
        logger.info(f"{k}: fp={fv} quant={qv}")
    return fp_ret, q_ret


if __name__ == "__main__":
    run()
