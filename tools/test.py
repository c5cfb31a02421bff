"""Evaluation CLI (reference ``tools/test.py``): single-checkpoint eval.

Usage:
    python tools/test.py --cfg_file cfgs/synthetic_models/centerpoint_tiny.yaml \
        [--ckpt path.pkl|path.pth] [--quant int8|fake|none] [--infer_time]
"""

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--infer_time", action="store_true")
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--quant", choices=["none", "fake", "int8"],
                        default="none")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--eval_all", action="store_true",
                        help="watch --ckpt_dir and evaluate checkpoints as "
                             "they appear (reference repeat_eval_ckpt)")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from q3d_tpu.config import cfg, cfg_from_yaml_file, cfg_from_list
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(Path(args.cfg_file).parts[-3:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    import jax
    import jax.numpy as jnp
    from q3d_tpu.utils import common_utils
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.eval_utils import eval_one_epoch
    from q3d_tpu.quant.api import centerpoint_recipe, int8_deploy_recipe
    from q3d_tpu.utils.checkpoint import (load_pth_file, import_torch_state_dict,
                                          load_checkpoint)

    output_dir = Path(cfg.ROOT_DIR) / "output" / cfg.EXP_GROUP_PATH / cfg.TAG \
        / args.extra_tag / "eval"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")

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

    rules = None
    if args.quant == "fake":
        rules = centerpoint_recipe()
    elif args.quant == "int8":
        rules = int8_deploy_recipe()

    def run_eval(vars_, tag="default"):
        ret = eval_one_epoch(
            model, vars_, test_loader, test_set, cfg.CLASS_NAMES, cfg,
            rules=rules, logger=logger, result_dir=output_dir / tag,
            save_to_file=args.save_to_file, infer_time=args.infer_time,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        logger.info(f"eval result [{tag}]: {ret}")
        return ret

    if not args.eval_all:
        run_eval(variables)
        return

    # checkpoint-watcher mode (reference tools/test.py repeat_eval_ckpt:89):
    # poll ckpt_dir, evaluate each new epoch checkpoint, stop after
    # max_waiting_mins of silence
    import time
    ckpt_dir = Path(args.ckpt_dir or (output_dir.parent / "ckpt"))
    evaluated = set()
    idle_start = time.time()
    while True:
        ckpts = sorted(ckpt_dir.glob("checkpoint_epoch_*.pkl"),
                       key=lambda p: p.stat().st_mtime)
        fresh = [c for c in ckpts if c.name not in evaluated]
        if fresh:
            idle_start = time.time()
            for c in fresh:
                variables, _, epoch, _ = load_checkpoint(str(c), variables)
                run_eval(variables, tag=f"epoch_{epoch}")
                evaluated.add(c.name)
        elif (time.time() - idle_start) / 60 > args.max_waiting_mins:
            logger.info("watcher timeout; exiting")
            break
        else:
            time.sleep(30)


if __name__ == "__main__":
    main()
