"""Sensitivity CLI: per-layer L1 diffs, bit sweeps, alpha sweeps.

TPU equivalent of the reference's ``quant/collect_act_conv3d.py`` and the
sweep drivers inside ``quant/count_time_n_memory.py``.

Usage:
    python tools/quant/sensitivity_analysis.py --cfg_file ../cfgs/... \
        [--mode l1|bits|alpha] [--frames 4]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--mode", choices=["l1", "bits", "alpha"], default="l1")
    parser.add_argument("--frames", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=2)
    args = parser.parse_args()

    import jax
    import numpy as np
    from q3d_tpu.config import cfg, cfg_from_yaml_file
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.quant.api import centerpoint_recipe
    from q3d_tpu.quant import sensitivity
    from q3d_tpu.utils import common_utils
    from q3d_tpu.utils.simple_eval import simple_map

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=False,
        logger=logger)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch)
    if args.ckpt:
        from q3d_tpu.utils.checkpoint import (load_checkpoint, load_pth_file,
                                              import_torch_state_dict)
        if args.ckpt.endswith(".pth"):
            variables = import_torch_state_dict(load_pth_file(args.ckpt),
                                                variables, logger=logger)
        else:
            variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    base_rules = centerpoint_recipe()

    if args.mode == "l1":
        rows = sensitivity.layer_l1_diff(model, variables, batch, base_rules)
        logger.info("worst layers by relative L1 (FP vs quantized):")
        for name, l1, rel in rows:
            logger.info(f"  {name:60s} L1={l1:.5f} rel={rel:.4f}")
        return

    def eval_with_rules(rules):
        from q3d_tpu.parallel import make_eval_step
        step = make_eval_step(model, rules=rules)
        annos = []
        for i, raw in enumerate(loader):
            if i >= args.frames:
                break
            out = step(variables, load_data_to_device(raw))
            host = {k: np.asarray(v) for k, v in out.items()}
            annos += dataset.generate_prediction_dicts(raw, host,
                                                       cfg.CLASS_NAMES)
        _, metrics = dataset.evaluation(annos, cfg.CLASS_NAMES)
        return {"mAP": metrics.get("mAP", metrics)}

    if args.mode == "bits":
        sensitivity.bit_sweep(eval_with_rules, base_rules, logger=logger)
    else:
        sensitivity.alpha_sweep(eval_with_rules, base_rules,
                                alphas=[0.1, 0.3, 0.5, 0.7, 0.9],
                                logger=logger)


if __name__ == "__main__":
    main()
