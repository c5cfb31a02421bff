"""QAT fine-tuning driver: continue training under fake-quant rules.

The reference stack is PTQ-only; QAT falls out of our design because every
TensorQuantizer uses a straight-through estimator — training with the same
rule set as deployment closes the PTQ accuracy gap.

Usage:
    python tools/quant/qat_finetune.py --cfg_file ../cfgs/... \
        [--ckpt base.pkl] [--epochs 2] [--recipe centerpoint]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--recipe", default="centerpoint",
                        choices=["centerpoint", "second", "pointpillar",
                                 "voxelnext", "transfusion"])
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--out_dir", default="output/qat")
    args = parser.parse_args()

    import jax
    import optax
    from q3d_tpu.config import cfg, cfg_from_yaml_file
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.optimization import build_optimizer
    from q3d_tpu.parallel import make_train_step
    from q3d_tpu.quant import api as quant_api
    from q3d_tpu.quant.rules import quant_rules_scope
    from q3d_tpu.utils import common_utils
    from q3d_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                          load_pth_file,
                                          import_torch_state_dict)

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or 2

    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=True,
        logger=logger)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=train_set)
    rules = getattr(quant_api, f"{args.recipe}_recipe")(alpha=args.alpha)

    example = load_data_to_device(next(iter(train_loader)))
    with quant_rules_scope(rules):
        variables = jax.jit(
            lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                        example)
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            variables = import_torch_state_dict(load_pth_file(args.ckpt),
                                                variables, logger=logger)
        else:
            variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    tx, sched = build_optimizer(cfg.OPTIMIZATION,
                                len(train_loader) * epochs)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx, rules=rules,
                           grad_clip=float(cfg.OPTIMIZATION.get(
                               "GRAD_NORM_CLIP", 10.0)))

    it = 0
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        for raw in train_loader:
            batch = load_data_to_device(raw)
            batch = {k: v for k, v in batch.items()
                     if k in ("voxels", "voxel_coords", "voxel_num_points",
                              "points", "points_mask", "gt_boxes",
                              "batch_size")}
            variables, opt_state, loss, _ = step(variables, opt_state, batch)
            it += 1
            if it % 10 == 0:
                logger.info(f"QAT epoch {epoch} it {it} loss {float(loss):.4f}")
    out = Path(args.out_dir)
    save_checkpoint(out / f"qat_epoch_{epochs}.pkl",
                    jax.device_get(variables), epoch=epochs, it=it)
    logger.info(f"QAT checkpoint -> {out}")


if __name__ == "__main__":
    main()
