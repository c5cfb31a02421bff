"""Training CLI (reference ``tools/train.py``): config-driven train + eval.

Usage:
    python tools/train.py --cfg_file cfgs/synthetic_models/pointpillar_tiny.yaml
"""

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
                        help="override settings: KEY VALUE pairs")
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
    from q3d_tpu.utils import common_utils
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.train_utils import train_model
    from q3d_tpu.utils.checkpoint import load_pth_file, import_torch_state_dict

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path(cfg.ROOT_DIR) / "output" / cfg.EXP_GROUP_PATH / cfg.TAG \
        / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"batch_size={batch_size} epochs={epochs}")

    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=True,
        logger=logger, seed=666 if args.fix_random_seed else None)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=train_set)

    example = load_data_to_device(next(iter(train_loader)))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    if args.ckpt is not None:
        if args.ckpt.endswith(".pth"):
            variables = import_torch_state_dict(load_pth_file(args.ckpt),
                                                variables, logger=logger)
        else:
            from q3d_tpu.utils.checkpoint import load_checkpoint
            variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    tb_log = None
    try:
        from tensorboardX import SummaryWriter
        tb_log = SummaryWriter(str(output_dir / "tensorboard"))
    except ImportError:
        pass

    train_model(model, variables, cfg.OPTIMIZATION, train_loader, ckpt_dir,
                total_epochs=epochs, logger=logger, tb_log=tb_log,
                ckpt_save_interval=args.ckpt_save_interval,
                max_ckpt_save_num=args.max_ckpt_save_num)
    logger.info("training finished")


if __name__ == "__main__":
    main()
