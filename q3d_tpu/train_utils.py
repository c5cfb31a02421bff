"""Training loop: epochs, metering, checkpoint rotation, auto-resume.

Parity with reference ``tools/train_utils/train_utils.py`` (``train_one_epoch
:11`` — per-iter LR step, grad clip, data/forward timing meters, tensorboard
scalars, time-interval latest checkpointing; ``train_model:150`` — epoch loop,
ckpt rotation).  AMP GradScaler has no TPU equivalent (bf16 needs no loss
scaling); DDP wrap is replaced by the mesh-sharded train step
(``q3d_tpu.parallel.make_train_step``).
"""

import time
from pathlib import Path

import jax
import numpy as np

from .parallel import make_train_step, shard_batch, replicate
from .models import load_data_to_device
from .utils.common_utils import AverageMeter
from .utils import checkpoint as ckpt_utils


def _disable_augmentation_hook(dataset, optim_cfg, epoch, total_epochs,
                               logger=None):
    """Late-epoch augmentation disabling (reference
    train_utils.disable_augmentation_hook:257 driven by
    OPTIMIZATION.LOSS_SCALE_FP16-adjacent cfg HOOK.DisableAugmentationHook)."""
    hook_cfg = optim_cfg.get("HOOK", {}).get("DisableAugmentationHook", None) \
        if hasattr(optim_cfg, "get") else None
    if not hook_cfg:
        return
    num_last = int(hook_cfg.get("NUM_LAST_EPOCHS", 5))
    if epoch < total_epochs - num_last:
        return
    augmentor = getattr(dataset, "data_augmentor", None)
    if augmentor is None or not augmentor.data_augmentor_queue:
        return
    from .config import EDict
    cfg = EDict({"DISABLE_AUG_LIST": list(hook_cfg.get(
        "DISABLE_AUG_LIST", ["gt_sampling"])),
        "AUG_CONFIG_LIST": [c for c in (
            augmentor.augmentor_configs.AUG_CONFIG_LIST
            if not isinstance(augmentor.augmentor_configs, list)
            else augmentor.augmentor_configs)]})
    augmentor.disable_augmentation(cfg)
    if logger:
        logger.info(f"epoch {epoch}: disabled augmentations "
                    f"{cfg.DISABLE_AUG_LIST}")


def train_model(model, variables, optim_cfg, train_loader, ckpt_dir,
                total_epochs, mesh=None, logger=None, tb_log=None,
                ckpt_save_interval=1, max_ckpt_save_num=30,
                start_epoch=0, resume=True):
    import optax
    from .optimization import build_optimizer

    steps_per_epoch = len(train_loader)
    tx, schedule = build_optimizer(optim_cfg, steps_per_epoch * total_epochs)
    opt_state = tx.init(variables["params"])
    it = 0

    ckpt_dir = Path(ckpt_dir)
    if resume:
        latest = ckpt_utils.find_latest_checkpoint(ckpt_dir)
        if latest is not None:
            variables, opt_state, start_epoch, it = ckpt_utils.load_checkpoint(
                latest, variables, opt_state)
            if logger:
                logger.info(f"resumed from {latest} at epoch {start_epoch}")

    if mesh is not None:
        variables = replicate(variables, mesh)
        opt_state = replicate(opt_state, mesh)
    step_fn = make_train_step(
        model, tx, mesh=mesh,
        grad_clip=float(optim_cfg.get("GRAD_NORM_CLIP", 10.0)))

    data_meter, batch_meter = AverageMeter(), AverageMeter()
    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        _disable_augmentation_hook(train_loader.dataset, optim_cfg, epoch,
                                   total_epochs, logger)
        end = time.time()
        for raw in train_loader:
            batch = (shard_batch(raw, mesh) if mesh is not None
                     else load_data_to_device(raw))
            batch = {k: v for k, v in batch.items()
                     if not isinstance(v, (list, np.ndarray)) or
                     k in ("voxels", "voxel_coords", "voxel_num_points",
                           "points", "points_mask", "gt_boxes")}
            data_meter.update(time.time() - end)
            variables, opt_state, loss, tb = step_fn(variables, opt_state, batch)
            it += 1
            batch_meter.update(time.time() - end)
            end = time.time()
            if logger and it % 20 == 0:
                lr = float(schedule(it)) if callable(schedule) else schedule
                logger.info(
                    f"epoch {epoch} it {it} loss {float(loss):.4f} "
                    f"lr {lr:.2e} data {data_meter.avg:.3f}s "
                    f"batch {batch_meter.avg:.3f}s")
            if tb_log is not None:
                tb_log.add_scalar("train/loss", float(loss), it)

        if (epoch + 1) % ckpt_save_interval == 0:
            host_vars = jax.device_get(variables)
            ckpt_utils.save_checkpoint(
                ckpt_dir / f"checkpoint_epoch_{epoch + 1}.pkl", host_vars,
                jax.device_get(opt_state), epoch=epoch + 1, it=it,
                max_keep=max_ckpt_save_num)
            if logger:
                logger.info(f"saved checkpoint_epoch_{epoch + 1}")
    return variables, opt_state
