"""Optimizer + LR-schedule builders (optax).

Parity with reference ``tools/train_utils/optimization/`` (``build_optimizer
:11``: adam / sgd / adam_onecycle via vendored fastai wrappers;
``build_scheduler:40``: OneCycle, CosineAnnealing/CosineWarmup, LambdaLR
decay-steps).  Re-expressed as optax gradient transformations + schedules —
the fastai layer-group machinery collapses to a single schedule because optax
applies weight decay and momentum functionally.
"""

import numpy as np
import optax


def build_schedule(optim_cfg, total_steps):
    lr = float(optim_cfg.LR)
    opt = optim_cfg.OPTIMIZER
    if opt == "adam_onecycle":
        # fastai OneCycle: cos ramp lr/div_factor -> lr over PCT_START, then
        # cos decay to ~0 (optax's onecycle matches this envelope)
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=lr,
            pct_start=float(optim_cfg.get("PCT_START", 0.4)),
            div_factor=float(optim_cfg.get("DIV_FACTOR", 10)),
            final_div_factor=1e4)
    sched_name = optim_cfg.get("SCHEDULER", None)
    if sched_name == "CosineAnnealing" or opt == "sgd_cosine":
        warmup = int(total_steps * 0.02)
        return optax.warmup_cosine_decay_schedule(
            init_value=lr * 0.1, peak_value=lr, warmup_steps=max(warmup, 1),
            decay_steps=total_steps, end_value=lr * 1e-3)
    # LambdaLR step decay (reference default branch)
    decay_steps = [int(x) for x in optim_cfg.get("DECAY_STEP_LIST", [])]
    decay = float(optim_cfg.get("LR_DECAY", 0.1))
    lr_clip = float(optim_cfg.get("LR_CLIP", 1e-7))
    if not decay_steps:
        return lr

    def sched(step):
        import jax.numpy as jnp
        factor = jnp.ones((), jnp.float32)
        for s in decay_steps:
            factor = factor * jnp.where(step >= s, decay, 1.0)
        return jnp.maximum(lr * factor, lr_clip)
    return sched


def build_optimizer(optim_cfg, total_steps):
    """Returns an optax GradientTransformation implementing the cfg."""
    opt = optim_cfg.OPTIMIZER
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    schedule = build_schedule(optim_cfg, total_steps)
    if opt in ("adam", "adam_onecycle"):
        tx = optax.adamw(schedule, b1=0.9, b2=0.99, weight_decay=wd)
    elif opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule, momentum=float(optim_cfg.get("MOMENTUM", 0.9))))
    else:
        raise NotImplementedError(opt)
    clip = float(optim_cfg.get("GRAD_NORM_CLIP", 0) or 0)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule
