"""Optimizer builders (rebuild of optimizer.py:14-78) on optax.

Weight-decay exemption mirrors get_pretrain_param_groups: no decay for 1-d
parameters and biases (the reference's skip_list hooks are empty for the ViT
models). torch AdamW's decoupled decay and eps placement match optax.adamw;
global-norm clipping (mim.py:176, clip 5.0) is chained before the update.
"""

from __future__ import annotations

import jax
import optax


def decay_mask(params):
    """True where weight decay applies: ndim > 1 (weights), False for biases,
    LN/BN scales, and other 1-d tensors (optimizer.py:23-29)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def build_optimizer(cfg, params, schedule):
    """AdamW/SGD with wd groups + clip, lr driven by the per-step schedule."""
    name = cfg.TRAIN.OPTIMIZER.NAME.lower()
    mask = decay_mask(params)
    k = int(cfg.TRAIN.ACCUMULATION_STEPS)
    if k > 1 and callable(schedule):
        # the schedule horizon is in RAW iterations (build_schedule, matching
        # the reference's lr_scheduler.step_update(epoch*num_steps+idx),
        # mim.py:168-171), but under optax.MultiSteps the inner optimizer's
        # count advances once per k raw iterations — evaluate at the raw
        # index of the update tick (idx = t*k + k-1) or the lr would decay
        # k-times too slowly and never reach MIN_LR
        schedule = (lambda s: lambda t: s(t * k + k - 1))(schedule)
    if name == "adamw":
        tx = optax.adamw(
            learning_rate=schedule,
            b1=cfg.TRAIN.OPTIMIZER.BETAS[0],
            b2=cfg.TRAIN.OPTIMIZER.BETAS[1],
            eps=cfg.TRAIN.OPTIMIZER.EPS,
            weight_decay=cfg.TRAIN.WEIGHT_DECAY,
            mask=mask,
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY, mask=mask),
            optax.sgd(learning_rate=schedule, momentum=cfg.TRAIN.OPTIMIZER.MOMENTUM, nesterov=True),
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    clip = cfg.TRAIN.CLIP_GRAD
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    if cfg.TRAIN.ACCUMULATION_STEPS > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.TRAIN.ACCUMULATION_STEPS)
    return tx
