"""Per-iteration LR schedules (rebuild of lr_scheduler.py:18-152).

All schedules are pure functions of the global update step, matching the
reference's ``t_in_epochs=False`` timm schedulers:

* cosine — timm CosineLRScheduler(t_initial, lr_min, warmup_lr_init,
  warmup_t, cycle_limit=1): linear warmup to base_lr, then cosine from
  base_lr to lr_min over the *full* t_initial horizon measured from the end
  of warmup with warmup_prefix=False semantics (t counts from warmup_t).
* linear — base -> base*lr_min_rate over the post-warmup span (:96-103).
* step — base * decay_rate^(t // decay_t).
* multistep — base * gamma^(#milestones <= t) (:135-140).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(base_lr, min_lr, warmup_lr, warmup_steps, total_steps):
    """timm CosineLRScheduler semantics (warmup_prefix=False): after warmup,
    lr = min + 0.5*(base-min)*(1+cos(pi * t / t_initial)) with t the raw
    update index (including warmup)."""

    def fn(t):
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_steps, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t / total_steps))
        return jnp.where(t < warmup_steps, warm, cos)

    return fn


def linear_lr(base_lr, warmup_lr, warmup_steps, total_steps, lr_min_rate=0.01):
    def fn(t):
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_steps, 1)
        span = max(total_steps - warmup_steps, 1)
        lin = base_lr - (base_lr - base_lr * lr_min_rate) * ((t - warmup_steps) / span)
        return jnp.where(t < warmup_steps, warm, lin)

    return fn


def step_lr(base_lr, warmup_lr, warmup_steps, decay_steps, decay_rate):
    def fn(t):
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_steps, 1)
        steps = jnp.floor_divide(jnp.maximum(t - warmup_steps, 0), decay_steps)
        return jnp.where(t < warmup_steps, warm, base_lr * decay_rate**steps)

    return fn


def multistep_lr(base_lr, warmup_lr, warmup_steps, milestones, gamma):
    milestones = jnp.asarray(sorted(milestones))

    def fn(t):
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_steps, 1)
        n_passed = jnp.searchsorted(milestones, t, side="right")
        return jnp.where(t < warmup_steps, warm, base_lr * gamma**n_passed)

    return fn


def build_schedule(cfg, n_iter_per_epoch: int):
    """build_scheduler (lr_scheduler.py:18-63) from a config tree."""
    num_steps = int(cfg.TRAIN.EPOCHS * n_iter_per_epoch)
    warmup_steps = int(cfg.TRAIN.WARMUP_EPOCHS * n_iter_per_epoch)
    decay_steps = int(cfg.TRAIN.LR_SCHEDULER.DECAY_EPOCHS * n_iter_per_epoch)
    name = cfg.TRAIN.LR_SCHEDULER.NAME
    if name == "cosine":
        return cosine_lr(cfg.TRAIN.BASE_LR, cfg.TRAIN.MIN_LR, cfg.TRAIN.WARMUP_LR, warmup_steps, num_steps)
    if name == "linear":
        return linear_lr(cfg.TRAIN.BASE_LR, cfg.TRAIN.WARMUP_LR, warmup_steps, num_steps)
    if name == "step":
        return step_lr(cfg.TRAIN.BASE_LR, cfg.TRAIN.WARMUP_LR, warmup_steps, decay_steps,
                       cfg.TRAIN.LR_SCHEDULER.DECAY_RATE)
    if name == "multistep":
        milestones = [i * n_iter_per_epoch for i in cfg.TRAIN.LR_SCHEDULER.MULTISTEPS]
        return multistep_lr(cfg.TRAIN.BASE_LR, cfg.TRAIN.WARMUP_LR, warmup_steps, milestones,
                            cfg.TRAIN.LR_SCHEDULER.GAMMA)
    raise ValueError(f"unknown scheduler {name!r}")
