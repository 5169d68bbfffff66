"""Image-classification training loop (the Allen-brain Swin experiment).

Rebuild of Allen_data_Backbone/train.py's HF-Trainer setup as a jitted JAX
loop: AdamW lr 5e-5, linear warmup over the first 10% of steps then linear
decay (HF TrainingArguments defaults), gradient accumulation 4, per-epoch
accuracy eval, keep-best-by-accuracy. Data-parallel over the mesh 'data'
axis when more than one device is present.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax


def hf_linear_schedule(base_lr, total_steps, warmup_ratio=0.1):
    """HF get_linear_schedule_with_warmup."""
    warmup = int(total_steps * warmup_ratio)

    def fn(t):
        warm = base_lr * t / max(warmup, 1)
        decay = base_lr * jnp.maximum(total_steps - t, 0) / max(total_steps - warmup, 1)
        return jnp.where(t < warmup, warm, decay)

    return fn


def make_classifier_step(apply_fn: Callable, tx, *, amp=False):
    """apply_fn(params, x) -> logits. Cross-entropy with integer labels.

    amp=True applies the repo-wide mixed-precision rule (the same one the
    MIM step uses, train/mim_trainer.py::amp_cast): forward/backward in
    bf16 on the MXU, master params / grads / AdamW state in f32 — the
    cast's VJP upcasts cotangents, and the loss reduction is f32."""
    from .mim_trainer import amp_cast

    def loss_fn(params, x, y):
        if amp:
            params, x = amp_cast(params), x.astype(jnp.bfloat16)
        logits = apply_fn(params, x)
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), y))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, x, y):
        if amp:
            params, x = amp_cast(params), x.astype(jnp.bfloat16)
        logits = apply_fn(params, x)
        return jnp.sum(jnp.argmax(logits, axis=-1) == y), jnp.asarray(y.shape[0])

    return train_step, eval_step


def train_classifier(apply_fn, params, train_batches, eval_batches, *, epochs=3, lr=5e-5,
                     grad_accum=4, steps_per_epoch=None, logger=print, amp=False):
    """train_batches/eval_batches: callables (epoch) -> iterator of (x, y)
    numpy arrays, x (B, H, W, 3) float [0,1], y (B,) int. Returns
    (best_params, history). amp=True: bf16 compute / f32 master precision
    (see make_classifier_step)."""
    n_steps = (steps_per_epoch or 100) * epochs
    schedule = hf_linear_schedule(lr, max(n_steps // max(grad_accum, 1), 1))
    tx = optax.adamw(schedule, weight_decay=0.0)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    opt_state = tx.init(params)
    train_step, eval_step = make_classifier_step(apply_fn, tx, amp=amp)

    best_acc = -1.0
    best_params = jax.tree.map(lambda a: a.copy(), params)  # donation-safe
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        losses = []
        n_seen = 0
        for x, y in train_batches(epoch):
            params, opt_state, loss = train_step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
            losses.append(loss)  # device scalar: converting here would stall
            n_seen += x.shape[0]  # dispatch on a ~30 ms relay sync per batch
        losses = [float(l) for l in losses]  # one sync point per epoch
        correct = total = 0
        for x, y in eval_batches(epoch):
            c, t = eval_step(params, jnp.asarray(x), jnp.asarray(y))
            correct += int(c)
            total += int(t)
        acc = correct / max(total, 1)
        dt = time.time() - t0
        logger(f"epoch {epoch}: train_loss {np.mean(losses):.4f}  eval_accuracy {acc:.4f}  "
               f"({n_seen / max(dt, 1e-9):.2f} samples/s train)")
        history.append({"epoch": epoch, "train_loss": float(np.mean(losses)), "eval_accuracy": acc})
        if acc > best_acc:
            # copy: these buffers are donated by the next epoch's train_step
            # (donate_argnums) and would be deleted arrays on TPU
            best_acc, best_params = acc, jax.tree.map(lambda a: a.copy(), params)
    return best_params, history
