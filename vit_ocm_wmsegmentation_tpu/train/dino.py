"""DINO self-supervised training components (vendored surface parity).

The reference vendors these in dino/utils.py and dino/vision_transformer.py
even though its entry points don't call them; they are part of the public
capability set (SURVEY.md §2a #1-2), so the rebuild provides TPU-native
equivalents:

* :func:`cosine_scheduler` — per-iteration value array (dino/utils.py:157-168);
* :func:`lars` — the LARS optimizer (dino/utils.py:523-561) as an optax
  GradientTransformation;
* :func:`multi_crop_forward` — MultiCropWrapper (dino/utils.py:564-597):
  group same-resolution crops into batched forwards, concat, head;
* DINOHead (vision_transformer.py:282-316) with weight-normalized last layer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .. import nn


def cosine_scheduler(base_value, final_value, epochs, niter_per_ep, warmup_epochs=0,
                     start_warmup_value=0):
    """Per-iteration schedule array, exactly dino/utils.py:157-168."""
    warmup_iters = warmup_epochs * niter_per_ep
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) if warmup_epochs > 0 else np.array([])
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    sched = final_value + 0.5 * (base_value - final_value) * (1 + np.cos(np.pi * iters / len(iters)))
    out = np.concatenate([warmup, sched])
    assert len(out) == epochs * niter_per_ep
    return out


def lars(learning_rate, momentum=0.9, weight_decay=0.0, eta=0.001, wd_mask=None):
    """LARS (dino/utils.py:523-561): layer-wise adaptive rate scaling.

    Per-parameter: g <- g + wd*p (masked); trust = eta*||p||/||g|| when both
    norms are nonzero; momentum buffer mu <- m*mu + trust*g (LR-FREE, like
    the reference's mu.mul_(m).add_(dp)); update = -lr*mu, so under a
    time-varying lr the whole buffer scales by the CURRENT lr each step —
    old gradients decay with the schedule instead of baking their
    historical lr into mu. 1-d params (biases/norms) skip weight decay and
    adaptation, like the reference's ndim==1 branch.
    """

    def init(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params), "step": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        step = state["step"]
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        def new_mu(g, p, mu):
            adapt = p.ndim != 1
            if adapt and weight_decay:
                g = g + weight_decay * p
            if adapt:
                pn = jnp.linalg.norm(p)
                gn = jnp.linalg.norm(g)
                trust = jnp.where((pn > 0) & (gn > 0), eta * pn / jnp.maximum(gn, 1e-38), 1.0)
                g = g * trust
            return momentum * mu + g

        mus = jax.tree.map(new_mu, grads, params, state["mu"])
        updates = jax.tree.map(lambda m: -lr * m, mus)
        return updates, {"mu": mus, "step": step + 1}

    return optax.GradientTransformation(init, update)


def multi_crop_forward(backbone_fn, head_fn, crops):
    """MultiCropWrapper (dino/utils.py:564-597): crops is a list of
    (B, H_i, W_i, 3) arrays; same-resolution consecutive crops are batched
    into one forward, outputs concatenated, then passed through the head."""
    outputs = []
    i = 0
    while i < len(crops):
        j = i
        while j < len(crops) and crops[j].shape[1:] == crops[i].shape[1:]:
            j += 1
        batch = jnp.concatenate(crops[i:j], axis=0)
        outputs.append(backbone_fn(batch))
        i = j
    out = jnp.concatenate(outputs, axis=0)
    return head_fn(out)


# ---------------------------------------------------------------------------
# DINOHead (vision_transformer.py:282-316)
# ---------------------------------------------------------------------------


def dino_head_init(key, in_dim, out_dim, nlayers=3, hidden_dim=2048, bottleneck_dim=256,
                   dtype=jnp.float32):
    nlayers = max(nlayers, 1)
    keys = jax.random.split(key, nlayers + 1)
    layers = []
    dims = [in_dim] + [hidden_dim] * (nlayers - 1) + [bottleneck_dim]
    for i in range(nlayers):
        w = nn.trunc_normal(keys[i], (dims[i], dims[i + 1]), std=0.02, dtype=dtype)
        layers.append({"kernel": w, "bias": jnp.zeros((dims[i + 1],), dtype)})
    # weight-normalized last layer, g fixed to 1 (norm_last_layer=True)
    v = nn.trunc_normal(keys[-1], (bottleneck_dim, out_dim), std=0.02, dtype=dtype)
    return {"mlp": layers, "last_v": v, "last_g": jnp.ones((out_dim,), dtype)}


def dino_head_apply(params, x):
    h = x
    n = len(params["mlp"])
    for i, layer in enumerate(params["mlp"]):
        h = nn.linear(layer, h)
        if i < n - 1:
            h = nn.gelu(h)
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    v = params["last_v"]
    w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * params["last_g"]
    return jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
