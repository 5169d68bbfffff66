"""Classic 4-level UNet (rebuild of model.py:227-320), NHWC functional form.

Encoder 3->64->128->256->512, bottleneck 1024, ConvTranspose(k=2,s=2) decoder
with skip concatenation, 1-channel logit output. Every conv block is
conv3x3 + BN + ReLU twice; BatchNorm carries explicit running-stats state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn

CHANNELS = (64, 128, 256, 512)
BOTTLENECK = 1024


def _conv_block_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bn1p, bn1s = nn.batch_norm_init(cout, dtype)
    bn2p, bn2s = nn.batch_norm_init(cout, dtype)
    params = {
        "conv1": nn.conv2d_init(k1, 3, 3, cin, cout, dtype),
        "bn1": bn1p,
        "conv2": nn.conv2d_init(k2, 3, 3, cout, cout, dtype),
        "bn2": bn2p,
    }
    return params, {"bn1": bn1s, "bn2": bn2s}


def _conv_block(params, state, x, train):
    x = nn.conv2d(params["conv1"], x, padding="SAME")
    x, s1 = nn.batch_norm(params["bn1"], state["bn1"], x, train=train)
    x = jnp.maximum(x, 0.0)
    x = nn.conv2d(params["conv2"], x, padding="SAME")
    x, s2 = nn.batch_norm(params["bn2"], state["bn2"], x, train=train)
    x = jnp.maximum(x, 0.0)
    return x, {"bn1": s1, "bn2": s2}


def init(key, dtype=jnp.float32, in_channels=3):
    keys = jax.random.split(key, 14)
    params, state = {}, {}
    cin = in_channels
    for i, c in enumerate(CHANNELS):
        params[f"e{i+1}"], state[f"e{i+1}"] = _conv_block_init(keys[i], cin, c, dtype)
        cin = c
    params["b"], state["b"] = _conv_block_init(keys[4], CHANNELS[-1], BOTTLENECK, dtype)
    up_in = BOTTLENECK
    for i, c in enumerate(reversed(CHANNELS)):
        params[f"up{i+1}"] = nn.conv_transpose2d_init(keys[5 + 2 * i], 2, 2, up_in, c, dtype)
        params[f"d{i+1}"], state[f"d{i+1}"] = _conv_block_init(keys[6 + 2 * i], c + c, c, dtype)
        up_in = c
    params["out"] = nn.conv2d_init(keys[13], 1, 1, CHANNELS[0], 1, dtype)
    return params, state


def apply(params, state, x, *, train=False):
    """x (B, H, W, C) -> logits (B, H, W, 1). Returns (y, new_state).

    H and W must be divisible by 16 (4 pooling levels), like the reference.
    """
    new_state = {}
    skips = []
    h = x
    for i in range(4):
        s, new_state[f"e{i+1}"] = _conv_block(params[f"e{i+1}"], state[f"e{i+1}"], h, train)
        skips.append(s)
        h = nn.max_pool2d(s)
    h, new_state["b"] = _conv_block(params["b"], state["b"], h, train)
    for i in range(4):
        h = nn.conv_transpose2d(params[f"up{i+1}"], h, stride=2)
        h = jnp.concatenate([h, skips[3 - i]], axis=-1)
        h, new_state[f"d{i+1}"] = _conv_block(params[f"d{i+1}"], state[f"d{i+1}"], h, train)
    return nn.conv2d(params["out"], h, padding="SAME"), new_state
