"""Minimal functional neural-net core: init helpers and layer apply functions.

Parameters are plain pytrees (nested dicts of jnp arrays); every layer is a
pure function. Layouts are chosen for the TPU MXU: dense kernels are stored
``(in, out)`` so the forward pass is a single row-major matmul, and image
tensors are NHWC.

Numerical conventions mirror the reference stack so weights converted from
PyTorch checkpoints reproduce its outputs (see
/root/reference/Self-supervised_segmentation/dino/vision_transformer.py):
exact (erf) GELU, LayerNorm with configurable eps, truncated-normal init with
std 0.02 clipped to [-2, 2].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std=0.02, mean=0.0, lower=-2.0, upper=2.0, dtype=jnp.float32):
    """Truncated normal init matching dino/utils.py:482-520: values are drawn
    from N(mean, std) truncated to absolute bounds [lower, upper]."""
    a = (lower - mean) / std
    b = (upper - mean) / std
    x = jax.random.truncated_normal(key, a, b, shape, dtype=dtype)
    return x * std + mean


def torch_kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """Kaiming-uniform with a=sqrt(5), the PyTorch nn.Linear/Conv default:
    gain = sqrt(2/(1+5)) = 1/sqrt(3), bound = gain*sqrt(3/fan_in)
    = 1/sqrt(fan_in) — measurably NOT LeCun-uniform's sqrt(3/fan_in)
    (torch Linear(2048, .) kernels span ±0.0221, not ±0.0383)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, in_features, out_features, dtype=jnp.float32):
    """(kernel, bias) with PyTorch nn.Linear default init; kernel is (in, out)."""
    kkey, bkey = jax.random.split(key)
    kernel = torch_kaiming_uniform(kkey, (in_features, out_features), in_features, dtype)
    bound = 1.0 / math.sqrt(in_features)
    bias = jax.random.uniform(bkey, (out_features,), dtype, -bound, bound)
    return kernel, bias


# ---------------------------------------------------------------------------
# Core layers
# ---------------------------------------------------------------------------


def linear(params, x):
    """x @ kernel + bias. kernel: (in, out). Accumulates in float32 (MXU
    native) regardless of the compute dtype, then casts back."""
    y = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(params, x, eps=1e-6):
    """LayerNorm over the last axis (torch semantics: biased variance)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def gelu(x):
    """Exact erf GELU (torch nn.GELU default; jax default is tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Convolutions (NHWC)
# ---------------------------------------------------------------------------


def conv2d(params, x, stride=1, padding="SAME"):
    """2D conv, x: (B,H,W,Cin), kernel: (kh,kw,Cin,Cout)."""
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv2d_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    kkey, bkey = jax.random.split(key)
    fan_in = kh * kw * cin
    kernel = torch_kaiming_uniform(kkey, (kh, kw, cin, cout), fan_in, dtype)
    bound = 1.0 / math.sqrt(fan_in)
    bias = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def conv_transpose2d(params, x, stride=2):
    """Transposed conv (k=stride, used by the UNet decoder, model.py:269).

    kernel: (kh, kw, Cin, Cout) HWIO for lax.conv_transpose. NOTE for
    converters: torch's ConvTranspose2d weight is (Cin, Cout, kh, kw) and
    must be SPATIALLY FLIPPED on both kernel axes before transposing to
    HWIO (checkpoint.py::_conv_transpose_from_torch does this) — following
    the shapes alone loads cleanly and computes garbage.
    """
    y = jax.lax.conv_transpose(
        x,
        params["kernel"],
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv_transpose2d_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    kkey, bkey = jax.random.split(key)
    # torch quirk: ConvTranspose2d's weight is (Cin, Cout, kh, kw) and
    # _calculate_fan_in uses size(1)*kh*kw = Cout*kh*kw — NOT Cin*kh*kw
    # (verified: ConvTranspose2d(1024, 512, 2, 2) bias bound is 1/sqrt(2048))
    fan_in = kh * kw * cout
    kernel = torch_kaiming_uniform(kkey, (kh, kw, cin, cout), fan_in, dtype)
    bound = 1.0 / math.sqrt(fan_in)
    bias = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


# ---------------------------------------------------------------------------
# BatchNorm (explicit running-stats state, torch semantics)
# ---------------------------------------------------------------------------


def batch_norm_init(dim, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype), "count": jnp.zeros((), jnp.int32)}
    return params, state


def batch_norm(params, state, x, *, train, momentum=0.1, eps=1e-5):
    """BatchNorm over all but the channel (last) axis.

    Returns (y, new_state). In train mode uses batch statistics and updates the
    running stats with torch's convention (unbiased var in the running
    estimate, biased in the normalization).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        # batch statistics in f32 regardless of compute dtype (repo
        # convention, like layer_norm): bf16 accumulation over B*H*W
        # elements loses most of the stats' precision
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"].astype(jnp.float32) + momentum * mean,
            "var": (1 - momentum) * state["var"].astype(jnp.float32) + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"].astype(jnp.float32), state["var"].astype(jnp.float32)
        new_state = state
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Shape ops
# ---------------------------------------------------------------------------


def pixel_shuffle(x, upscale):
    """torch nn.PixelShuffle for NHWC input: (B,H,W,C*r*r) -> (B,H*r,W*r,C).

    torch's channel ordering is (C, r, r) in its NCHW channel dim
    (model.py:65); we keep the same ordering so converted weights match.
    """
    b, h, w, crr = x.shape
    r = upscale
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(b, h * r, w * r, c)


def patchify(x, patch):
    """(B,H,W,C) -> (B, H/p * W/p, p*p*C) with (ph, pw, c) ordering inside a
    patch, matching a torch Conv2d(k=p, s=p) patch-embed kernel reshaped as
    transpose(W, (2,3,1,0)).reshape(p*p*C, D)."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, ph, pw, c
    return x.reshape(b, gh * gw, patch * patch * c)


def max_pool2d(x, window=2, stride=2):
    """Max-pool NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
