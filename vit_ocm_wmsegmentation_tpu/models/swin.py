"""Swin Transformer (Tiny) image classifier, pure-function NHWC edition.

Rebuild of the Allen-brain side experiment's backbone: the reference
fine-tunes HuggingFace ``microsoft/swin-tiny-patch4-window7-224``
(Allen_data_Backbone/train.py:79-85). This is a from-scratch JAX
implementation of the Swin architecture — 4 stages of windowed attention
with relative position bias, alternating shifted windows with the masked
attention trick, patch merging between stages — plus a converter from HF
torch checkpoints (so pretrained-vs-scratch parity experiments carry over).

Windows are static shapes: the (num_windows, w*w, w*w) attention batch maps
straight onto the MXU, and the shifted-window mask is precomputed at trace
time with numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import nn


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: int = 4
    ln_eps: float = 1e-5
    num_classes: int = 1000

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2**s)

    def stage_res(self, s: int) -> int:
        return self.img_size // self.patch_size // (2**s)


SWIN_TINY = SwinConfig  # defaults are swin-tiny-patch4-window7-224


# ---------------------------------------------------------------------------
# Window helpers (numpy at trace time; shapes static)
# ---------------------------------------------------------------------------


def relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += w - 1
    rel[..., 1] += w - 1
    rel[..., 0] *= 2 * w - 1
    return rel.sum(-1)


def shifted_window_mask(res, w: int, shift: int) -> np.ndarray:
    """(num_windows, w*w, w*w) additive mask (0 or -100) for shifted windows.
    ``res`` is an int (square) or (h, w) pair."""
    rh, rw = (res, res) if isinstance(res, int) else res
    img_mask = np.zeros((rh, rw))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(rh // w, w, rw // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, w: int):
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    b, h, wid, c = x.shape
    x = x.reshape(b, h // w, w, wid // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x, w: int, h: int, wid: int):
    """(B*nW, w*w, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (wid // w))
    x = x.reshape(b, h // w, wid // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wid, c)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _block_init(key, dim, heads, window, mlp_ratio, dtype):
    keys = jax.random.split(key, 7)
    hidden = dim * mlp_ratio

    def lin(k, i, o):
        kernel, bias = nn.torch_linear_init(k, i, o, dtype)
        return {"kernel": kernel, "bias": bias}

    return {
        "norm1": nn.layer_norm_init(dim, dtype),
        "attn": {
            "q": lin(keys[0], dim, dim),
            "k": lin(keys[1], dim, dim),
            "v": lin(keys[2], dim, dim),
            "proj": lin(keys[3], dim, dim),
            "bias_table": nn.trunc_normal(keys[4], ((2 * window - 1) ** 2, heads), std=0.02, dtype=dtype),
        },
        "norm2": nn.layer_norm_init(dim, dtype),
        # distinct keys: reusing the q/k keys here would correlate the MLP
        # init with the attention projections in every from-scratch block
        "mlp": {"fc1": lin(keys[5], dim, hidden), "fc2": lin(keys[6], hidden, dim)},
    }


def init(cfg: SwinConfig, key, dtype=jnp.float32):
    keys = jax.random.split(key, 4 + len(cfg.depths))
    p = cfg.patch_size
    params = {
        "patch_embed": nn.conv2d_init(keys[0], p, p, cfg.in_chans, cfg.embed_dim, dtype),
        "embed_norm": nn.layer_norm_init(cfg.embed_dim, dtype),
        "stages": [],
        "norm": nn.layer_norm_init(cfg.stage_dim(len(cfg.depths) - 1), dtype),
    }
    kkey, hkey = jax.random.split(keys[1])
    kernel, bias = nn.torch_linear_init(hkey, cfg.stage_dim(len(cfg.depths) - 1), cfg.num_classes, dtype)
    params["head"] = {"kernel": kernel, "bias": bias}
    for s, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(s)
        bkeys = jax.random.split(keys[2 + s], depth + 1)
        stage = {"blocks": [
            _block_init(bkeys[b], dim, cfg.num_heads[s], cfg.window, cfg.mlp_ratio, dtype)
            for b in range(depth)
        ]}
        if s < len(cfg.depths) - 1:
            rk, _ = jax.random.split(bkeys[-1])
            kernel, _ = nn.torch_linear_init(rk, 4 * dim, 2 * dim, dtype)
            stage["downsample"] = {
                "reduction": {"kernel": kernel},  # bias-free, like HF
                "norm": nn.layer_norm_init(4 * dim, dtype),
            }
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _window_attention(ap, x, heads, window, rel_index, mask, eps):
    """x: (nWb, n, C) windows; mask: (nW, n, n) or None."""
    nwb, n, c = x.shape
    hd = c // heads

    def proj(p):
        return nn.linear(p, x).reshape(nwb, n, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = proj(ap["q"]), proj(ap["k"]), proj(ap["v"])
    logits = jnp.einsum("whqd,whkd->whqk", q, k, preferred_element_type=jnp.float32) * (hd**-0.5)
    bias = ap["bias_table"][jnp.asarray(rel_index.reshape(-1))]
    bias = bias.reshape(n, n, heads).transpose(2, 0, 1)
    logits = logits + bias.astype(jnp.float32)[None]
    if mask is not None:
        nw = mask.shape[0]
        logits = logits.reshape(nwb // nw, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
        logits = logits.reshape(nwb, heads, n, n)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("whqk,whkd->whqd", attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return nn.linear(ap["proj"], out)


def _swin_block(bp, x, heads, window, shift, eps):
    """x: (B, H, W, C). Non-window-multiple resolutions are zero-padded on
    the bottom/right before partitioning and cropped after, with the shift
    mask computed on the padded resolution (HF maybe_pad semantics)."""
    b, h, w, c = x.shape
    hp = -(-h // window) * window
    wp = -(-w // window) * window
    rel_index = relative_position_index(window)
    mask = shifted_window_mask((hp, wp), window, shift) if shift > 0 else None

    shortcut = x
    xn = nn.layer_norm(bp["norm1"], x, eps)
    if (hp, wp) != (h, w):
        xn = jnp.pad(xn, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift > 0:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    windows = window_partition(xn, window)
    attn = _window_attention(bp["attn"], windows, heads, window, rel_index, mask, eps)
    xn = window_reverse(attn, window, hp, wp)
    if shift > 0:
        xn = jnp.roll(xn, (shift, shift), axis=(1, 2))
    x = shortcut + xn[:, :h, :w]

    xn = nn.layer_norm(bp["norm2"], x, eps)
    xn = nn.linear(bp["mlp"]["fc1"], xn)
    xn = nn.gelu(xn)
    xn = nn.linear(bp["mlp"]["fc2"], xn)
    return x + xn


def _patch_merge(dp, x, eps):
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C), HF component order
    (x0,x1,x2,x3), odd inputs zero-padded on the bottom/right first."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = nn.layer_norm(dp["norm"], x, eps)
    return nn.linear(dp["reduction"], x)


def forward_features(params, cfg: SwinConfig, x):
    """(B, H, W, 3) -> (B, final_res^2, final_dim) pre-pool tokens."""
    x = nn.conv2d(params["patch_embed"], x, stride=cfg.patch_size, padding="VALID")
    x = nn.layer_norm(params["embed_norm"], x, cfg.ln_eps)
    for s, stage in enumerate(params["stages"]):
        res = x.shape[1]
        window = min(cfg.window, res)
        for bidx, bp in enumerate(stage["blocks"]):
            shift = 0 if (bidx % 2 == 0 or window >= res) else window // 2
            x = _swin_block(bp, x, cfg.num_heads[s], window, shift, cfg.ln_eps)
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, cfg.ln_eps)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def apply(params, cfg: SwinConfig, x):
    """Classification logits (B, num_classes): LN -> mean pool -> head."""
    tokens = forward_features(params, cfg, x)
    tokens = nn.layer_norm(params["norm"], tokens, cfg.ln_eps)
    pooled = jnp.mean(tokens, axis=1)
    return nn.linear(params["head"], pooled)


# ---------------------------------------------------------------------------
# HuggingFace checkpoint converter (microsoft/swin-* torch weights)
# ---------------------------------------------------------------------------


def params_from_hf(state_dict, cfg: SwinConfig):
    """Map a transformers SwinForImageClassification state_dict onto our
    pytree (kernels transposed to (in, out), conv to HWIO)."""

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)

    def lin(prefix, bias=True):
        out = {"kernel": jnp.asarray(np_(state_dict[prefix + ".weight"]).T)}
        if bias and prefix + ".bias" in state_dict:
            out["bias"] = jnp.asarray(np_(state_dict[prefix + ".bias"]))
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(np_(state_dict[prefix + ".weight"])),
                "bias": jnp.asarray(np_(state_dict[prefix + ".bias"]))}

    pe = np_(state_dict["swin.embeddings.patch_embeddings.projection.weight"])
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(pe.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np_(state_dict["swin.embeddings.patch_embeddings.projection.bias"])),
        },
        "embed_norm": ln("swin.embeddings.norm"),
        "norm": ln("swin.layernorm"),
        "head": lin("classifier"),
        "stages": [],
    }
    for s, depth in enumerate(cfg.depths):
        stage = {"blocks": []}
        for b in range(depth):
            p = f"swin.encoder.layers.{s}.blocks.{b}."
            stage["blocks"].append(
                {
                    "norm1": ln(p + "layernorm_before"),
                    "attn": {
                        "q": lin(p + "attention.self.query"),
                        "k": lin(p + "attention.self.key"),
                        "v": lin(p + "attention.self.value"),
                        "proj": lin(p + "attention.output.dense"),
                        "bias_table": jnp.asarray(np_(state_dict[p + "attention.self.relative_position_bias_table"])),
                    },
                    "norm2": ln(p + "layernorm_after"),
                    "mlp": {"fc1": lin(p + "intermediate.dense"), "fc2": lin(p + "output.dense")},
                }
            )
        if s < len(cfg.depths) - 1:
            stage["downsample"] = {
                "reduction": lin(f"swin.encoder.layers.{s}.downsample.reduction", bias=False),
                "norm": ln(f"swin.encoder.layers.{s}.downsample.norm"),
            }
        params["stages"].append(stage)
    return params
