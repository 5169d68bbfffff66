"""SimMIM-style masked image modeling (rebuild of model.py:11-108).

Encoder: the ViT backbone with a learnable mask token substituted at masked
patch positions (before CLS concat / pos-embed); note the reference builds
the MIM ViT with its positional table sized for the *training* image size
(model.py:99), so no interpolation happens in the MIM forward — our config
does the same via ``pretrain_img_size=img_size``.

Decoder: one 1x1 conv to (patch^2 * 3) channels + PixelShuffle(patch), i.e. a
per-patch linear head — lowered as a single matmul on the token grid.

Loss: masked L1, normalized by mask area and channel count (model.py:71-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from . import vit as vit_mod
from .vit import ViTConfig


def mim_vit_config(img_size: int, patch_size: int = 8) -> ViTConfig:
    """build_model (model.py:91-108): ViT-S geometry at depth 4, heads 3."""
    return ViTConfig(
        patch_size=patch_size,
        embed_dim=384,
        depth=4,
        num_heads=3,
        pretrain_img_size=img_size,
    )


def init(cfg: ViTConfig, key, dtype=jnp.float32):
    """Encoder params + mask token + decoder head."""
    k_vit, k_mask, k_dec = jax.random.split(key, 3)
    params = vit_mod.init(cfg, k_vit, dtype)
    params["mask_token"] = nn.trunc_normal(k_mask, (1, 1, cfg.embed_dim), std=0.02, dtype=dtype)
    kernel, bias = nn.torch_linear_init(k_dec, cfg.embed_dim, cfg.patch_size**2 * 3, dtype)
    params["decoder"] = {"kernel": kernel, "bias": bias}
    return params


def embed_tokens(params, cfg: ViTConfig, x, mask):
    """encode's pre-block section (model.py:25-42): patchify, mask-token
    substitution, CLS concat, pos-embed add. Returns (B, 1+gh*gw, D).

    Factored out so the pipeline-parallel path (parallel/pp.py) can run
    the block stack as a shard_map island between this and tokens_to_grid.
    """
    b = x.shape[0]

    def substitute_masked(tok):
        wmask = mask.reshape(b, -1, 1).astype(tok.dtype)
        return tok * (1.0 - wmask) + params["mask_token"].astype(tok.dtype) * wmask

    return vit_mod.prepare_tokens(params, cfg, x,
                                  patch_hook=substitute_masked)


def tokens_to_grid(params, cfg: ViTConfig, tok, gh: int, gw: int):
    """encode's post-block section (model.py:43-53): final LayerNorm, drop
    CLS, reshape to the (B, gh, gw, D) feature grid."""
    tok = nn.layer_norm(params["norm"], tok, cfg.ln_eps)
    return tok[:, 1:, :].reshape(tok.shape[0], gh, gw, cfg.embed_dim)


def encode(params, cfg: ViTConfig, x, mask, *, remat=False, train=False):
    """VisionTransformerForSimMIM.forward (model.py:25-53).

    x: (B, H, W, 3) float; mask: (B, gh, gw) {0,1} token mask.
    Returns the patch-token feature grid (B, gh, gw, D).
    """
    _, h, w, _ = x.shape
    tok = embed_tokens(params, cfg, x, mask)
    tok = vit_mod._scan_blocks(params, cfg, tok, 0, cfg.depth, impl="auto",
                               remat=remat, train=train)  # flash on TPU (custom VJP), chunked on CPU
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    return tokens_to_grid(params, cfg, tok, gh, gw)


def decode_grid(params, cfg: ViTConfig, z):
    """PixelShuffle decoder: (B, gh, gw, D) feature grid -> (B, H, W, 3)."""
    rec = jnp.dot(z, params["decoder"]["kernel"], preferred_element_type=jnp.float32)
    rec = (rec + params["decoder"]["bias"].astype(jnp.float32)).astype(z.dtype)
    return nn.pixel_shuffle(rec, cfg.patch_size)


def reconstruct(params, cfg: ViTConfig, x, mask, *, remat=False, train=False):
    """Full MIM forward: encoder + PixelShuffle decoder -> (B, H, W, 3)."""
    return decode_grid(params, cfg, encode(params, cfg, x, mask, remat=remat, train=train))


def mim_loss(params, cfg: ViTConfig, x, mask, *, remat=False, train=False):
    """(loss, x_rec, pixel_mask): masked-L1 / mask area / 3 (model.py:71-77).

    remat rematerializes block activations in the backward pass
    (TRAIN.USE_CHECKPOINT, config.py:111) — FLOPs for HBM.
    """
    x_rec = reconstruct(params, cfg, x, mask, remat=remat, train=train)
    loss, pix_mask = masked_l1(x, x_rec, mask, cfg.patch_size)
    return loss, x_rec, pix_mask


def masked_l1(x, x_rec, mask, p: int):
    """model.py:71-77's loss reduction: (loss, pixel_mask)."""
    pix_mask = jnp.repeat(jnp.repeat(mask, p, axis=1), p, axis=2).astype(x.dtype)[..., None]
    l1 = jnp.abs(x - x_rec)
    # reduce in f32 regardless of compute dtype: a bf16 sum over B*H*W*3
    # elements loses mantissa long before the mean is formed (AMP path)
    loss = jnp.sum((l1 * pix_mask).astype(jnp.float32)) / (
        jnp.sum(pix_mask.astype(jnp.float32)) + 1e-5) / 3.0
    return loss, pix_mask
