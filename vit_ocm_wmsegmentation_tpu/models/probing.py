"""Dense-prediction probing heads on a frozen/finetuned ViT
(rebuild of model.py:110-224).

The finetune ViT is the full 12-block ViT-S returning the patch feature grid
(B, gh, gw, D); LinearProbing adds a 1-layer (1x1 conv -> PixelShuffle) or
2-layer (3x3 conv + BN + ReLU -> 3x3 conv -> PixelShuffle) decoder producing
a 1-channel logit map at input resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from . import vit as vit_mod
from .vit import ViTConfig


def finetune_vit_config(img_size: int, patch_size: int = 8) -> ViTConfig:
    """build_finetune_model (model.py:176-193): ViT-S/patch, depth 12, heads 6.

    Note: the reference loads DINO checkpoints (224-sized pos table) into a
    model whose table is sized for img_size with strict=False — i.e. the
    DINO pos_embed is silently DROPPED and the random table is kept. We load
    through the converter instead, which interpolates properly; for
    checkpoints trained at img_size the table matches directly.
    """
    return ViTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6,
                     pretrain_img_size=img_size)


def encode(params, cfg: ViTConfig, x, *, train: bool = False):
    """VisionTransformerForFinetune.forward (model.py:121-139): token grid.

    train=True routes the blocks through the training path (unpadded stream,
    folded kernel, MLP remat modes — see models/vit._scan_blocks): the
    gradient pass through the padded inference route measured +14% on every
    dense op at 224² (BENCH.md), so finetuning takes the training route."""
    b, h, w, _ = x.shape
    tok = vit_mod.prepare_tokens(params, cfg, x)
    tok = vit_mod._scan_blocks(params, cfg, tok, 0, cfg.depth, impl="auto",
                               train=train)  # flash kernel on TPU (custom VJP), chunked on CPU
    tok = nn.layer_norm(params["norm"], tok, cfg.ln_eps)
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    return tok[:, 1:, :].reshape(b, gh, gw, cfg.embed_dim)


def init_decoder(key, cfg: ViTConfig, layer_num: int = 1, dtype=jnp.float32):
    """Decoder params (+ BN state for the 2-layer variant)."""
    p = cfg.patch_size
    if layer_num == 1:
        kernel, bias = nn.torch_linear_init(key, cfg.embed_dim, p * p, dtype)
        return {"conv": {"kernel": kernel, "bias": bias}}, {}
    k1, k2 = jax.random.split(key)
    hidden = p * p * 4
    bn_params, bn_state = nn.batch_norm_init(hidden, dtype)
    return (
        {
            "conv1": nn.conv2d_init(k1, 3, 3, cfg.embed_dim, hidden, dtype),
            "bn": bn_params,
            "conv2": nn.conv2d_init(k2, 3, 3, hidden, p * p, dtype),
        },
        {"bn": bn_state},
    )


def decode(dec_params, dec_state, cfg: ViTConfig, z, *, layer_num: int = 1, train: bool = False):
    """Feature grid (B, gh, gw, D) -> logits (B, H, W, 1). Returns (y, state)."""
    p = cfg.patch_size
    if layer_num == 1:
        y = jnp.dot(z, dec_params["conv"]["kernel"], preferred_element_type=jnp.float32)
        y = (y + dec_params["conv"]["bias"].astype(jnp.float32)).astype(z.dtype)
        return nn.pixel_shuffle(y, p), dec_state
    y = nn.conv2d(dec_params["conv1"], z, stride=1, padding="SAME")
    y, bn_state = nn.batch_norm(dec_params["bn"], dec_state["bn"], y, train=train)
    y = jnp.maximum(y, 0.0)
    y = nn.conv2d(dec_params["conv2"], y, stride=1, padding="SAME")
    return nn.pixel_shuffle(y, p), {"bn": bn_state}


def apply(params, cfg: ViTConfig, x, *, layer_num: int = 1, train: bool = False):
    """Full LinearProbing forward. params: {"encoder", "decoder", "state"}.

    Returns (logits (B, H, W, 1), new_state).
    """
    z = encode(params["encoder"], cfg, x, train=train)
    return decode(params["decoder"], params.get("state", {}), cfg, z, layer_num=layer_num, train=train)


def init(cfg: ViTConfig, key, layer_num: int = 1, dtype=jnp.float32):
    k_enc, k_dec = jax.random.split(key)
    enc = vit_mod.init(cfg, k_enc, dtype)
    dec, state = init_decoder(k_dec, cfg, layer_num, dtype)
    return {"encoder": enc, "decoder": dec, "state": state}
