"""Checkpointing: orbax-backed native checkpoints + PyTorch DINO converter.

Native checkpoints store {params, opt_state, step, max_accuracy, config} via
orbax (the rebuild of save_checkpoint, utils.py:375-385 — every SAVE_FREQ
epochs, plus best-checkpoint saving in the supervised loops).

The torch converter replicates the loading ritual every reference entry point
repeats (eval.py:67-94, model.py:196-224): take ``checkpoint_key`` (default
"teacher") if present, strip ``module.`` / ``backbone.`` prefixes, fall back
to the inner ``"model"`` dict for trained checkpoints, then map timm-style
parameter names onto our pytree with kernels transposed to (in, out).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import ViTConfig

# DINO reference weight URLs keyed on (arch, patch_size) (model.py:210-221).
# Offline environments must provide a local file instead.
DINO_URLS = {
    ("vit_small", 16): "https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    ("vit_small", 8): "https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth",
    ("vit_base", 16): "https://dl.fbaipublicfiles.com/dino/dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    ("vit_base", 8): "https://dl.fbaipublicfiles.com/dino/dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
}


def clean_torch_state_dict(state_dict: dict, checkpoint_key: str = "teacher") -> dict:
    """The reference's key ritual: checkpoint_key extraction + prefix strip."""
    if checkpoint_key is not None and checkpoint_key in state_dict:
        state_dict = state_dict[checkpoint_key]
    if "model" in state_dict and not any(k.startswith("blocks") for k in state_dict):
        state_dict = state_dict["model"]
    state_dict = {k.replace("module.", ""): v for k, v in state_dict.items()}
    state_dict = {k.replace("backbone.", ""): v for k, v in state_dict.items()}
    return state_dict


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def vit_params_from_torch(state_dict: dict, cfg: ViTConfig, checkpoint_key: str = "teacher"):
    """Map a (cleaned) torch ViT state_dict onto our stacked-block pytree.

    Layout changes performed (see models/vit.py docstring):
    * patch_embed conv weight (D, 3, p, p) -> matmul kernel (p*p*3, D) with
      (ph, pw, c) patch ordering;
    * linear weights (out, in) -> (in, out);
    * per-block tensors stacked along a leading depth axis.
    Extra keys (head.*, mask_token when absent from cfg) are ignored, like
    the reference's strict=False loads.
    """
    sd = clean_torch_state_dict(state_dict, checkpoint_key)
    d, L = cfg.embed_dim, cfg.depth

    pe = _np(sd["patch_embed.proj.weight"])  # (D, C, p, p)
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(pe.transpose(2, 3, 1, 0).reshape(-1, d)),
            "bias": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        },
        "cls_token": jnp.asarray(_np(sd["cls_token"])),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"])),
        "norm": {"scale": jnp.asarray(_np(sd["norm.weight"])), "bias": jnp.asarray(_np(sd["norm.bias"]))},
    }

    def stack(fmt, transpose=False):
        mats = [_np(sd[fmt.format(i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats))

    blocks = {
        "norm1": {"scale": stack("blocks.{}.norm1.weight"), "bias": stack("blocks.{}.norm1.bias")},
        "attn": {
            "wqkv": stack("blocks.{}.attn.qkv.weight", transpose=True),
            "wo": stack("blocks.{}.attn.proj.weight", transpose=True),
            "bo": stack("blocks.{}.attn.proj.bias"),
        },
        "norm2": {"scale": stack("blocks.{}.norm2.weight"), "bias": stack("blocks.{}.norm2.bias")},
        "mlp": {
            "w1": stack("blocks.{}.mlp.fc1.weight", transpose=True),
            "b1": stack("blocks.{}.mlp.fc1.bias"),
            "w2": stack("blocks.{}.mlp.fc2.weight", transpose=True),
            "b2": stack("blocks.{}.mlp.fc2.bias"),
        },
    }
    if cfg.qkv_bias:
        blocks["attn"]["bqkv"] = stack("blocks.{}.attn.qkv.bias")
    params["blocks"] = blocks
    if "mask_token" in sd:
        params["mask_token"] = jnp.asarray(_np(sd["mask_token"]))
    return params


def load_torch_checkpoint(path: str, cfg: ViTConfig, checkpoint_key: str = "teacher"):
    """Load a .pth file (torch CPU) and convert. Raises if torch is missing."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=False)
    return vit_params_from_torch(state_dict, cfg, checkpoint_key)


def load_pretrained(cfg: ViTConfig, arch: str, pretrained_weights: str = "",
                    checkpoint_key: str = "teacher", rng_seed: int = 0):
    """The full reference weight-resolution order (eval.py:67-94): local file
    -> DINO reference URL -> random init. Returns (params, source_str)."""
    from ..models import vit as vit_mod

    if pretrained_weights and os.path.isfile(pretrained_weights):
        return load_torch_checkpoint(pretrained_weights, cfg, checkpoint_key), pretrained_weights
    url = DINO_URLS.get((arch, cfg.patch_size))
    if url is not None:
        try:
            import torch

            state_dict = torch.hub.load_state_dict_from_url(url=url, map_location="cpu")
            return vit_params_from_torch(state_dict, cfg, checkpoint_key), url
        except Exception:
            pass  # offline: fall through to random weights, like the reference's message path
    return vit_mod.init(cfg, jax.random.PRNGKey(rng_seed)), "random"


# ---------------------------------------------------------------------------
# Native orbax checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(output_dir: str, step: int, payload: Any):
    """Write {params, opt_state, ...} to <output_dir>/ckpt_epoch_<step>."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"ckpt_epoch_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, template: Any):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(output_dir: str):
    """Auto-resume helper: newest ckpt_epoch_* dir or None (TRAIN.AUTO_RESUME)."""
    if not os.path.isdir(output_dir):
        return None
    cands = [d for d in os.listdir(output_dir) if d.startswith("ckpt_epoch_")]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.rsplit("_", 1)[-1]))
    return os.path.join(output_dir, cands[-1])
