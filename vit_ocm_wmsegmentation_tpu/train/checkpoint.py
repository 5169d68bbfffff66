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


def vit_params_from_torch(state_dict: dict, cfg: ViTConfig, checkpoint_key: str = "teacher",
                          fresh_params=None):
    """Map a (cleaned) torch ViT state_dict onto our stacked-block pytree.

    Layout changes performed (see models/vit.py docstring):
    * patch_embed conv weight (D, 3, p, p) -> matmul kernel (p*p*3, D) with
      (ph, pw, c) patch ordering;
    * linear weights (out, in) -> (in, out);
    * per-block tensors stacked along a leading depth axis.
    Extra keys (head.*, mask_token when absent from cfg) are ignored, like
    the reference's strict=False loads.

    ``fresh_params``: torch.load_state_dict(strict=False) semantics for
    MISSING keys too — blocks absent from the checkpoint keep this freshly
    initialized tree's values. The reference's own trained-eval flow relies
    on this: MIM pretrains a depth-4 encoder (model.py:91-109) and eval.py
    loads it into the depth-12 vit_small with strict=False (eval.py:76),
    leaving blocks 4-11 at their random init. Without fresh_params a
    missing key raises, like strict=True.
    """
    sd = clean_torch_state_dict(state_dict, checkpoint_key)
    d, L = cfg.embed_dim, cfg.depth

    def top(key, fresh_path, convert=None):
        # strict=False covers the NON-block keys too: a checkpoint missing
        # e.g. pos_embed or the final norm keeps the fresh tree's value,
        # exactly like torch load_state_dict(strict=False)
        if key in sd:
            a = _np(sd[key])
            return jnp.asarray(convert(a) if convert else a)
        if fresh_params is not None:
            node = fresh_params
            for p in fresh_path:
                node = node[p]
            return jnp.asarray(np.asarray(node))
        raise KeyError(key)

    params = {
        "patch_embed": {
            # (D, C, p, p) conv weight -> (p*p*3, D) matmul kernel
            "kernel": top("patch_embed.proj.weight", ("patch_embed", "kernel"),
                          lambda pe: pe.transpose(2, 3, 1, 0).reshape(-1, d)),
            "bias": top("patch_embed.proj.bias", ("patch_embed", "bias")),
        },
        "cls_token": top("cls_token", ("cls_token",)),
        "pos_embed": top("pos_embed", ("pos_embed",)),
        "norm": {"scale": top("norm.weight", ("norm", "scale")),
                 "bias": top("norm.bias", ("norm", "bias"))},
    }

    def fresh_leaf(fmt, i, transpose):
        # path into the stacked fresh tree, e.g. blocks.{}.attn.qkv.weight
        # -> fresh["blocks"]["attn"]["wqkv"][i]
        torch_to_ours = {
            "blocks.{}.norm1.weight": ("norm1", "scale"), "blocks.{}.norm1.bias": ("norm1", "bias"),
            "blocks.{}.attn.qkv.weight": ("attn", "wqkv"), "blocks.{}.attn.qkv.bias": ("attn", "bqkv"),
            "blocks.{}.attn.proj.weight": ("attn", "wo"), "blocks.{}.attn.proj.bias": ("attn", "bo"),
            "blocks.{}.norm2.weight": ("norm2", "scale"), "blocks.{}.norm2.bias": ("norm2", "bias"),
            "blocks.{}.mlp.fc1.weight": ("mlp", "w1"), "blocks.{}.mlp.fc1.bias": ("mlp", "b1"),
            "blocks.{}.mlp.fc2.weight": ("mlp", "w2"), "blocks.{}.mlp.fc2.bias": ("mlp", "b2"),
        }
        g, leaf = torch_to_ours[fmt]
        a = np.asarray(fresh_params["blocks"][g][leaf][i])
        return a.T if transpose else a  # stack() re-transposes below

    def stack(fmt, transpose=False):
        mats = []
        for i in range(L):
            key = fmt.format(i)
            if key in sd:
                mats.append(_np(sd[key]))
            elif fresh_params is not None:
                mats.append(fresh_leaf(fmt, i, transpose))
            else:
                raise KeyError(key)
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


def vit_params_to_torch(params, cfg: ViTConfig) -> dict:
    """Inverse of :func:`vit_params_from_torch`: our pytree -> a timm-named
    numpy state_dict (loadable by torch ViTs / the reference code), so
    models trained here can flow back to the PyTorch ecosystem."""
    d, L, p = cfg.embed_dim, cfg.depth, cfg.patch_size

    def n(a):
        return np.asarray(a, dtype=np.float32)

    pe = n(params["patch_embed"]["kernel"]).reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    sd = {
        "patch_embed.proj.weight": pe,
        "patch_embed.proj.bias": n(params["patch_embed"]["bias"]),
        "cls_token": n(params["cls_token"]),
        "pos_embed": n(params["pos_embed"]),
        "norm.weight": n(params["norm"]["scale"]),
        "norm.bias": n(params["norm"]["bias"]),
    }
    if "mask_token" in params:
        sd["mask_token"] = n(params["mask_token"])
    b = params["blocks"]
    for i in range(L):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = n(b["norm1"]["scale"][i])
        sd[pre + "norm1.bias"] = n(b["norm1"]["bias"][i])
        sd[pre + "attn.qkv.weight"] = n(b["attn"]["wqkv"][i]).T
        if "bqkv" in b["attn"]:
            sd[pre + "attn.qkv.bias"] = n(b["attn"]["bqkv"][i])
        sd[pre + "attn.proj.weight"] = n(b["attn"]["wo"][i]).T
        sd[pre + "attn.proj.bias"] = n(b["attn"]["bo"][i])
        sd[pre + "norm2.weight"] = n(b["norm2"]["scale"][i])
        sd[pre + "norm2.bias"] = n(b["norm2"]["bias"][i])
        sd[pre + "mlp.fc1.weight"] = n(b["mlp"]["w1"][i]).T
        sd[pre + "mlp.fc1.bias"] = n(b["mlp"]["b1"][i])
        sd[pre + "mlp.fc2.weight"] = n(b["mlp"]["w2"][i]).T
        sd[pre + "mlp.fc2.bias"] = n(b["mlp"]["b2"][i])
    return sd


def load_torch_checkpoint(path: str, cfg: ViTConfig, checkpoint_key: str = "teacher",
                          fresh_params=None):
    """Load a .pth file (torch CPU) and convert. Raises if torch is missing."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=False)
    return vit_params_from_torch(state_dict, cfg, checkpoint_key, fresh_params=fresh_params)


def load_mim_or_vit_checkpoint(path: str, cfg: ViTConfig, fresh_params,
                               checkpoint_key: str = "teacher"):
    """MIM-resume semantics for .pth files: a full MIM checkpoint
    (encoder.* + decoder.0.*) replaces the tree; a bare ViT checkpoint
    (e.g. DINO) initializes the encoder while keeping ``fresh_params``'s
    mask_token/decoder — replacing the whole tree would drop them and crash
    the first step."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    try:
        return mim_params_from_torch(sd, cfg, checkpoint_key)
    except KeyError:
        return {**fresh_params, **vit_params_from_torch(sd, cfg, checkpoint_key)}


def load_pretrained(cfg: ViTConfig, arch: str, pretrained_weights: str = "",
                    checkpoint_key: str = "teacher", rng_seed: int = 0):
    """The full reference weight-resolution order (eval.py:67-94): local file
    -> DINO reference URL -> random init. Returns (params, source_str)."""
    from ..models import vit as vit_mod

    if pretrained_weights and os.path.isfile(pretrained_weights):
        # fresh_params backs the reference's strict=False partial load: a
        # depth-4 MIM encoder checkpoint fills blocks 0-3 of the depth-12
        # eval model, the rest keep their random init (eval.py:76)
        fresh = vit_mod.init(cfg, jax.random.PRNGKey(rng_seed))
        return (load_torch_checkpoint(pretrained_weights, cfg, checkpoint_key,
                                      fresh_params=fresh), pretrained_weights)
    url = DINO_URLS.get((arch, cfg.patch_size))
    if url is not None:
        try:
            import torch

            state_dict = torch.hub.load_state_dict_from_url(url=url, map_location="cpu")
            return vit_params_from_torch(state_dict, cfg, checkpoint_key), url
        except Exception:
            pass  # offline: fall through to random weights, like the reference's message path
    return vit_mod.init(cfg, jax.random.PRNGKey(rng_seed)), "random"


def _conv_from_torch(sd, prefix):
    """torch Conv2d (out,in,kh,kw) -> HWIO kernel dict."""
    w = _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": jnp.asarray(w)}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return out


def _conv_transpose_from_torch(sd, prefix):
    """torch ConvTranspose2d (in,out,kh,kw) -> spatially-flipped HWIO kernel
    for lax.conv_transpose(transpose_kernel=False)."""
    w = _np(sd[prefix + ".weight"])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    return {"kernel": jnp.asarray(w.copy()), "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _bn_from_torch(sd, prefix):
    params = {"scale": jnp.asarray(_np(sd[prefix + ".weight"])), "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}
    state = {
        "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(_np(sd[prefix + ".running_var"])),
        "count": jnp.asarray(int(sd.get(prefix + ".num_batches_tracked", 0)), jnp.int32),
    }
    return params, state


def mim_params_from_torch(state_dict: dict, cfg: ViTConfig, checkpoint_key: str = "teacher"):
    """MIM module (model.py:55-89): encoder.* ViT (+ mask_token) and the 1x1
    conv decoder (decoder.0.*) mapped to our matmul head (p*p*3 outputs)."""
    sd = clean_torch_state_dict(state_dict, checkpoint_key)
    enc = {k[len("encoder.") :]: v for k, v in sd.items() if k.startswith("encoder.")}
    params = vit_params_from_torch(enc, cfg, checkpoint_key=None)
    w = _np(sd["decoder.0.weight"])  # (p*p*3, D, 1, 1)
    params["decoder"] = {
        "kernel": jnp.asarray(w[:, :, 0, 0].T),
        "bias": jnp.asarray(_np(sd["decoder.0.bias"])),
    }
    return params


def probing_params_from_torch(state_dict: dict, cfg: ViTConfig, layer_num: int = 1,
                              checkpoint_key: str = "teacher"):
    """LinearProbing (model.py:142-174): encoder ViT + 1- or 2-layer decoder."""
    sd = clean_torch_state_dict(state_dict, checkpoint_key)
    enc = {k[len("encoder.") :]: v for k, v in sd.items() if k.startswith("encoder.")}
    params = {"encoder": vit_params_from_torch(enc, cfg, checkpoint_key=None)}
    if layer_num == 1:
        w = _np(sd["one_layer_decoder.0.weight"])  # (p*p, D, 1, 1)
        params["decoder"] = {"conv": {"kernel": jnp.asarray(w[:, :, 0, 0].T),
                                      "bias": jnp.asarray(_np(sd["one_layer_decoder.0.bias"]))}}
        params["state"] = {}
    else:
        bn_p, bn_s = _bn_from_torch(sd, "two_layer_decoder.1")
        params["decoder"] = {
            "conv1": _conv_from_torch(sd, "two_layer_decoder.0"),
            "bn": bn_p,
            "conv2": _conv_from_torch(sd, "two_layer_decoder.3"),
        }
        params["state"] = {"bn": bn_s}
    return params


def unet_params_from_torch(state_dict: dict, checkpoint_key: str = "teacher"):
    """build_unet (model.py:280-320) -> (params, state) for models/unet.py."""
    sd = clean_torch_state_dict(state_dict, checkpoint_key)

    def block(prefix):
        p1, s1 = _bn_from_torch(sd, prefix + ".bn1")
        p2, s2 = _bn_from_torch(sd, prefix + ".bn2")
        params = {
            "conv1": _conv_from_torch(sd, prefix + ".conv1"),
            "bn1": p1,
            "conv2": _conv_from_torch(sd, prefix + ".conv2"),
            "bn2": p2,
        }
        return params, {"bn1": s1, "bn2": s2}

    params, state = {}, {}
    for i in range(4):
        params[f"e{i+1}"], state[f"e{i+1}"] = block(f"e{i+1}.conv")
    params["b"], state["b"] = block("b")
    for i in range(4):
        params[f"up{i+1}"] = _conv_transpose_from_torch(sd, f"d{i+1}.up")
        params[f"d{i+1}"], state[f"d{i+1}"] = block(f"d{i+1}.conv")
    params["out"] = _conv_from_torch(sd, "outputs")
    return params, state


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


def placeholder_like(tree):
    """Template subtree marker for restore_checkpoint_partial: every leaf
    becomes orbax's PLACEHOLDER, meaning 'do not read this from disk'."""
    import orbax.checkpoint as ocp

    return jax.tree.map(lambda _: ocp.PLACEHOLDER, tree)


def restore_checkpoint_partial(path: str, template: Any):
    """Templated restore that skips placeholder_like-marked subtrees with
    ZERO disk IO for them (StandardCheckpointer rejects placeholders, the
    PyTree handler honors them). Auto-resume uses it to re-read only the
    optimizer state: the templateless peek already materialized the params
    once, and re-reading them doubled resume IO (r3 review finding)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path),
                             args=ocp.args.PyTreeRestore(item=template))


def restore_checkpoint_raw(path: str):
    """Templateless restore: the saved pytree with dict/list containers and
    host numpy arrays. Used to PEEK at a checkpoint whose payload layout
    varies (pp_stages / opt_state presence) before choosing the exact
    template — optax NamedTuple states still need the templated restore.

    Leaves restore as np.ndarray explicitly: a templateless jax.Array
    restore replays the sharding recorded at save time, so a checkpoint
    written on the TPU would refuse to open in a CPU-only process
    ("Device TPU v5 lite0 was not found") — e.g. the offline analysis
    tools during a relay outage. Host arrays are backend-agnostic and
    match what every caller does with the result (inspect / device_put)."""
    import orbax.checkpoint as ocp

    apath = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(apath).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            meta.tree if hasattr(meta, "tree") else meta)
        return ckptr.restore(apath, restore_args=restore_args)


def latest_checkpoint(output_dir: str):
    """Auto-resume helper: newest ckpt_epoch_* dir or None (TRAIN.AUTO_RESUME)."""
    if not os.path.isdir(output_dir):
        return None
    cands = [d for d in os.listdir(output_dir) if d.startswith("ckpt_epoch_")]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.rsplit("_", 1)[-1]))
    return os.path.join(output_dir, cands[-1])
