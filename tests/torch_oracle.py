"""Compact functional torch oracle for numerical cross-checks.

A from-scratch torch implementation of the reference ViT *semantics*
(dino/vision_transformer.py) operating directly on a timm-style state_dict.
Used only in tests, as the ground truth our JAX stack must reproduce; the
reference repo itself is not importable here (timm/skimage absent).
"""

import math

import torch
import torch.nn.functional as F


def make_vit_state_dict(gen, patch=8, dim=32, depth=3, heads=2, pretrain_img=32, mlp_ratio=4):
    """Random timm-named state_dict (float32, seeded torch.Generator)."""
    g = pretrain_img // patch

    def r(*shape):
        return torch.randn(*shape, generator=gen) * 0.05

    sd = {
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, g * g + 1, dim),
        "patch_embed.proj.weight": r(dim, 3, patch, patch),
        "patch_embed.proj.bias": r(dim),
        "norm.weight": 1 + 0.1 * r(dim),
        "norm.bias": r(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update(
            {
                p + "norm1.weight": 1 + 0.1 * r(dim),
                p + "norm1.bias": r(dim),
                p + "attn.qkv.weight": r(3 * dim, dim),
                p + "attn.qkv.bias": r(3 * dim),
                p + "attn.proj.weight": r(dim, dim),
                p + "attn.proj.bias": r(dim),
                p + "norm2.weight": 1 + 0.1 * r(dim),
                p + "norm2.bias": r(dim),
                p + "mlp.fc1.weight": r(mlp_ratio * dim, dim),
                p + "mlp.fc1.bias": r(mlp_ratio * dim),
                p + "mlp.fc2.weight": r(dim, mlp_ratio * dim),
                p + "mlp.fc2.bias": r(dim),
            }
        )
    return sd


def interp_pos_embed(sd, x_tokens, h, w, patch):
    npatch = x_tokens.shape[1] - 1
    pos = sd["pos_embed"]
    n = pos.shape[1] - 1
    if npatch == n and w == h:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    dim = pos.shape[-1]
    g = int(math.sqrt(n))
    h0, w0 = h // patch + 0.1, w // patch + 0.1
    patch_pos = F.interpolate(
        patch_pos.reshape(1, g, g, dim).permute(0, 3, 1, 2),
        scale_factor=(h0 / g, w0 / g),
        mode="bicubic",
    )
    patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, -1, dim)
    return torch.cat([cls_pos, patch_pos], dim=1)


def _block(sd, i, x, heads, eps=1e-6):
    p = f"blocks.{i}."
    dim = x.shape[-1]
    h = F.layer_norm(x, (dim,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], eps)
    b, n, c = h.shape
    qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
    qkv = qkv.reshape(b, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
    attn = attn.softmax(dim=-1)
    y = (attn @ v).transpose(1, 2).reshape(b, n, c)
    y = F.linear(y, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
    x = x + y
    h = F.layer_norm(x, (dim,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], eps)
    h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
    return x + h, attn, qkv


@torch.no_grad()
def get_intermediate_feat(sd, x_nchw, depth, heads, patch, n=1, eps=1e-6):
    """Mirror of the reference get_intermediate_feat: last-n (feat, attn, qkv)."""
    b, _, h, w = x_nchw.shape
    tok = F.conv2d(x_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=patch)
    tok = tok.flatten(2).transpose(1, 2)
    cls = sd["cls_token"].expand(b, -1, -1)
    tok = torch.cat([cls, tok], dim=1)
    tok = tok + interp_pos_embed(sd, tok, h, w, patch)
    dim = tok.shape[-1]
    feats, attns, qkvs = [], [], []
    for i in range(depth):
        tok, attn, qkv = _block(sd, i, tok, heads, eps)
        if depth - i <= n:
            feats.append(F.layer_norm(tok, (dim,), sd["norm.weight"], sd["norm.bias"], eps))
            attns.append(attn)
            qkvs.append(qkv)
    return feats, attns, qkvs
