"""SimMIM / LinearProbing / UNet parity vs torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.models import probing, simmim, unet
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt

from torch_oracle import make_vit_state_dict, interp_pos_embed, _block

CFG = ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2, pretrain_img_size=32)


# ---------------------------------------------------------------------------
# SimMIM
# ---------------------------------------------------------------------------


@torch.no_grad()
def _torch_mim_forward(sd, x_nchw, mask, patch, heads, depth, eps=1e-6):
    """Functional oracle of VisionTransformerForSimMIM + MIM (model.py:25-77)."""
    b = x_nchw.shape[0]
    tok = F.conv2d(x_nchw, sd["encoder.patch_embed.proj.weight"], sd["encoder.patch_embed.proj.bias"], stride=patch)
    tok = tok.flatten(2).transpose(1, 2)
    w = mask.flatten(1).unsqueeze(-1).to(tok.dtype)
    tok = tok * (1 - w) + sd["encoder.mask_token"].expand(b, tok.shape[1], -1) * w
    cls = sd["encoder.cls_token"].expand(b, -1, -1)
    tok = torch.cat([cls, tok], dim=1)
    enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    img = x_nchw.shape[-1]
    tok = tok + interp_pos_embed(enc, tok, img, img, patch)
    dim = tok.shape[-1]
    for i in range(depth):
        tok, _, _ = _block(enc, i, tok, heads, eps)
    tok = F.layer_norm(tok, (dim,), enc["norm.weight"], enc["norm.bias"], eps)
    tok = tok[:, 1:]
    g = img // patch
    z = tok.permute(0, 2, 1).reshape(b, dim, g, g)
    rec = F.conv2d(z, sd["decoder.0.weight"], sd["decoder.0.bias"])
    rec = F.pixel_shuffle(rec, patch)
    pm = mask.repeat_interleave(patch, 1).repeat_interleave(patch, 2).unsqueeze(1).to(tok.dtype)
    l1 = F.l1_loss(x_nchw, rec, reduction="none")
    loss = (l1 * pm).sum() / (pm.sum() + 1e-5) / 3
    return loss, rec, pm


def _mim_state_dict(gen, patch=8, dim=32, depth=3, heads=2, img=32):
    base = make_vit_state_dict(gen, patch, dim, depth, heads, pretrain_img=img)
    sd = {"encoder." + k: v for k, v in base.items()}
    sd["encoder.mask_token"] = torch.randn(1, 1, dim, generator=gen) * 0.05
    sd["decoder.0.weight"] = torch.randn(patch * patch * 3, dim, 1, 1, generator=gen) * 0.05
    sd["decoder.0.bias"] = torch.randn(patch * patch * 3, generator=gen) * 0.05
    return sd


def test_mim_loss_matches_torch():
    gen = torch.Generator().manual_seed(1)
    sd = _mim_state_dict(gen)
    cfg = simmim.mim_vit_config(img_size=32, patch_size=8)
    cfg = ViTConfig(**{**cfg.__dict__, "embed_dim": 32, "depth": 3, "num_heads": 2})
    params = ckpt.mim_params_from_torch(sd, cfg)
    rng = np.random.default_rng(2)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    mask = (rng.random((2, 4, 4)) > 0.5).astype(np.int32)
    loss, rec, pm = simmim.mim_loss(params, cfg, jnp.asarray(x), jnp.asarray(mask))
    tl, trec, tpm = _torch_mim_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(mask), 8, 2, 3
    )
    np.testing.assert_allclose(float(loss), float(tl), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rec).transpose(0, 3, 1, 2), trec.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm)[..., 0], tpm.numpy()[:, 0], atol=0)


def test_mim_pos_table_sized_for_train_img():
    cfg = simmim.mim_vit_config(img_size=96, patch_size=8)
    assert cfg.pos_grid == 12 and cfg.depth == 4 and cfg.num_heads == 3


# ---------------------------------------------------------------------------
# LinearProbing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("layer_num", [1, 2])
def test_probing_matches_torch(layer_num):
    gen = torch.Generator().manual_seed(3)
    base = make_vit_state_dict(gen, 8, 32, 3, 2, pretrain_img=32)
    sd = {"encoder." + k: v for k, v in base.items()}
    p = 8
    if layer_num == 1:
        sd["one_layer_decoder.0.weight"] = torch.randn(p * p, 32, 1, 1, generator=gen) * 0.05
        sd["one_layer_decoder.0.bias"] = torch.randn(p * p, generator=gen) * 0.05
    else:
        hid = p * p * 4
        sd["two_layer_decoder.0.weight"] = torch.randn(hid, 32, 3, 3, generator=gen) * 0.05
        sd["two_layer_decoder.0.bias"] = torch.randn(hid, generator=gen) * 0.05
        sd["two_layer_decoder.1.weight"] = 1 + 0.1 * torch.randn(hid, generator=gen)
        sd["two_layer_decoder.1.bias"] = torch.randn(hid, generator=gen) * 0.05
        sd["two_layer_decoder.1.running_mean"] = torch.randn(hid, generator=gen) * 0.05
        sd["two_layer_decoder.1.running_var"] = 1 + 0.1 * torch.rand(hid, generator=gen)
        sd["two_layer_decoder.3.weight"] = torch.randn(p * p, hid, 3, 3, generator=gen) * 0.05
        sd["two_layer_decoder.3.bias"] = torch.randn(p * p, generator=gen) * 0.05

    params = ckpt.probing_params_from_torch(sd, CFG, layer_num=layer_num)
    rng = np.random.default_rng(4)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    y, _ = probing.apply(params, CFG, jnp.asarray(x), layer_num=layer_num, train=False)

    # torch oracle
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tok = F.conv2d(tx, base["patch_embed.proj.weight"], base["patch_embed.proj.bias"], stride=8)
        tok = tok.flatten(2).transpose(1, 2)
        tok = torch.cat([base["cls_token"].expand(1, -1, -1), tok], dim=1)
        tok = tok + interp_pos_embed(base, tok, 32, 32, 8)
        for i in range(3):
            tok, _, _ = _block(base, i, tok, 2)
        tok = F.layer_norm(tok, (32,), base["norm.weight"], base["norm.bias"], 1e-6)
        z = tok[:, 1:].permute(0, 2, 1).reshape(1, 32, 4, 4)
        if layer_num == 1:
            rec = F.conv2d(z, sd["one_layer_decoder.0.weight"], sd["one_layer_decoder.0.bias"])
        else:
            rec = F.conv2d(z, sd["two_layer_decoder.0.weight"], sd["two_layer_decoder.0.bias"], padding=1)
            rec = F.batch_norm(rec, sd["two_layer_decoder.1.running_mean"], sd["two_layer_decoder.1.running_var"],
                               sd["two_layer_decoder.1.weight"], sd["two_layer_decoder.1.bias"], False)
            rec = F.relu(rec)
            rec = F.conv2d(rec, sd["two_layer_decoder.3.weight"], sd["two_layer_decoder.3.bias"], padding=1)
        want = F.pixel_shuffle(rec, 8).numpy()
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), want, atol=3e-5)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


class _TBlock(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1 = tnn.Conv2d(i, o, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(o)
        self.conv2 = tnn.Conv2d(o, o, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(o)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(x)))


class _TEnc(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv = _TBlock(i, o)
        self.pool = tnn.MaxPool2d(2)

    def forward(self, x):
        s = self.conv(x)
        return s, self.pool(s)


class _TDec(tnn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.up = tnn.ConvTranspose2d(i, o, 2, 2, 0)
        self.conv = _TBlock(o + o, o)

    def forward(self, x, skip):
        x = self.up(x)
        return self.conv(torch.cat([x, skip], dim=1))


class _TUNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.e1, self.e2 = _TEnc(3, 64), _TEnc(64, 128)
        self.e3, self.e4 = _TEnc(128, 256), _TEnc(256, 512)
        self.b = _TBlock(512, 1024)
        self.d1, self.d2 = _TDec(1024, 512), _TDec(512, 256)
        self.d3, self.d4 = _TDec(256, 128), _TDec(128, 64)
        self.outputs = tnn.Conv2d(64, 1, 1)

    def forward(self, x):
        s1, p1 = self.e1(x)
        s2, p2 = self.e2(p1)
        s3, p3 = self.e3(p2)
        s4, p4 = self.e4(p3)
        b = self.b(p4)
        d = self.d1(b, s4)
        d = self.d2(d, s3)
        d = self.d3(d, s2)
        d = self.d4(d, s1)
        return self.outputs(d)


def test_unet_matches_torch_eval_mode():
    torch.manual_seed(5)
    model = _TUNet().eval()
    # randomize BN running stats so eval mode is a real test
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    sd = model.state_dict()
    params, state = ckpt.unet_params_from_torch(sd)
    rng = np.random.default_rng(6)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    y, _ = unet.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), want, atol=3e-4)


def test_unet_train_mode_updates_bn_state():
    params, state = unet.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(7).random((2, 32, 32, 3), dtype=np.float32))
    y, new_state = unet.apply(params, state, x, train=True)
    assert y.shape == (2, 32, 32, 1)
    assert int(new_state["e1"]["bn1"]["count"]) == 1
    assert not np.allclose(np.asarray(new_state["e1"]["bn1"]["mean"]), 0.0)
