"""nn core primitives vs torch (pixel-shuffle, convs, batch norm, pooling)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import nn


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 5, 4 * 9)).astype(np.float32)  # NHWC, C=4, r=3
    want = F.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3).numpy()
    got = np.asarray(nn.pixel_shuffle(jnp.asarray(x), 3)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patchify_matches_conv_patch_embed():
    """patchify + matmul == torch Conv2d(k=p, s=p) with the converter layout."""
    rng = np.random.default_rng(1)
    p, d = 4, 6
    x = rng.random((2, 8, 12, 3)).astype(np.float32)
    w = rng.random((d, 3, p, p)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), stride=p)
    want = want.flatten(2).transpose(1, 2).numpy()  # (B, nP, D)
    kernel = jnp.asarray(w.transpose(2, 3, 1, 0).reshape(-1, d))
    got = np.asarray(jnp.dot(nn.patchify(jnp.asarray(x), p), kernel))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_same_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.random((1, 9, 9, 4)).astype(np.float32)
    w = rng.random((5, 4, 3, 3)).astype(np.float32)
    b = rng.random(5).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    got = np.asarray(nn.conv2d(params, jnp.asarray(x), padding="SAME")).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_norm_train_and_eval_match_torch():
    rng = np.random.default_rng(3)
    x = rng.random((4, 6, 6, 3)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.random(3).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.random(3).astype(np.float32)))
    params = {"scale": jnp.asarray(bn.weight.detach().numpy()), "bias": jnp.asarray(bn.bias.detach().numpy())}
    state = {"mean": jnp.zeros(3), "var": jnp.ones(3), "count": jnp.zeros((), jnp.int32)}

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    bn.train()
    want_train = bn(tx).detach().numpy()
    got_train, new_state = nn.batch_norm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got_train).transpose(0, 3, 1, 2), want_train, atol=1e-5)
    # running stats after one train step match torch's momentum update
    np.testing.assert_allclose(np.asarray(new_state["mean"]), bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["var"]), bn.running_var.numpy(), atol=1e-5)

    bn.eval()
    want_eval = bn(tx).detach().numpy()
    got_eval, _ = nn.batch_norm(params, new_state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_eval).transpose(0, 3, 1, 2), want_eval, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
    got = np.asarray(nn.max_pool2d(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want)


def test_trunc_normal_bounds():
    vals = np.asarray(nn.trunc_normal(jax.random.PRNGKey(0), (10000,), std=0.02))
    assert abs(vals).max() <= 2.0 + 1e-6  # clipped at [-2, 2] like dino/utils.py:482-520
    assert 0.015 < vals.std() < 0.025


def test_init_scales_match_torch_defaults():
    """kaiming_uniform(a=sqrt(5)) kernel bound is 1/sqrt(fan_in), NOT
    LeCun-uniform's sqrt(3/fan_in); ConvTranspose2d's fan uses
    weight.size(1)*kh*kw = Cout*kh*kw (torch quirk). Compare empirical
    maxima against torch's own layers."""
    import torch

    from vit_ocm_wmsegmentation_tpu import nn as jnn

    key = jax.random.PRNGKey(0)
    k, _ = jnn.torch_linear_init(key, 2048, 512)
    t = torch.nn.Linear(2048, 512)
    assert abs(float(jnp.abs(k).max()) - float(t.weight.abs().max())) < 0.002

    ct = jnn.conv_transpose2d_init(key, 2, 2, 1024, 512)
    tt = torch.nn.ConvTranspose2d(1024, 512, 2, 2)
    # fan = 512*2*2 = 2048 for both kernel and bias
    assert abs(float(jnp.abs(ct["kernel"]).max()) - float(tt.weight.abs().max())) < 0.002
    assert abs(float(jnp.abs(ct["bias"]).max()) - float(tt.bias.abs().max())) < 0.004


def test_conv_transpose_matches_torch_via_converter():
    rng = np.random.default_rng(5)
    x = rng.random((1, 5, 5, 4)).astype(np.float32)
    m = torch.nn.ConvTranspose2d(4, 6, kernel_size=2, stride=2)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    from vit_ocm_wmsegmentation_tpu.train.checkpoint import _conv_transpose_from_torch

    params = _conv_transpose_from_torch({"up.weight": m.weight, "up.bias": m.bias}, "up")
    got = np.asarray(nn.conv_transpose2d(params, jnp.asarray(x), stride=2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)
