"""Resize ops vs cv2 / torch oracles (the parity-critical conventions)."""

import cv2
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.ops import resize as R


def test_linear_matches_cv2_upsample():
    rng = np.random.default_rng(0)
    x = rng.random((48, 48), dtype=np.float32)
    want = cv2.resize(x, (384, 384), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(R.resize_linear_cv2(jnp.asarray(x), (384, 384)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_matches_cv2_downsample():
    rng = np.random.default_rng(1)
    x = rng.random((384, 384), dtype=np.float32)
    want = cv2.resize(x, (48, 48), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(R.resize_linear_cv2(jnp.asarray(x), (48, 48)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_matches_cv2_default_interp():
    """eval.py:169 calls cv2.resize without an interpolation arg (default
    INTER_LINEAR)."""
    rng = np.random.default_rng(2)
    x = rng.random((96, 96), dtype=np.float32)
    want = cv2.resize(x, (12, 12))
    got = np.asarray(R.resize_linear_cv2(jnp.asarray(x), (12, 12)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bicubic_matches_torch_scale_factor():
    rng = np.random.default_rng(3)
    x = rng.random((1, 4, 28, 28), dtype=np.float32)
    scale = (48 + 0.1) / 28
    want = F.interpolate(torch.from_numpy(x), scale_factor=(scale, scale), mode="bicubic").numpy()
    got = np.asarray(R.resize_bicubic_torch(jnp.asarray(x), (48, 48), (scale, scale)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bicubic_non_square():
    rng = np.random.default_rng(4)
    x = rng.random((2, 10, 14), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x)[None], size=(17, 23), mode="bicubic").numpy()[0]
    got = np.asarray(R.resize_bicubic_torch(jnp.asarray(x), (17, 23)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.random((3, 6, 6), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x)[None], scale_factor=8, mode="nearest").numpy()[0]
    got = np.asarray(R.upsample_nearest(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, want)


def test_smooth_attention_equals_reference_chain():
    """nearest x8 -> cv2 /8 -> cv2 x8 INTER_LINEAR == single bilinear x8
    (eval.py:140-171 smoothing chain)."""
    rng = np.random.default_rng(6)
    grid = rng.random((48, 48), dtype=np.float32)
    up = cv2.resize(grid, (384, 384), interpolation=cv2.INTER_NEAREST)  # == repeat for x8
    down = cv2.resize(up, (48, 48))
    want = cv2.resize(down, (384, 384), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(R.smooth_attention(jnp.asarray(grid), 8, (384, 384)))
    np.testing.assert_allclose(got, want, atol=1e-5)
