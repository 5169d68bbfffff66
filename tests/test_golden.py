"""Golden regression fixtures (SURVEY.md §4: the reference's committed PNG
artifacts play this role; here deterministic hashes of fixed-seed pipeline
outputs pin behavior across refactors). CPU-only, fp32."""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

CFG = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)


def _fixed_image(size=96):
    rng = np.random.default_rng(12345)
    base = np.full((size, size), 70.0)
    base[20:70, 25:80] = 180.0
    return np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)


def _digest(arr):
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def test_golden_mosaic_mask():
    """The uint8 mask is bit-stable: quantized thresholds absorb fp noise, so
    this digest only changes if pipeline semantics change."""
    params = vit.init(CFG, jax.random.PRNGKey(42))
    img = _fixed_image()
    mask, attn = pl.segment_mosaic(params, CFG, jnp.asarray(img), window=48, stride=16)
    assert _digest(np.asarray(mask)) == "37b8a764d364a280", (
        "mosaic mask changed — if intentional, update the digest"
    )
    # the float attention map is compared loosely (fp reassociation tolerance)
    a = np.asarray(attn)
    np.testing.assert_allclose([a.mean(), a.std()], [120.5852, 49.0292], atol=0.02)


def test_golden_single_image_masks():
    params = vit.init(CFG, jax.random.PRNGKey(42))
    img = _fixed_image(64)
    masks, _ = pl.segment_single(params, CFG, jnp.asarray(img)[None], method="ours")
    assert _digest(np.asarray(masks[0])) == "5183c4b0dc29438b"
