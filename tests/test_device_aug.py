"""Device-side SimMIM augmentation (data/device_aug.py) vs the host path.

Parity with the reference transform (data.py:189-253) is distributional by
design (different PRNGs, subpixel kernel differences vs PIL) — these tests
pin the pieces that must be exact (box sampler bounds/areas, mask counts,
determinism) and bound the crop-resample difference against PIL for fixed
boxes.
"""

import math

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.data import build_simmim_device_loader
from vit_ocm_wmsegmentation_tpu.data.device_aug import (
    crop_resize_bilinear,
    random_mask,
    sample_crop_box,
    simmim_augment,
)


def test_sample_crop_box_bounds_and_distribution():
    h, w = 96, 128
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    boxes = jax.vmap(lambda k: jnp.stack(sample_crop_box(k, h, w)))(keys)
    i, j, ch, cw = (np.asarray(boxes[:, k]) for k in range(4))
    assert (i >= 0).all() and (j >= 0).all()
    assert ((i + ch) <= h).all() and ((j + cw) <= w).all()
    area = ch * cw / (h * w)
    # valid draws have area ~U(0.67, 1) up to rounding; the fallback is the
    # clamped center crop (area 0.75 here since w/h = 4/3 = ratio max)
    assert area.min() > 0.6 and area.max() <= 1.0
    aspect = cw / ch
    assert (aspect > 0.70).all() and (aspect < 1.43).all()
    # boxes actually vary (sampler is live)
    assert len(np.unique(ch)) > 10


@pytest.mark.parametrize("box", [(0, 0, 64, 64), (10, 20, 40, 70), (5, 5, 91, 91)])
def test_crop_resize_matches_pil(box):
    rng = np.random.default_rng(0)
    src = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    i, j, ch, cw = box
    pil = Image.fromarray(src).resize((48, 48), Image.Resampling.BILINEAR,
                                      box=(j, i, j + cw, i + ch))
    want = np.asarray(pil, dtype=np.float32) / 255.0
    got = crop_resize_bilinear(jnp.asarray(src, jnp.float32) / 255.0,
                               *(jnp.asarray(v) for v in (i, j, ch, cw)), 48)
    # same triangle filter family; implementations differ at subpixel level
    assert np.abs(np.asarray(got) - want).mean() < 0.01
    assert np.abs(np.asarray(got) - want).max() < 0.12


def test_random_mask_reference_semantics():
    # 224 / 32 = 7 coarse grid, ceil(49 * 0.6) = 30 masked, x4 to the token grid
    m = np.asarray(random_mask(jax.random.PRNGKey(3), 7, 30, 4))
    assert m.shape == (28, 28)
    assert set(np.unique(m)) <= {0, 1}
    coarse = m[::4, ::4]
    assert coarse.sum() == 30
    assert (m == coarse.repeat(4, 0).repeat(4, 1)).all()


def test_simmim_augment_shapes_determinism_and_flips():
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.random((8, 96, 96, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    kw = dict(out_size=64, mask_patch_size=16, model_patch_size=8, mask_ratio=0.6)
    x, m = simmim_augment(batch, key, **kw)
    assert x.shape == (8, 64, 64, 3) and x.dtype == jnp.float32
    assert m.shape == (8, 8, 8) and m.dtype == jnp.int32
    assert (np.asarray(m).reshape(8, 4, 2, 4, 2).mean((2, 4)) % 1 == 0).all()  # 2x2 blocks
    per_img = np.asarray(m)[:, ::2, ::2].sum((1, 2))
    assert (per_img == math.ceil(16 * 0.6)).all()  # ratio-ceil per image
    x2, m2 = simmim_augment(batch, key, **kw)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    x3, _ = simmim_augment(batch, jax.random.PRNGKey(8), **kw)
    assert np.abs(np.asarray(x) - np.asarray(x3)).max() > 1e-3  # key matters
    assert np.isfinite(np.asarray(x)).all() and np.asarray(x).min() >= -1e-6


def test_device_loader_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    for k in range(5):
        arr = (rng.random((80, 80)) * 255).astype(np.uint8)
        Image.fromarray(arr).convert("RGB").save(tmp_path / f"{k}.png")
    loader = build_simmim_device_loader(str(tmp_path), batch_size=2, img_size=64,
                                        mask_patch_size=16, model_patch_size=8,
                                        mask_ratio=0.6, seed=0)
    assert len(loader) == 2
    b1 = [(np.asarray(x), np.asarray(m)) for x, m in loader.epoch(0)]
    assert len(b1) == 2
    assert b1[0][0].shape == (2, 64, 64, 3) and b1[0][1].shape == (2, 8, 8)
    b1b = [(np.asarray(x), np.asarray(m)) for x, m in loader.epoch(0)]
    np.testing.assert_array_equal(b1[0][0], b1b[0][0])  # deterministic epoch
    b2 = [(np.asarray(x), np.asarray(m)) for x, m in loader.epoch(1)]
    assert np.abs(b1[0][0] - b2[0][0]).max() > 1e-3  # epochs differ
