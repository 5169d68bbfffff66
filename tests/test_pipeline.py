"""Fused pipelines vs a sequential cv2-based oracle of the reference flow."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.ops import stitch as st
from vit_ocm_wmsegmentation_tpu.train.checkpoint import vit_params_from_torch

from torch_oracle import make_vit_state_dict
from stitch_oracle import (
    concat_crops_blended_oracle as _concat_crops_blended_oracle,
    sliding_window_oracle as _sliding_window_oracle,
)

CFG = vit.ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2, pretrain_img_size=32)
WINDOW, STRIDE, SIZE = 48, 16, 144  # k=3 geometry, tiles are 6x6 patch grids


def _params():
    gen = torch.Generator().manual_seed(42)
    sd = make_vit_state_dict(gen, patch=8, dim=32, depth=3, heads=2, pretrain_img=32)
    return vit_params_from_torch(sd, CFG)


def _mosaic(seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(120, 40, (SIZE, SIZE))
    base[40:100, 30:110] += 70
    return np.clip(base, 0, 255).astype(np.uint8)


def _reference_tile_chain(params, tile_u8):
    """The sw_processing per-tile chain (:235-258) with cv2 doing the resizes,
    and our (torch-verified) ViT doing the forward."""
    x = jnp.asarray(tile_u8.astype(np.float32) / 255.0)
    x = jnp.broadcast_to(x[None, :, :, None], (1,) + tile_u8.shape + (3,))
    _, attns, _ = vit.get_intermediate_feat(params, CFG, x, n=1)
    g = tile_u8.shape[0] // CFG.patch_size
    attn = np.asarray(attns[0][0, :, 0, 1:]).reshape(2, g, g)  # compute_attention
    up = np.repeat(np.repeat(attn, 8, axis=1), 8, axis=2)  # nearest x8
    avg = up.mean(axis=0)
    avg = (avg - avg.min()) / (avg.max() - avg.min()) * 255.0
    down = cv2.resize(avg.astype(np.float32), (avg.shape[1] // 8, avg.shape[0] // 8))
    return cv2.resize(down, (tile_u8.shape[1], tile_u8.shape[0]), interpolation=cv2.INTER_LINEAR)


def test_attention_mosaic_matches_sequential_reference():
    params = _params()
    img = _mosaic()
    got = np.asarray(pl.attention_mosaic(params, CFG, jnp.asarray(img), WINDOW, STRIDE))
    tiles = _sliding_window_oracle(img, STRIDE, WINDOW)
    maps = [_reference_tile_chain(params, t) for t in tiles]
    want = _concat_crops_blended_oracle(maps, STRIDE, WINDOW)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_attention_mosaic_chunked_matches_unchunked(monkeypatch):
    """Tile batches above TILE_CHUNK go through a lax.map over fixed chunks
    (the gigapixel memory bound); the chunked graph must be numerically
    identical to the single-batch one. Eager __wrapped__ calls keep the
    monkeypatched chunk size out of the jit cache."""
    params = _params()
    img = jnp.asarray(_mosaic(3))
    want = np.asarray(pl.attention_mosaic.__wrapped__(params, CFG, img, WINDOW, STRIDE))
    monkeypatch.setattr(pl, "TILE_CHUNK", 4)  # 49 tiles -> 13 chunks (+pad)
    got = np.asarray(pl.attention_mosaic.__wrapped__(params, CFG, img, WINDOW, STRIDE))
    # batch-shape-dependent accumulation order costs ~1e-3 on [0,255] maps
    # (same envelope as the sequential-reference oracle test above)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_segment_mosaic_shapes_and_mask_values():
    params = _params()
    img = _mosaic(1)
    mask, attn = pl.segment_mosaic(params, CFG, jnp.asarray(img), WINDOW, STRIDE)
    assert mask.shape == img.shape and attn.shape == img.shape
    vals = np.unique(np.asarray(mask))
    assert set(vals.tolist()) <= {0, 255}


def test_attention_map_single_matches_eval_chain():
    """eval.py crop==1: attention -> head-mean -> /8 down, linear up."""
    params = _params()
    img = _mosaic(2)[:48, :48]
    got = np.asarray(pl.attention_map_single(params, CFG, jnp.asarray(img)[None]))[0]
    x = jnp.asarray(img.astype(np.float32) / 255.0)
    x = jnp.broadcast_to(x[None, :, :, None], (1, 48, 48, 3))
    _, attns, _ = vit.get_intermediate_feat(params, CFG, x, n=1)
    attn = np.asarray(attns[0][0, :, 0, 1:]).reshape(2, 6, 6)
    up = np.repeat(np.repeat(attn, 8, 1), 8, 2).mean(axis=0).astype(np.float32)
    down = cv2.resize(up, (6, 6))
    want = cv2.resize(down, (48, 48), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segment_single_ours_matches_threshold_chain():
    params = _params()
    img = _mosaic(3)[:48, :48]
    masks, attn = pl.segment_single(params, CFG, jnp.asarray(img)[None], method="ours")
    from vit_ocm_wmsegmentation_tpu.ops.threshold import threshold_ours

    want, _, _ = threshold_ours(jnp.asarray(img), jnp.asarray(attn[0]))
    np.testing.assert_array_equal(np.asarray(masks[0]), np.asarray(want))


def test_attention_heads_matches_compute_attention():
    """attention_heads == per-head nearest-x8 maps (compute_attention,
    utils.py:229-235) derived from the materialized last-block attention."""
    params = _params()
    img = _mosaic(4)[:48, :48]
    x = jnp.asarray(img.astype(np.float32) / 255.0)
    x = jnp.broadcast_to(x[None, :, :, None], (1, 48, 48, 3))
    heads = np.asarray(pl.attention_heads(params, CFG, x))[0]
    _, attns, _ = vit.get_intermediate_feat(params, CFG, x, n=1)
    want = np.asarray(attns[0][0, :, 0, 1:]).reshape(CFG.num_heads, 6, 6)
    want = np.repeat(np.repeat(want, 8, 1), 8, 2)
    np.testing.assert_allclose(heads, want, atol=1e-6)


def test_pad_mosaic_odd_sizes():
    """Odd mosaics pad to the window/stride grid and crop back (the
    reference crashes on non-exact sizes)."""
    params = _params()
    img = _mosaic(5)[:130, :117]  # deliberately awkward size
    mask, attn = pl.segment_mosaic(params, CFG, jnp.asarray(img), window=48, stride=16)
    assert mask.shape == (130, 117) and attn.shape == (130, 117)
    assert np.isfinite(np.asarray(attn)).all()


def test_invalid_window_geometry_raises_clearly():
    """Regression: stride > window (e.g. --window_size 64 with the default
    --stride 128) used to surface as a numpy linspace error from inside the
    blend-profile builder; window % stride != 0 as an overlap_add assert.
    Both must raise a ValueError naming the parameters, from every public
    mosaic entry point."""
    import pytest

    params = _params()
    img = jnp.asarray(_mosaic(2))
    for fn in (pl.segment_mosaic, pl.segment_mosaic_streamed, pl.attention_mosaic):
        with pytest.raises(ValueError, match="stride .* window"):
            fn(params, CFG, img, window=48, stride=96)
    with pytest.raises(ValueError, match="multiple of stride"):
        pl.segment_mosaic(params, CFG, img, window=48, stride=20)


def test_segment_mosaic_exact_stitch_matches_reference_chain():
    """exact_stitch=True end-to-end == the reference flow with its uint8
    re-stitched image (sw_processing.py:224-229 -> threshold :44-62):
    restitch oracle + min-max blend + cv2 Otsu, all numpy/cv2."""
    from stitch_oracle import concat_crops_u8_oracle

    params = _params()
    img = _mosaic(3)
    got_mask, _ = pl.segment_mosaic(params, CFG, jnp.asarray(img), WINDOW, STRIDE,
                                    exact_stitch=True)

    tiles = _sliding_window_oracle(img, STRIDE, WINDOW)
    maps = [_reference_tile_chain(params, t) for t in tiles]
    attn = _concat_crops_blended_oracle(maps, STRIDE, WINDOW)
    restitched = concat_crops_u8_oracle(tiles, STRIDE, WINDOW)
    a = (attn - attn.min()) / (attn.max() - attn.min())
    result = (restitched.astype(np.float64) * a / a.max()).astype(np.uint8)
    _, want_mask = cv2.threshold(result, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    diff = (np.asarray(got_mask) != want_mask).mean()
    # knife-edge pixels only: our attention vs the float oracle's differs by
    # ~1e-3 pre-truncation, which can flip isolated uint8 quantizations
    assert diff <= 1e-3, f"mask mismatch fraction {diff}"
    # and the restitched image itself is bit-exact in the fused graph
    padded, (h, w) = pl.pad_mosaic(jnp.asarray(img), WINDOW, STRIDE)
    np.testing.assert_array_equal(
        np.asarray(st.restitch_u8(padded, WINDOW, STRIDE))[:h, :w], restitched)


def test_segment_mosaic_streamed_matches_fused():
    """The banded gigapixel path == the one-shot fused graph (same blend
    profiles, same threshold), for both stitch-threshold modes."""
    params = _params()
    img = _mosaic(7)
    for exact in (False, True):
        want_mask, want_attn = pl.segment_mosaic(
            params, CFG, jnp.asarray(img), WINDOW, STRIDE, exact_stitch=exact)
        got_mask, got_attn = pl.segment_mosaic_streamed(
            params, CFG, img, WINDOW, STRIDE, exact_stitch=exact)
        np.testing.assert_allclose(np.asarray(got_attn), np.asarray(want_attn), atol=2e-3)
        np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))


def test_segment_mosaic_streamed_band_chunk_bit_equal():
    """band_chunk=K (K tile rows per dispatch, in-graph fori_loop) performs
    the same per-band overlap-adds in the same order — mask AND attention
    canvas bit-equal to the per-band loop, including a ragged tail chunk."""
    params = _params()
    img = _mosaic(7)  # 7 bands with WINDOW/STRIDE; chunk 3 -> 3+3+1 tail
    want_mask, want_attn = pl.segment_mosaic_streamed(params, CFG, img,
                                                      WINDOW, STRIDE)
    got_mask, got_attn = pl.segment_mosaic_streamed(params, CFG, img,
                                                    WINDOW, STRIDE,
                                                    band_chunk=3)
    np.testing.assert_array_equal(np.asarray(got_attn), np.asarray(want_attn))
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))


def test_segment_mosaic_streamed_odd_size_pads():
    params = _params()
    rng = np.random.default_rng(9)
    img = (rng.random((100, 70)) * 255).astype(np.uint8)  # pad to 112x80
    mask, attn = pl.segment_mosaic_streamed(params, CFG, img, window=48, stride=16)
    assert mask.shape == (100, 70) and attn.shape == (100, 70)
    assert set(np.unique(np.asarray(mask))) <= {0, 255}


def test_streamed_threshold_matches_full():
    """The gigapixel-bounded streamed threshold (fused normalize + chunked
    hist + mask-only) is bit-equal to threshold_multiplicative's first mask."""
    import numpy as np

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.ops import threshold as th

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (96, 80), np.uint8))
    attn = jnp.asarray(rng.normal(2.0, 1.3, (96, 80)).astype(np.float32))
    want, _, _ = th.threshold_multiplicative(img, attn)
    got = pl._threshold_mult_streamed(img, attn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # constant canvas branch
    const = jnp.full((96, 80), 3.25, jnp.float32)
    want_c, _, _ = th.threshold_multiplicative(img, const)
    got_c = pl._threshold_mult_streamed(img, const)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


def test_histogram_chunked_matches_full():
    import numpy as np

    from vit_ocm_wmsegmentation_tpu.ops import threshold as th

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 256, (513, 77), np.uint8))
    full = np.asarray(th.histogram_u8(img))
    for chunk in (256, 1000, 39501, 1 << 24):
        np.testing.assert_array_equal(
            np.asarray(th.histogram_u8_chunked(img, chunk)), full)


def test_histogram_pallas_interpret_matches_full():
    """Pallas histogram kernel (interpret mode on CPU) == histogram_u8,
    including the 255-padding correction on non-multiple sizes."""
    import numpy as np

    from vit_ocm_wmsegmentation_tpu.ops import threshold as th

    rng = np.random.default_rng(9)
    for shape in ((256, 128), (300, 200), (17, 13)):
        img = jnp.asarray(rng.integers(0, 256, shape, np.uint8))
        full = np.asarray(th.histogram_u8(img))
        got = np.asarray(th.histogram_u8_pallas(img, block_rows=8, interpret=True))
        np.testing.assert_array_equal(got, full)


def test_histogram_pallas_exact_past_f32_accumulation():
    """Gigapixel contract: per-bin counts beyond 2^24 stay exact. An f32
    accumulator sticks at 16777216 (every subsequent += rounds away); the
    int32 accumulator matches histogram_u8's single int->f32 rounding."""
    import numpy as np

    from vit_ocm_wmsegmentation_tpu.ops import threshold as th

    n = (1 << 24) + 67
    img = np.full(n, 7, np.uint8)
    img[-5:] = 9
    got = np.asarray(th.histogram_u8_pallas(jnp.asarray(img),
                                            block_rows=8192, interpret=True))
    expect = np.zeros(256, np.int64)
    expect[7], expect[9] = n - 5, 5
    np.testing.assert_array_equal(got, expect.astype(np.float32))
