"""Tiling + blended stitching vs transliterated reference oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.ops import stitch as st

from stitch_oracle import (
    concat_crops_blended_oracle as _concat_crops_blended_oracle,
    concat_crops_overlap_oracle as _concat_crops_overlap_oracle,
    sliding_window_oracle as _sliding_window_oracle,
)


# --- tests ------------------------------------------------------------------

WINDOW, STRIDE, SIZE = 12, 4, 36  # same k=3 geometry as the 384/128/1152 mosaic


def test_tile_starts_match_reference_geometry():
    starts = st.tile_starts(SIZE, WINDOW, STRIDE)
    want = list(range(0, SIZE - 2 * STRIDE, STRIDE))
    assert list(starts) == want
    assert starts[-1] + WINDOW == SIZE
    # the paper's 1152^2 mosaic: 49 tiles
    s1152 = st.tile_starts(1152, 384, 128)
    assert len(s1152) == 7


def test_extract_tiles_row_major():
    rng = np.random.default_rng(0)
    img = rng.random((SIZE, SIZE)).astype(np.float32)
    ys = xs = st.tile_starts(SIZE, WINDOW, STRIDE)
    tiles = np.asarray(st.extract_tiles(jnp.asarray(img), ys, xs, WINDOW))
    oracle = _sliding_window_oracle(img, STRIDE, WINDOW)
    assert tiles.shape[0] == len(oracle)
    for got, want in zip(tiles, oracle):
        np.testing.assert_array_equal(got, want)


def test_stitch_blended_matches_iterative_reference():
    rng = np.random.default_rng(1)
    n = len(st.tile_starts(SIZE, WINDOW, STRIDE))
    crops = [rng.random((WINDOW, WINDOW)).astype(np.float64) * 255 for _ in range(n * n)]
    want = _concat_crops_blended_oracle(crops, STRIDE, WINDOW)
    assert want.shape == (SIZE, SIZE)
    got = np.asarray(st.stitch_blended(jnp.asarray(np.stack(crops), jnp.float32), WINDOW, STRIDE, (SIZE, SIZE)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_blend_profiles_partition_of_unity():
    prof = st.blend_profiles_1d(7, WINDOW, STRIDE)
    total = np.zeros(WINDOW + 6 * STRIDE)
    for j in range(7):
        total[j * STRIDE : j * STRIDE + WINDOW] += prof[j]
    np.testing.assert_allclose(total, 1.0, atol=1e-12)


def test_stitch_constant_image_reconstructs():
    """Stitching overlapping crops of one image reconstructs the image
    (weights sum to 1) — the basis for thresholding the original mosaic."""
    rng = np.random.default_rng(2)
    img = rng.random((SIZE, SIZE)).astype(np.float32)
    ys = xs = st.tile_starts(SIZE, WINDOW, STRIDE)
    tiles = st.extract_tiles(jnp.asarray(img), ys, xs, WINDOW)
    out = np.asarray(st.stitch_blended(tiles, WINDOW, STRIDE, (SIZE, SIZE)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_concat_crops_matches_reference():
    rng = np.random.default_rng(3)
    crops = rng.random((4, 8, 8)).astype(np.float32)
    got = np.asarray(st.concat_crops(jnp.asarray(crops)))
    want = np.block([[crops[0], crops[1]], [crops[2], crops[3]]])
    np.testing.assert_array_equal(got, want)


def test_concat_crops_overlap_matches_reference():
    rng = np.random.default_rng(4)
    crops = [rng.integers(0, 255, (16, 16)).astype(np.float64) for _ in range(9)]
    want = _concat_crops_overlap_oracle(crops, stride=2)
    got = np.asarray(st.concat_crops_overlap(jnp.asarray(np.stack(crops), jnp.float32), stride=2))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("window,stride", [(16, 8), (20, 5), (12, 6)])
def test_stitch_blended_other_geometries(window, stride):
    """window = k*stride for k=2..4, not just the paper's k=3."""
    k = window // stride
    n = 4
    size = window + (n - 1) * stride
    rng = np.random.default_rng(window * 100 + stride)
    crops = [rng.random((window, window)).astype(np.float64) for _ in range(n * n)]
    want = _concat_crops_blended_oracle(crops, stride, window)
    got = np.asarray(st.stitch_blended(jnp.asarray(np.stack(crops), jnp.float32), window, stride, (size, size)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_restitch_u8_matches_uint8_reference_recurrence():
    """restitch_u8 == the reference's concat_crops applied to the image's
    own uint8 tiles, including every per-blend float64->uint8 truncation
    (sw_processing.py:113-149 with uint8 crops) — the exact image the
    reference thresholds (sw_processing.py:224-229, 259-262)."""
    from stitch_oracle import concat_crops_u8_oracle

    rng = np.random.default_rng(5)
    for size in (SIZE, WINDOW + 5 * STRIDE):
        img = rng.integers(0, 256, (size, size), dtype=np.uint8)
        ys = st.tile_starts(size, WINDOW, STRIDE)
        crops = [img[y : y + WINDOW, x : x + WINDOW] for y in ys for x in ys]
        want = concat_crops_u8_oracle(crops, STRIDE, WINDOW)
        got = np.asarray(st.restitch_u8(jnp.asarray(img), WINDOW, STRIDE))
        assert got.dtype == np.uint8 and got.shape == (size, size)
        np.testing.assert_array_equal(got, want)
        # and it really differs from the identity somewhere (the ±1 delta
        # this mode exists to reproduce), at least at the larger size
        if size > SIZE:
            assert np.any(got != img)
