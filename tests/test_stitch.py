"""Tiling + blended stitching vs transliterated reference oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.ops import stitch as st


# --- transliterated reference algorithms (oracles) -------------------------


def _blend_v(top, bottom):
    w = np.linspace(1, 0, top.shape[0])[:, None]
    return top * w + bottom * (1 - w)


def _blend_h(left, right):
    w = np.linspace(1, 0, left.shape[1])[None, :]
    return left * w + right * (1 - w)


def _concat_crops_blended_oracle(crops, stride, window):
    """sw_processing.py:113-134 for float crops."""
    n = int(np.sqrt(len(crops)))
    step = window - stride
    vertical = None
    for i in range(n):
        horizontal = crops[i * n]
        for j in range(1, n):
            left, right = horizontal, crops[i * n + j]
            overlap = _blend_h(left[:, -step:], right[:, :-stride])
            horizontal = np.concatenate([left[:, :-step], overlap, right[:, -stride:]], axis=1)
        if i == 0:
            vertical = horizontal
        else:
            top_overlap = _blend_v(vertical[-step:, :], horizontal[:-stride, :])
            vertical = np.concatenate([vertical[:-step, :], top_overlap, horizontal[-stride:, :]], axis=0)
    return vertical


def _sliding_window_oracle(img, stride, window):
    """sw_processing.py:151-163 (PIL .size is (W,H); square here)."""
    crops = []
    for y in range(0, img.shape[0] - stride * 2, stride):
        for x in range(0, img.shape[1] - stride * 2, stride):
            crops.append(img[y : y + window, x : x + window])
    return crops


def _concat_crops_overlap_oracle(crops, stride):
    """utils.py:319-347."""
    n = int(np.sqrt(len(crops)))
    s = stride * 2
    vertical = None
    for i in range(n):
        horizontal = crops[i * n]
        for j in range(1, n):
            left, right = horizontal, crops[i * n + j]
            overlap = left[:, -s:] // 2 + right[:, :s] // 2
            horizontal = np.concatenate([left[:, :-s], overlap, right[:, s:]], axis=1)
        if i == 0:
            vertical = horizontal
        elif i == n - 1:
            vertical = np.concatenate([vertical, horizontal[s:, :]], axis=0)
        else:
            top = vertical[-s:, :] // 2 + horizontal[:s, :] // 2
            vertical = np.concatenate([vertical[:-s, :], top, horizontal[s:, :]], axis=0)
    return vertical


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
