"""CLAHE — contrast-limited adaptive histogram equalization.

Rebuild of the reference's adaptive_histogram_equalization helper
(utils.py:46-53 / sw_processing.py:21-28: cv2.createCLAHE(clipLimit=2.0,
tileGridSize=(8,8)); defined but off the main metric path). Implemented as a
jittable jnp op with cv2's algorithm: per-tile clipped histograms with
uniform excess redistribution, per-tile equalization LUTs, and bilinear
interpolation between the four surrounding tile LUTs per pixel.

cv2 details matched: clip limit = max(1, clipLimit * tile_area / 256) with
one-pass redistribution (residual goes to a second sweep in cv2; we match
its single redistribution + remainder handling closely — masks agree on
natural images, small per-pixel deltas possible at histogram ties), LUT
scale = 255 / tile_area, rounding half away from zero.
"""

from __future__ import annotations

import jax
import jax
import jax.numpy as jnp
import numpy as np


def clahe(img_u8, clip_limit: float = 2.0, grid: int = 8):
    """uint8 (H, W) -> uint8 (H, W). H and W must be divisible by grid
    (cv2 pads internally otherwise; callers on this codepath use 384/1152)."""
    h, w = img_u8.shape
    assert h % grid == 0 and w % grid == 0, "pad the image to a grid multiple first"
    th, tw = h // grid, w // grid
    area = th * tw
    clip = max(int(clip_limit * area / 256.0), 1)

    tiles = img_u8.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid * grid, area)
    # exact int32 counts via one scatter-add over (tile, value) pairs — the
    # (T, area, 256) one-hot this replaces materializes ~340 MB of bool
    # transient at the 1152² call site (same failure shape that OOM'd
    # ops/threshold.histogram_u8 at scale)
    flat_idx = (tiles.astype(jnp.int32)
                + jnp.arange(grid * grid, dtype=jnp.int32)[:, None] * 256)
    hists = jax.ops.segment_sum(
        jnp.ones((grid * grid * area,), jnp.int32), flat_idx.ravel(),
        num_segments=grid * grid * 256).reshape(grid * grid, 256).astype(jnp.float32)

    clipped = jnp.minimum(hists, clip)
    excess = jnp.sum(hists - clipped, axis=1, keepdims=True)
    # cv2 redistribution: uniform batch to every bin, then the residual
    # spread at stride max(256//residual, 1) starting from bin 0
    batch = jnp.floor(excess / 256.0)
    residual = excess - batch * 256.0
    bins = jnp.arange(256, dtype=jnp.int32)[None]
    res_i = residual.astype(jnp.int32)
    step = jnp.maximum(256 // jnp.maximum(res_i, 1), 1)
    gets_one = (bins % step == 0) & (bins // step < res_i) & (res_i > 0)
    clipped = clipped + batch + gets_one.astype(jnp.float32)

    cdf = jnp.cumsum(clipped, axis=1)
    scale = 255.0 / area
    # cv2 rounds with floor(x + 0.5) (saturate_cast), not round-half-even
    luts = jnp.clip(jnp.floor(cdf * scale + 0.5), 0, 255)  # (T, 256)
    luts = luts.reshape(grid, grid, 256)

    # bilinear interpolation between the 4 surrounding tile LUTs, cv2
    # convention: tile centers at (i + 0.5) * tile_size
    ys = (jnp.arange(h, dtype=jnp.float32) - th / 2.0) / th
    xs = (jnp.arange(w, dtype=jnp.float32) - tw / 2.0) / tw
    y0 = jnp.clip(jnp.floor(ys), -1, grid - 1)
    x0 = jnp.clip(jnp.floor(xs), -1, grid - 1)
    wy = ys - y0
    wx = xs - x0
    y0c = jnp.clip(y0, 0, grid - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, grid - 1).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, grid - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, grid - 1).astype(jnp.int32)

    v = img_u8.astype(jnp.int32)

    def lut_at(yidx, xidx):
        return luts[yidx[:, None], xidx[None, :], v]

    top = lut_at(y0c, x0c) * (1 - wx)[None, :] + lut_at(y0c, x1c) * wx[None, :]
    bot = lut_at(y1c, x0c) * (1 - wx)[None, :] + lut_at(y1c, x1c) * wx[None, :]
    out = top * (1 - wy)[:, None] + bot * wy[:, None]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def adaptive_histogram_equalization(image):
    """utils.py:46-53: clip to uint8 then CLAHE(2.0, 8x8)."""
    img = jnp.clip(image, 0, 255).astype(jnp.uint8)
    return clahe(img, clip_limit=2.0, grid=8)
