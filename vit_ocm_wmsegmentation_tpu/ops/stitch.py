"""Mosaic tiling and blended overlap-add stitching, HBM-resident.

The reference processes gigapixel mosaics as a *sequential* Python loop of 49
single-tile ViT forwards followed by O(H*W) per-pixel Python blending loops
(sw_processing.py:113-163, 235-259). Here the mosaic stays in HBM: tiles are
extracted as one batched dynamic-slice gather, the ViT runs vmapped over the
tile batch (shardable over a device mesh), and the linear-ramp blended
stitch becomes an overlap-add with precomputed per-tile weight patches.

Exactness: the reference's iterative pairwise blending is position-aligned
and linear in the tile values, so the final mosaic is
``sum_ij v_i(y) * h_j(x) * tile_ij`` where the 1D profiles v/h are obtained
by feeding indicator tiles through the same iterative recurrence (done once
per geometry, on the host, in float64). tests/test_stitch.py proves equality
against a transliterated oracle of the reference algorithm.

The overlap-add itself exploits window == k*stride (the reference geometry:
384 = 3*128): each weighted tile splits into k x k blocks of (stride,
stride) which accumulate into a shifted block grid — pure adds, no scatter.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def tile_starts(size: int, window: int, stride: int) -> np.ndarray:
    """Tile start offsets covering [0, size-window] at the given stride.

    Identical to the reference sliding_window geometry
    (sw_processing.py:151-163, starts = range(0, size - 2*stride, stride))
    in its only supported configuration window == 3*stride — and, unlike
    the reference formula, correct for any window/stride ratio (the
    reference under-covers the right/bottom edge for other ratios). The
    window must tile the span exactly; pad_mosaic arranges that.
    """
    assert (size - window) % stride == 0 and size >= window, (
        f"mosaic size {size} not tiled exactly by window {window} / stride {stride}; pad first"
    )
    return np.arange(0, size - window + 1, stride)


def extract_tiles(image, ys, xs, window: int):
    """Batched tile gather: image (H, W, ...) -> (len(ys)*len(xs), window, window, ...).

    Row-major tile order (y outer, x inner), matching the reference loop.
    """
    ys = jnp.asarray(ys, jnp.int32)
    xs = jnp.asarray(xs, jnp.int32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    starts = jnp.stack([grid_y.ravel(), grid_x.ravel()], axis=-1)  # (T, 2)

    trailing = image.shape[2:]

    def one(start):
        idx = (start[0], start[1]) + (jnp.int32(0),) * len(trailing)
        return jax.lax.dynamic_slice(image, idx, (window, window) + trailing)

    return jax.vmap(one)(starts)


@lru_cache(maxsize=32)
def blend_profiles_1d(n: int, window: int, stride: int) -> np.ndarray:
    """Per-tile weight profiles (n, window) of the reference's iterative
    linear-ramp blend (sw_processing.py:113-149), via indicator simulation.

    Feeding tile_j = 1 (others 0) through the recurrence yields tile j's
    coefficient at every global position; restricted to its own window this
    is its weight profile. float64, like the reference's numpy."""
    step = window - stride
    if step == 0:  # non-overlapping tiles: plain concat, unit weights
        return np.ones((n, window))
    ramp = np.linspace(1.0, 0.0, step)
    out = np.zeros((n, window))
    for j in range(n):
        tiles = np.zeros((n, window))
        tiles[j] = 1.0
        acc = tiles[0].copy()
        for t in range(1, n):
            right = tiles[t]
            overlap = acc[-step:] * ramp + right[:step] * (1.0 - ramp)
            acc = np.concatenate([acc[:-step], overlap, right[-stride:]])
        out[j] = acc[j * stride : j * stride + window]
    return out


def overlap_add(tiles, weights_y, weights_x, window: int, stride: int, out_hw):
    """Weighted overlap-add stitch.

    tiles: (I*J, window, window) in row-major (y, x) tile order;
    weights_y: (I, window); weights_x: (J, window). Returns (H, W).
    Requires window % stride == 0 (reference geometry); the weighted tiles
    are accumulated block-wise with k = window // stride shifted adds.
    """
    ii, jj = weights_y.shape[0], weights_x.shape[0]
    h, w = out_hw
    assert window % stride == 0, "overlap_add requires window to be a multiple of stride"
    k = window // stride
    wy = jnp.asarray(weights_y, tiles.dtype)
    wx = jnp.asarray(weights_x, tiles.dtype)
    t = tiles.reshape(ii, jj, window, window)
    t = t * wy[:, None, :, None] * wx[None, :, None, :]

    # split into k x k sub-blocks of (stride, stride)
    t = t.reshape(ii, jj, k, stride, k, stride).transpose(2, 4, 0, 1, 3, 5)  # (k,k,I,J,s,s)
    by = ii + k - 1
    bx = jj + k - 1
    acc = jnp.zeros((by, bx, stride, stride), tiles.dtype)
    for dy in range(k):
        for dx in range(k):
            acc = acc.at[dy : dy + ii, dx : dx + jj].add(t[dy, dx])
    out = acc.transpose(0, 2, 1, 3).reshape(by * stride, bx * stride)
    return out[:h, :w]


def stitch_blended(tiles, window: int, stride: int, out_hw):
    """sw_processing concat_crops(crops, stride, window) for float tiles:
    (T, window, window) row-major -> (H, W) with the reference's blended
    overlaps, computed as a single fused overlap-add."""
    h, w = out_hw
    n_y = len(tile_starts(h, window, stride))
    n_x = len(tile_starts(w, window, stride))
    wy = blend_profiles_1d(n_y, window, stride)
    wx = blend_profiles_1d(n_x, window, stride)
    return overlap_add(tiles, wy, wx, window, stride, out_hw)


# ---------------------------------------------------------------------------
# Reference-exact uint8 image re-stitch (sw_processing.py:224-229: the
# reference tiles the mosaic, blend-restitches the uint8 tiles, and
# thresholds THAT image rather than the original). Blending uint8 crops of
# one image reconstructs it up to per-blend float64 truncation (v*w +
# v*(1-w) can land at v - 1ulp -> truncates to v-1), which is the ±1-level
# delta behind the residual 0.5 % mask disagreement in parity. This mode
# reproduces the truncation exactly.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _restitch_u8_table(n: int, window: int, stride: int) -> np.ndarray:
    """(256, S) uint8 table with S = window + (n-1)*stride: the value the
    reference's concat_crops (sw_processing.py:113-134) produces at global
    1D position x when every source tile holds the constant value v.

    Valid as a per-pixel model of the 2D restitch because every blend
    operand at a given global position derives from the same source pixel:
    the fresh tile contributes v, and the running buffer contributes a value
    that is itself a function of (v, position) only. Simulated with the
    literal recurrence — float64 blend, C-cast truncation to uint8 per
    blend, exactly `overlap = np.zeros_like(left); overlap[...] = ...`."""
    step = window - stride
    vals = np.arange(256, dtype=np.float64)
    tile = np.repeat(vals[:, None], window, axis=1).astype(np.uint8)
    if step == 0 or n == 1:
        return np.concatenate([tile] + [tile[:, -stride:]] * (n - 1), axis=1)
    w = np.linspace(1.0, 0.0, step)
    acc = tile.copy()
    for _ in range(1, n):
        left = acc[:, -step:].astype(np.float64)
        right = tile[:, :step].astype(np.float64)
        overlap = (left * w + right * (1.0 - w)).astype(np.uint8)
        acc = np.concatenate([acc[:, :-step], overlap, tile[:, -stride:]], axis=1)
    return acc


def restitch_u8(img_u8, window: int, stride: int):
    """The uint8 mosaic the reference would obtain by tiling img and
    blend-restitching the tiles (`im` in sw_processing.py:227-229): a pure
    per-pixel gather out[y, x] = Tv[Th[img[y, x], x], y] through the two
    1D truncation tables (horizontal blends first, then vertical — the
    reference's pass order). Jittable; used by segment_mosaic's
    reference-exact threshold mode."""
    h, w = img_u8.shape
    n_y = len(tile_starts(h, window, stride))
    n_x = len(tile_starts(w, window, stride))
    th = jnp.asarray(_restitch_u8_table(n_x, window, stride))  # (256, W)
    tv = jnp.asarray(_restitch_u8_table(n_y, window, stride))  # (256, H)
    cols = jnp.arange(w, dtype=jnp.int32)
    rows = jnp.arange(h, dtype=jnp.int32)
    hpass = th[img_u8.astype(jnp.int32), cols[None, :]]
    return tv[hpass.astype(jnp.int32), rows[:, None]]


# ---------------------------------------------------------------------------
# Non-overlapping grid concat (utils.py:304-317) and //2-averaged overlap
# concat (utils.py:319-347) used by the crop>1 eval paths
# ---------------------------------------------------------------------------


def concat_crops(crops):
    """(T, h, w) row-major square grid -> (sqrt(T)*h, sqrt(T)*w)."""
    t, h, w = crops.shape
    g = int(np.sqrt(t))
    assert g * g == t
    return crops.reshape(g, g, h, w).transpose(0, 2, 1, 3).reshape(g * h, g * w)


def concat_crops_overlap(crops, stride: int):
    """utils.py concat_crops_overlap: overlap = 2*stride, combined as
    a//2 + b//2 (floor semantics for both ints and floats, like numpy).

    Kept as the literal iterative algorithm: it is only used by the offline
    4/16-crop analysis path and the floor-division makes it non-linear.
    """
    crops = jnp.asarray(crops)
    t = crops.shape[0]
    g = int(np.sqrt(t))
    ov = stride * 2
    rows = []
    for i in range(g):
        horiz = crops[i * g]
        for j in range(1, g):
            right = crops[i * g + j]
            overlap = horiz[:, -ov:] // 2 + right[:, :ov] // 2
            horiz = jnp.concatenate([horiz[:, :-ov], overlap, right[:, ov:]], axis=1)
        rows.append(horiz)
    vert = rows[0]
    for i in range(1, g):
        if i == g - 1:
            vert = jnp.concatenate([vert, rows[i][ov:, :]], axis=0)
        else:
            top_overlap = vert[-ov:, :] // 2 + rows[i][:ov, :] // 2
            vert = jnp.concatenate([vert[:-ov, :], top_overlap, rows[i][ov:, :]], axis=0)
    return vert
