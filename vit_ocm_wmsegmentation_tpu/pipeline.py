"""Fused inference pipelines: image -> attention -> mask, one XLA graph.

These are the TPU rebuilds of the reference's per-image CPU post-processing
chains. Each function is jittable end-to-end; nothing leaves the device
between the patch embed and the final uint8 mask.

* :func:`attention_map_single` — eval.py crop==1 path (:135-171): last-block
  CLS attention, head-average, median filter, /8-x8 bilinear smoothing.
* :func:`segment_single` — + method dispatch (ours/otsu/heatmap) (:172-202).
* :func:`attention_mosaic` / :func:`segment_mosaic` — sw_processing.py
  rebuilt: batched tile gather -> vmapped ViT over the tile batch ->
  per-tile normalize + bilinear smooth -> ramp-blended overlap-add stitch ->
  multiplicative Otsu threshold. The reference runs 49 sequential forwards
  and O(H*W) Python blending loops; here the mosaic stays HBM-resident and
  the tile axis is the natural data-parallel shard axis (see parallel/).
"""

from __future__ import annotations

from contextlib import nullcontext as _NULL_SCOPE
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .models import vit
from .ops import stitch as st
from .ops import threshold as th
from .ops.filters import median_filter
from .ops.resize import resize_linear_cv2, smooth_attention

# sw_processing.py --streamed auto: mosaics above this many megapixels route
# through segment_mosaic_streamed (the fused graph's (T, win, win) per-tile
# attention stack approaches HBM limits past the 4608² = 21.2 MP row of
# BENCH.md's size-scaling table; streamed is bit-identical and bounded).
STREAM_AUTO_MP = 22

# Tile rows per streamed dispatch (band_chunk): identical numbers
# (tests/test_pipeline.py band_chunk bit-equal; full-1.07 GP digest equality
# in BENCH.md). The r5 on-chip sweep (tools/bench_gigapixel.py --band_chunk,
# warm, min-of-2; BENCH.md "band_chunk sweep" table) measured steady-state
# FLAT in K — 9.0/9.1/9.1/9.1 s at 8192² for K=1/4/8/16 and 152.7 s at
# 32768² for both K=1 and K=8: the async dispatch queue already hides the
# per-band relay round trips that grouping was built to remove (r3's
# ~0.9 ms/tile K=1 overhead predated the hoisted per-band uploads). K=8 is
# kept as the default because grouping is free and sends 8× fewer host
# dispatches — headroom for serving mode, where the dispatch loop shares
# the host with decode/encode threads.
DEFAULT_BAND_CHUNK = 8


def to_model_input(img_u8, dtype=jnp.float32):
    """uint8 (..., H, W) grayscale -> float (..., H, W, 3) in [0,1].

    Matches PIL convert('RGB') (channel replication) + ToTensor (/255).
    ``dtype=jnp.bfloat16`` runs the ViT in MXU-native bf16 (attention logits,
    LayerNorm and all matmul accumulation stay float32).
    """
    x = (img_u8.astype(jnp.float32) / 255.0).astype(dtype)
    return jnp.broadcast_to(x[..., None], x.shape + (3,))


def cast_params(params, dtype):
    """Cast floating-point leaves (weights) to a compute dtype (bf16)."""
    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p, params
    )


def head_average_attention(params, cfg, x, median_size=1):
    """(B,H,W,3) -> (B, gh, gw): CLS attention grid averaged over heads with
    the optional median filter (eval.py:142-144).

    The reference median-filters the nearest-x{patch} upsampled map and the
    subsequent /patch downsample 2-tap-samples at block centers
    (eval.py:169). For the default size=1 this chain is the identity on the
    grid; for size>1 we replicate it exactly: filter the upsampled map, then
    resample back to the grid with the cv2 2-tap kernel.
    """
    grids = vit.cls_attention_grid(params, cfg, x)  # (B, nh, gh, gw)
    avg = jnp.mean(grids, axis=1)
    if median_size > 1:
        from .ops.resize import upsample_nearest

        p = cfg.patch_size
        gh, gw = avg.shape[-2], avg.shape[-1]
        up = upsample_nearest(avg, p)
        up = jax.vmap(lambda g: median_filter(g, median_size))(up)
        avg = resize_linear_cv2(up, (gh, gw))
    return avg


@partial(jax.jit, static_argnames=("cfg", "median_size"))
def attention_map_rgb(params, cfg, x, median_size=1):
    """eval.py crop==1 attention chain for float RGB input (B, H, W, 3) in
    [0,1]: returns the smoothed attention map (B, H, W) float32."""
    b, h, w, _ = x.shape
    # attention grids leave in f32 whatever the ViT compute dtype (bf16 under
    # --bf16): smoothing/threshold stages downstream stay exact either way
    avg = head_average_attention(params, cfg, x, median_size).astype(jnp.float32)
    return jax.vmap(lambda g: smooth_attention(g, cfg.patch_size, (h, w)))(avg)


@partial(jax.jit, static_argnames=("cfg", "median_size"))
def attention_map_single(params, cfg, img_u8, median_size=1):
    """eval.py crop==1 attention chain for a batch of grayscale uint8 images
    (B, H, W): returns the smoothed attention map (B, H, W) float32."""
    return attention_map_rgb(params, cfg, to_model_input(img_u8), median_size)


@partial(jax.jit, static_argnames=("cfg",))
def attention_heads(params, cfg, x):
    """Per-head CLS attention maps at image resolution: (B, nh, H, W), the
    nearest-x8 maps analyse_attention saves as attn-head{j}.png
    (compute_attention, utils.py:229-235)."""
    grids = vit.cls_attention_grid(params, cfg, x)
    from .ops.resize import upsample_nearest

    return upsample_nearest(grids, cfg.patch_size)


@partial(jax.jit, static_argnames=("cfg", "method", "median_size"))
def segment_single(params, cfg, img_u8, method="ours", median_size=1):
    """Fused eval step for the thresholding methods: (B, H, W) uint8 images ->
    ((B, H, W) uint8 {0,255} masks, (B, H, W) float attention)."""
    attn = attention_map_single(params, cfg, img_u8, median_size)

    def one(img, a):
        t_ours, t_otsu, t_heat = th.threshold_ours(img, a)
        return {"ours": t_ours, "otsu": t_otsu, "heatmap_threshold": t_heat}[method]

    return jax.vmap(one)(img_u8, attn), attn


# ---------------------------------------------------------------------------
# Mosaic (sliding-window) pipeline
# ---------------------------------------------------------------------------


def validate_window_geometry(window: int, stride: int) -> None:
    """Reject sliding-window geometries the blend math can't represent,
    with a message naming the flags (a bad --window_size/--stride pair used
    to surface as a numpy linspace error from deep inside the stitch).
    stride > window would leave unscanned gaps between tiles; the ramp
    overlap-add additionally needs window % stride == 0 (the reference's
    own geometry: 384/128)."""
    if stride <= 0 or stride > window:
        raise ValueError(
            f"stride ({stride}) must be in [1, window ({window})]: "
            f"stride > window leaves gaps between tiles")
    if window % stride != 0:
        raise ValueError(
            f"window ({window}) must be a multiple of stride ({stride}) "
            f"for the blended overlap-add stitch (reference geometry)")


def pad_mosaic(img_u8, window, stride):
    """Edge-pad (H, W) up to the next size the window/stride geometry tiles
    exactly: size = window + k*stride. The reference assumes exact fit and
    crashes otherwise (sw_processing.py:151-163); we pad-and-crop instead to
    keep shapes static under jit (SURVEY.md §7 'odd mosaic sizes')."""
    h, w = img_u8.shape

    def target(size):
        if size <= window:
            return window
        k = -(-(size - window) // stride)
        return window + k * stride

    target_h, target_w = target(h), target(w)
    if (target_h, target_w) == (h, w):
        return img_u8, (h, w)
    return jnp.pad(img_u8, ((0, target_h - h), (0, target_w - w)), mode="edge"), (h, w)


def mosaic_tiles(img_u8, window, stride):
    """(H, W) uint8 -> (T, window, window) uint8 tile batch, row-major."""
    h, w = img_u8.shape
    ys = st.tile_starts(h, window, stride)
    xs = st.tile_starts(w, window, stride)
    return st.extract_tiles(img_u8, ys, xs, window)


def _per_tile_attention(params, cfg, tiles_u8, window, median_size=1, dtype=jnp.float32):
    """Tile batch -> per-tile smoothed attention maps, reproducing
    sw_processing.py:235-258: head-average, min-max normalize, *255,
    /8 then x8 INTER_LINEAR (== bilinear upsample of the grid)."""
    x = to_model_input(tiles_u8, dtype)
    avg = head_average_attention(params, cfg, x, median_size).astype(jnp.float32)

    def one(g):
        g = th.min_max_normalize(g) * 255.0
        return resize_linear_cv2(g, (window, window))

    return jax.vmap(one)(avg)


# per-call tile-batch bound: the vmapped ViT materializes (T, N, 3D) qkv
# temps per block (~5.3 MB/tile at ViT-S/8 384^2 in bf16), so an unbounded T
# OOMs HBM around ~1000 tiles (a 4608^2 mosaic). Tiles beyond the bound are
# processed by a lax.map over fixed-size chunks — same numbers, bounded
# memory, gigapixel-capable; workloads at or below the bound (the 1152^2
# headline's 49 tiles) compile to the exact same single-batch graph.
TILE_CHUNK = 256


@partial(jax.jit, static_argnames=("cfg", "window", "stride", "median_size", "dtype",
                                   "mesh"))
def attention_mosaic(params, cfg, img_u8, window=384, stride=128, median_size=1,
                     dtype=jnp.float32, mesh=None):
    """Full-mosaic attention map: (H, W) uint8 -> (H, W) float32.

    One fused graph: batched gather -> vmapped ViT (CLS-row attention) ->
    per-tile normalize/smooth -> ramp-blended overlap-add stitch.
    ``mesh`` (static): multi-chip mesh — see segment_mosaic.
    """
    from .parallel.mesh import kernel_mesh_scope

    validate_window_geometry(window, stride)
    padded, (h, w) = pad_mosaic(img_u8, window, stride)
    tiles = mosaic_tiles(padded, window, stride)
    t = tiles.shape[0]
    with kernel_mesh_scope(mesh) if mesh is not None else _NULL_SCOPE():
        if t <= TILE_CHUNK:
            maps = _per_tile_attention(params, cfg, tiles, window, median_size, dtype)
        else:
            k = -(-t // TILE_CHUNK)
            tiles = jnp.pad(tiles, ((0, k * TILE_CHUNK - t), (0, 0), (0, 0)), mode="edge")
            chunks = tiles.reshape(k, TILE_CHUNK, window, window)
            maps = jax.lax.map(
                lambda c: _per_tile_attention(params, cfg, c, window, median_size, dtype), chunks
            ).reshape(k * TILE_CHUNK, window, window)[:t]
    stitched = st.stitch_blended(maps, window, stride, padded.shape)
    return stitched[:h, :w]


# ---------------------------------------------------------------------------
# Streamed gigapixel pipeline: one band of tile-rows per dispatch
# ---------------------------------------------------------------------------


@partial(jax.jit, donate_argnums=(3,),
         static_argnames=("cfg", "window", "stride", "median_size", "dtype",
                          "mesh"))
def _band_sweep(params, cfg, img_dev, acc, ys_dev, wy_dev, window, stride,
                median_size, dtype, mesh=None):
    """A run of tile-row bands in one compiled graph: fori_loop over the
    band index with the f32 canvas as the (donated) carry. Same numbers as
    the per-band dispatch loop; zero per-band host/dispatch overhead
    (measured ~0.9 ms/tile of relay queueing across 254 chained band
    dispatches). Callers pass ALL bands (single_dispatch — crashed the TPU
    worker at 254 iterations, opt-in) or a band_chunk=K slice (the middle
    ground: K-fold fewer dispatches, small trip count per graph; all full
    chunks share one compilation since K is carried by ys_dev's shape).

    ``mesh`` (static, keyed into the jit cache like segment_mosaic's): a
    pure-dp mesh shards each band's tile row across chips via the
    shard_map kernel islands (parallel/mesh.py::dp_island)."""
    from .parallel.mesh import kernel_mesh_scope

    def body(r, a):
        return _band_update_impl(params, cfg, img_dev, a, ys_dev[r],
                                 wy_dev[r], window, stride, median_size, dtype)

    with kernel_mesh_scope(mesh) if mesh is not None else _NULL_SCOPE():
        return jax.lax.fori_loop(0, ys_dev.shape[0], body, acc)


@partial(jax.jit, donate_argnums=(3,),
         static_argnames=("cfg", "window", "stride", "median_size", "dtype",
                          "mesh"))
def _band_update(params, cfg, img_dev, acc, y0, wy_row, window, stride,
                 median_size, dtype, mesh=None):
    """One-band dispatch used by the progress-reporting python loop; see
    _band_update_impl. ``mesh`` as in _band_sweep."""
    from .parallel.mesh import kernel_mesh_scope

    with kernel_mesh_scope(mesh) if mesh is not None else _NULL_SCOPE():
        return _band_update_impl(params, cfg, img_dev, acc, y0, wy_row,
                                 window, stride, median_size, dtype)




def _band_update_impl(params, cfg, img_dev, acc, y0, wy_row, window, stride,
                      median_size, dtype):
    """Process ONE row of tiles starting at mosaic row y0 and overlap-add its
    weighted attention strip into the (H, W) f32 accumulator (donated).

    The donation is load-bearing at gigapixel scale: the caller enqueues
    every band before syncing, and WITHOUT input-output aliasing each
    pending dispatch preallocates its own (H, W) f32 canvas output —
    254 × 4.3 GB at 32768² (observed RESOURCE_EXHAUSTED). With donation all
    bands alias one canvas and the queue serializes on it.

    The horizontal stitch within the strip uses the same blend profiles as
    stitch_blended; the vertical profile for this tile row arrives as
    wy_row (window,) so every band compiles to the same graph."""
    h, w = img_dev.shape
    strip = jax.lax.dynamic_slice(img_dev, (y0, jnp.int32(0)), (window, w))
    xs = st.tile_starts(w, window, stride)
    tiles = st.extract_tiles(strip, np.zeros(1, np.int32), xs, window)
    maps = _per_tile_attention(params, cfg, tiles, window, median_size, dtype)
    wx = st.blend_profiles_1d(len(xs), window, stride)
    band = st.overlap_add(maps * wy_row[None, :, None].astype(maps.dtype),
                          np.ones((1, window)), wx, window, stride, (window, w))
    cur = jax.lax.dynamic_slice(acc, (y0, jnp.int32(0)), (window, w))
    return jax.lax.dynamic_update_slice(acc, cur + band, (y0, jnp.int32(0)))


def segment_mosaic_streamed(params, cfg, img_u8, window=384, stride=128,
                            median_size=1, dtype=jnp.float32, exact_stitch=False,
                            progress=None, single_dispatch=False,
                            band_chunk=None, mesh=None):
    """Gigapixel-capable segment_mosaic: identical numbers, bounded memory.

    segment_mosaic materializes the full (T, window, window) per-tile
    attention stack before stitching — ~38 GB at 32768² (64k tiles), far
    past HBM. Here the mosaic and the f32 attention canvas stay
    HBM-resident (~5.4 GB at 1.07 GP) and each dispatch processes one row
    of tiles, overlap-adding its blended strip into the canvas; the final
    threshold runs on device over the full canvas. The tile axis within a
    band remains the data-parallel shard axis.

    img_u8 may be a host numpy array (uploaded once) or a device array.
    band_chunk=K groups K tile rows into one dispatch (see
    _band_sweep) — numbers identical, K fewer relay round trips
    (None = DEFAULT_BAND_CHUNK, the on-chip-swept value).
    ``mesh``: a pure-dp jax Mesh — each band's tile row is sharded across
    chips through the shard_map kernel islands, so a pod tears through a
    gigapixel mosaic with the same bounded-HBM streaming as one chip (the
    uint8 mosaic + f32 canvas are replicated; at 1.07 GP that is ~5.4 GB
    per chip, well inside a v5e's 16 GB).
    Returns (mask_u8 (H, W) {0,255} device array, attention (H, W) f32
    device array).
    """
    if band_chunk is None:
        band_chunk = DEFAULT_BAND_CHUNK
    validate_window_geometry(window, stride)
    img_u8 = jnp.asarray(img_u8)
    padded, (h, w) = pad_mosaic(img_u8, window, stride)
    ys = st.tile_starts(padded.shape[0], window, stride)
    wy = st.blend_profiles_1d(len(ys), window, stride).astype(np.float32)
    # upload the per-band scalars/profiles ONCE: a per-band jnp.asarray is a
    # host->device transfer whose relay round-trip (~0.5 s here) dwarfs the
    # 0.6 s band compute — 254 of them doubled the 1.07 GP wall clock
    ys_dev = jnp.asarray(np.asarray(ys, np.int32))
    wy_dev = jnp.asarray(wy)
    acc = jnp.zeros(padded.shape, jnp.float32)
    if single_dispatch:
        # whole band sweep as ONE dispatch (lax.fori_loop, acc as carry).
        # Experimental: saves the residual ~0.6 ms/tile of relay queueing,
        # but the 254-band graph crashed the TPU worker at 32768² on the
        # current runtime — hence opt-in, default off.
        acc = _band_sweep(params, cfg, padded, acc, ys_dev, wy_dev,
                          window, stride, median_size, dtype, mesh)
    elif band_chunk > 1:
        for c0 in range(0, len(ys), band_chunk):
            c1 = min(c0 + band_chunk, len(ys))
            acc = _band_sweep(params, cfg, padded, acc,
                              ys_dev[c0:c1], wy_dev[c0:c1],
                              window, stride, median_size, dtype, mesh)
            if progress is not None:
                progress(c1, len(ys))
    else:
        for r in range(len(ys)):
            acc = _band_update(params, cfg, padded, acc, ys_dev[r],
                               wy_dev[r], window, stride, median_size, dtype,
                               mesh)
            if progress is not None:
                progress(r + 1, len(ys))
    attn = acc[:h, :w]
    timg = img_u8 if not exact_stitch else st.restitch_u8(padded, window, stride)[:h, :w]
    mask = _threshold_mult_streamed(timg, attn)
    return mask, attn


@jax.jit
def _threshold_mult_streamed(timg, attn):
    """threshold_multiplicative's first mask only, with gigapixel-bounded
    memory: the normalized-attention f32 canvas is fused into the single
    uint8 `result` pass instead of materialized (4.3 GB at 1.07 GP), the
    Otsu histogram runs chunked, and the th2/th3 masks the streamed caller
    never returns are not computed. Numbers identical to
    threshold_multiplicative(timg, attn)[0] (min-max then /max(attn)==1
    exactly when the canvas is non-constant, sw_processing.py:37-81)."""
    lo, hi = jnp.min(attn), jnp.max(attn)
    # bit-identical to the one-shot path: same (x - lo)/(hi - lo) DIVISION
    # (a reciprocal multiply differs by ~ulps, enough to flip a uint8
    # truncation on boundary pixels), then the same trailing divide — /1.0
    # (exact identity) for non-constant canvases, /max(|hi|, eps) raw
    # passthrough for constant ones, as min_max_normalize does
    rng = jnp.where(hi == lo, 1.0, hi - lo)
    shift = jnp.where(hi == lo, 0.0, lo)
    denom2 = jnp.where(hi == lo, jnp.maximum(hi, th._FLT_EPSILON), 1.0)
    result = (timg.astype(jnp.float32) * ((attn - shift) / rng) / denom2
              ).astype(jnp.uint8)
    if jax.default_backend() in ("tpu", "axon"):
        hist = th.histogram_u8_pallas(result)
    else:
        hist = th.histogram_u8_chunked(result)
    t = th.otsu_from_hist(hist)
    return (result.astype(jnp.float32) > t).astype(jnp.uint8) * jnp.uint8(255)


@partial(jax.jit, static_argnames=("cfg", "window", "stride", "median_size", "dtype",
                                   "exact_stitch", "mesh"))
def segment_mosaic(params, cfg, img_u8, window=384, stride=128, median_size=1,
                   dtype=jnp.float32, exact_stitch=False, mesh=None):
    """Mosaic white-matter mask: the sw_processing.py end-to-end flow.

    Returns (mask_u8 {0,255}, attention (H,W) float32). The reference
    thresholds the *re-stitched* uint8 image; blended overlapping crops of
    one image reconstruct that image up to per-pixel truncation (weights are
    a partition of unity), so by default we threshold the original mosaic
    directly — documented delta, at most ±1 uint8 level inside overlap
    bands. ``exact_stitch=True`` instead thresholds the reference's
    re-stitched image bit-exactly (ops.stitch.restitch_u8 reproduces the
    per-blend uint8 truncation of sw_processing.py:224-229), for near-bit
    parity against the reference's executed code (tools/parity_fullscale.py).

    ``mesh``: a multi-chip jax Mesh to run on — static, so the jit cache
    keys on it (the ambient parallel.mesh.set_kernel_mesh context alone
    would not retrace an already-cached shape). A pure-dp mesh shards the
    tile axis and runs the Pallas kernels per shard (dp_island).
    """
    attn = attention_mosaic(params, cfg, img_u8, window, stride, median_size,
                            dtype, mesh)
    timg = img_u8
    if exact_stitch:
        padded, (h, w) = pad_mosaic(img_u8, window, stride)
        timg = st.restitch_u8(padded, window, stride)[:h, :w]
    mask, _, _ = th.threshold_multiplicative(timg, attn)
    return mask, attn
