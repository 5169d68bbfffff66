"""Histogram thresholding (Otsu / Yen) and the reference's blend pipelines.

All functions are jnp, shape-static, and jittable, so thresholding fuses into
the inference graph right after the ViT instead of round-tripping to the host
per image (the reference's single biggest inefficiency, SURVEY.md §3.1).

Quantization parity notes (SURVEY.md "hard parts"): the reference blends in
*uint8* with numpy true-division then truncation (utils.py:78-81) —
``result = uint8(img/2 * 0.6 + uint8(attn*255)/2 * 0.4)`` — and cv2's Otsu
operates on the 256-bin histogram of that uint8 image with pixels strictly
greater than the threshold mapped to 255. We reproduce exactly that.
"""

from __future__ import annotations

import numpy as onp

import jax
import jax.numpy as jnp

_FLT_EPSILON = jnp.float32(1.1920929e-07)


def min_max_normalize(x):
    """utils.py:55-60: map to [0,1]; constant images pass through unchanged."""
    lo, hi = jnp.min(x), jnp.max(x)
    return jnp.where(hi == lo, x, (x - lo) / (hi - lo))


def _histogram_u8_i32(img_u8):
    """256-bin histogram of a uint8 image (any shape), exact int32 counts."""
    one_hot = img_u8.reshape(-1, 1).astype(jnp.int32) == jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(one_hot, axis=0)


def histogram_u8(img_u8):
    """256-bin histogram of a uint8 image (any shape).

    Counts accumulate in int32 (exact up to 2^31-1 pixels per bin) and are
    cast to f32 once at the end — a single rounding, never accumulation
    drift, so every histogram variant in this module is bit-identical."""
    return _histogram_u8_i32(img_u8).astype(jnp.float32)


def histogram_u8_pallas(img_u8, *, block_rows: int = 2048, interpret: bool = False):
    """256-bin histogram as a Pallas TPU kernel, for gigapixel images.

    Both XLA formulations are HBM-bound at scale: the one-hot form
    materializes (Npix, 256) (OOM), and the chunked form still streams
    ~256 bytes of one-hot per pixel through HBM (measured ~660 s for the
    1.07 GP mosaic's threshold). Here each (block_rows, 128) block is
    loaded into VMEM ONCE and the 256 per-bin compare+count passes run at
    VPU rate out of VMEM; partial counts accumulate across the sequential
    grid into one (256, 1) int32 output (bit-identical integer counts —
    an f32 accumulator would drift past 2^24 per-bin, i.e. exactly at the
    gigapixel scale this kernel exists for).
    """
    import jax.experimental.pallas as pl_mod
    from jax.experimental.pallas import tpu as pltpu_mod

    flat = img_u8.reshape(-1)
    n = flat.shape[0]
    blk = block_rows * 128
    nb = -(-n // blk)
    # pad with 255 and subtract the pad count from the last bin afterwards
    pad = nb * blk - n
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=255)
    x3 = flat.reshape(nb, block_rows, 128)

    def kern(x_ref, o_ref):
        first = pl_mod.program_id(0) == 0
        x = x_ref[0].astype(jnp.int32)

        def body(b, _):
            c = jnp.sum((x == b).astype(jnp.int32)).reshape(1, 1)
            o_ref[pl_mod.ds(b, 1), 0:1] = o_ref[pl_mod.ds(b, 1), 0:1] + c
            return 0

        @pl_mod.when(first)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        jax.lax.fori_loop(0, 256, body, 0)

    hist = pl_mod.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl_mod.BlockSpec((1, block_rows, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu_mod.VMEM)],
        out_specs=pl_mod.BlockSpec((256, 1), lambda i: (0, 0),
                                   memory_space=pltpu_mod.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 1), jnp.int32),
        compiler_params=pltpu_mod.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x3)[:, 0]
    if pad:
        hist = hist.at[255].add(-pad)
    return hist.astype(jnp.float32)


def histogram_u8_chunked(img_u8, chunk_px: int = 1 << 24):
    """histogram_u8 with bounded peak memory for gigapixel inputs.

    The one-hot comparison above is (Npix, 256) before the reduction — at
    1.07 GP that transient is what OOM'd the 32768² run even though the
    output is 256 floats. Here the flat image is processed in ~16 M-pixel
    chunks under lax.map (sequential, one chunk's one-hot live at a time)
    and the integer counts summed — bit-identical to histogram_u8."""
    flat = img_u8.reshape(-1)
    n = flat.shape[0]
    if n <= chunk_px:
        return histogram_u8(flat)
    nch = n // chunk_px
    head = flat[: nch * chunk_px].reshape(nch, chunk_px)
    # int32 partials summed exactly; one f32 cast at the end (== histogram_u8)
    hist = jnp.sum(jax.lax.map(_histogram_u8_i32, head), axis=0)
    if n % chunk_px:
        hist = hist + _histogram_u8_i32(flat[nch * chunk_px :])
    return hist.astype(jnp.float32)


def otsu_from_hist(hist):
    """cv2 THRESH_OTSU: argmax over t of w1*w2*(mu1-mu2)^2, first max kept,
    classes with vanishing mass skipped (modules/imgproc/src/thresh.cpp)."""
    p = hist / jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w1 = jnp.cumsum(p)
    mu_cum = jnp.cumsum(p * bins)
    mu_total = mu_cum[-1]
    w2 = 1.0 - w1
    mu1 = mu_cum / jnp.maximum(w1, _FLT_EPSILON)
    mu2 = (mu_total - mu_cum) / jnp.maximum(w2, _FLT_EPSILON)
    sigma = w1 * w2 * jnp.square(mu1 - mu2)
    valid = (jnp.minimum(w1, w2) >= _FLT_EPSILON) & (jnp.maximum(w1, w2) <= 1.0 - _FLT_EPSILON)
    sigma = jnp.where(valid, sigma, -1.0)
    return jnp.argmax(sigma).astype(jnp.float32)


def otsu_threshold_u8(img_u8):
    """Otsu threshold value (float bin index) of a uint8 image."""
    return otsu_from_hist(histogram_u8(img_u8))


def otsu_binary_u8(img_u8):
    """cv2.threshold(..., THRESH_BINARY + THRESH_OTSU): (mask_u8{0,255}, thresh)."""
    t = otsu_threshold_u8(img_u8)
    mask = (img_u8.astype(jnp.float32) > t).astype(jnp.uint8) * jnp.uint8(255)
    return mask, t


def yen_threshold_u8(img_u8):
    """skimage.filters.threshold_yen on a uint8 image.

    skimage histograms integer images over [img.min(), img.max()]; we keep a
    static 256-bin histogram and mask bins outside the observed range (empty
    leading/trailing bins change cumulative squares, so masking must emulate
    the dynamic range exactly: out-of-range bins get zero pmf AND the
    criterion is only evaluated at in-range split points).
    """
    hist = histogram_u8(img_u8)
    bins = jnp.arange(256, dtype=jnp.float32)
    lo = jnp.argmax(hist > 0)
    hi = 255 - jnp.argmax(hist[::-1] > 0)
    pmf = hist / jnp.sum(hist)
    p1 = jnp.cumsum(pmf)
    p1_sq = jnp.cumsum(jnp.square(pmf))
    # reversed cumsum within [lo, hi]: total minus prefix
    tot_sq_from = jnp.sum(jnp.square(pmf)) - p1_sq
    denom = p1_sq[:-1] * tot_sq_from[:-1]  # P2_sq[t+1] = sum_{i>t} pmf_i^2
    num = jnp.square(p1[:-1] * (1.0 - p1[:-1]))
    crit = jnp.log(num / denom)
    valid = (bins[:-1] >= lo) & (bins[:-1] < hi)
    crit = jnp.where(valid & jnp.isfinite(crit), crit, -jnp.inf)
    # constant image: no valid split point exists and skimage returns the
    # single occupied bin's center (= the constant), not bin 0
    return jnp.where(lo == hi, bins[lo], bins[jnp.argmax(crit)])


def yen_binary_u8(img_u8):
    """utils.py:237-248: binary = (yen_thresh <= img)."""
    t = yen_threshold_u8(img_u8)
    return img_u8.astype(jnp.float32) >= t


def mult_blend_u8(img_u8, attention):
    """img * attn / attn.max(), truncated to uint8 — the kmeans/chan_vese
    input (utils.py:121,203). NOTE: raw-max scaling only, no min-max (unlike
    threshold()/blend_ours); shared by evaluation.apply_method and
    cluster.kmeans_mask_ours so the quirk can't drift."""
    a = attention.astype(jnp.float32)
    a = a / jnp.maximum(jnp.max(a), 1e-38)
    return (img_u8.astype(jnp.float32) * a).astype(jnp.uint8)


def blend_ours(img_u8, attention, alpha=0.4):
    """utils.py:69-81: min-max the attention, quantize to uint8, alpha-blend
    with the half-intensity image, truncate to uint8.

    Returns (blend_u8, attn_u8).
    """
    attn = min_max_normalize(attention.astype(jnp.float32))
    attn_u8 = (attn * 255.0).astype(jnp.uint8)
    # The reference computes (img/2)*(1-alpha) + (a8/2)*alpha in float64 and
    # truncates to uint8. float64 rounding decides ties at exact-integer
    # results (e.g. (3i+2a) % 10 == 0 lands at k∓1e-14 either way), so neither
    # float32 nor exact integer math reproduces it on TPU. The blend is a pure
    # function of two uint8s -> build the exact 256x256 LUT with numpy float64
    # at trace time and gather. One 64KB table, fully fused.
    iv = onp.arange(256.0)
    lut = ((iv[:, None] / 2) * (1 - alpha) + (iv[None, :] / 2) * alpha).astype(onp.uint8)
    blend = jnp.asarray(lut)[img_u8.astype(jnp.int32), attn_u8.astype(jnp.int32)]
    return blend, attn_u8


def threshold_ours(img_u8, attention):
    """The reference `threshold` (utils.py:62-115): returns the three Otsu
    masks (blend, original image, attention heatmap) as uint8 {0,255}."""
    blend_u8, attn_u8 = blend_ours(img_u8, attention)
    th, _ = otsu_binary_u8(blend_u8)
    th2, _ = otsu_binary_u8(img_u8)
    th3, _ = otsu_binary_u8(attn_u8)
    return th, th2, th3


def threshold_multiplicative(img_u8, attention):
    """sw_processing.py:37-81 variant: result = img * minmax(attn), truncated.

    Returns (th_blend, th_original, th_attention) uint8 {0,255} masks.
    """
    attn = min_max_normalize(attention.astype(jnp.float32))
    # the reference divides again by max(attn); after min-max the max is 1
    # (or the input was constant, where the guard keeps it finite)
    result = (img_u8.astype(jnp.float32) * attn / jnp.maximum(jnp.max(attn), _FLT_EPSILON)).astype(jnp.uint8)
    attn_u8 = (attn * 255.0).astype(jnp.uint8)
    th, _ = otsu_binary_u8(result)
    th2, _ = otsu_binary_u8(img_u8)
    th3, _ = otsu_binary_u8(attn_u8)
    return th, th2, th3
