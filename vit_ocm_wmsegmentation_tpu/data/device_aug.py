"""Device-side SimMIM augmentation: the whole transform on the TPU.

The reference's training-time data path (data.py:189-253) runs per-image on
host CPU workers: torchvision RandomResizedCrop(scale=(0.67,1),
ratio=(3/4,4/3)) + random H/V flips + ToTensor + MaskGenerator. On this
repo's host (and any host whose cores can't keep up with the chip) that is
the MIM wall-clock bottleneck: device compute is ~1 s/epoch while host
augmentation takes tens of seconds (BENCH.md endurance-run note).

This module moves the entire transform into one jitted graph over the
decoded source batch:

* the 10-attempt crop-box sampler is torchvision's algorithm verbatim
  (vectorized: 10 draws, first valid wins, clamped-center fallback);
* crop + bilinear resize lowers to ``jax.image.scale_and_translate`` with
  antialiasing (PIL's BILINEAR box-resize antialiases on downscale too);
* flips are key-driven selects; the mask is a per-image device permutation
  with the reference's ratio-ceil count (data.py:163-186).

Documented delta: parity with the host path is *distributional*, not
bitwise — JAX and numpy PRNGs differ, and the resampling kernel differs
from PIL's at the subpixel level. The host path (data/datasets.py) remains
the default; enable with ``--opts DATA.DEVICE_AUG True`` (mim.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _fallback_box(h: int, w: int, ratio) -> tuple[int, int, int, int]:
    """torchvision's center-crop fallback at the clamped aspect (static)."""
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def sample_crop_box(key, h: int, w: int, scale=(0.67, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """One RandomResizedCrop box (i, j, ch, cw), int32 scalars.

    Vectorized torchvision sampler: 10 (area, aspect) draws, the first draw
    whose rounded box fits wins; otherwise the clamped-center fallback.
    """
    k_area, k_aspect, k_pos = jax.random.split(key, 3)
    ta = h * w * jax.random.uniform(k_area, (10,), minval=scale[0], maxval=scale[1])
    la = jax.random.uniform(k_aspect, (10,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(la)
    cws = jnp.round(jnp.sqrt(ta * aspect)).astype(jnp.int32)
    chs = jnp.round(jnp.sqrt(ta / aspect)).astype(jnp.int32)
    valid = (cws > 0) & (cws <= w) & (chs > 0) & (chs <= h)
    first = jnp.argmax(valid)  # index of the first True
    any_valid = jnp.any(valid)

    fi, fj, fch, fcw = _fallback_box(h, w, ratio)
    ch = jnp.where(any_valid, chs[first], fch)
    cw = jnp.where(any_valid, cws[first], fcw)
    u = jax.random.uniform(k_pos, (2,))
    # randint(0, h - ch + 1) with a dynamic bound: floor(U[0,1) * n)
    i = jnp.where(any_valid, jnp.floor(u[0] * (h - ch + 1)).astype(jnp.int32), fi)
    j = jnp.where(any_valid, jnp.floor(u[1] * (w - cw + 1)).astype(jnp.int32), fj)
    return i, j, ch, cw


def crop_resize_bilinear(img, i, j, ch, cw, out_size: int):
    """(H, W, C) -> (S, S, C): the box (i, j, ch, cw) resized with
    antialiased bilinear, box edges mapped to output edges (PIL box-resize
    semantics under the half-pixel-center convention)."""
    s = out_size
    sy = s / ch.astype(jnp.float32)
    sx = s / cw.astype(jnp.float32)
    # scale_and_translate samples input coord (o + 0.5)/scale - t/scale - 0.5
    # for output pixel o (half-pixel centers handled internally), so mapping
    # the box edge to the output edge needs only t = -start * scale
    ty = -i.astype(jnp.float32) * sy
    tx = -j.astype(jnp.float32) * sx
    return jax.image.scale_and_translate(
        img, (s, s, img.shape[-1]), (0, 1),
        jnp.stack([sy, sx]), jnp.stack([ty, tx]),
        method="linear", antialias=True,
    )


def random_mask(key, rand_size: int, mask_count: int, scale: int):
    """One MaskGenerator draw (data.py:163-186): permutation of the coarse
    grid, first mask_count cells masked, expanded x scale to the token grid."""
    tc = rand_size * rand_size
    perm = jax.random.permutation(key, tc)
    mask = jnp.zeros((tc,), jnp.int32).at[perm[:mask_count]].set(1)
    mask = mask.reshape(rand_size, rand_size)
    return jnp.repeat(jnp.repeat(mask, scale, axis=0), scale, axis=1)


@partial(jax.jit, static_argnames=("out_size", "mask_patch_size", "model_patch_size",
                                   "mask_ratio", "scale", "ratio"))
def simmim_augment(images, key, *, out_size: int, mask_patch_size: int,
                   model_patch_size: int, mask_ratio: float,
                   scale=(0.67, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """(B, H0, W0[, C]) sources + key -> ((B, S, S, 3) float32 aug,
    (B, g, g) int32 token mask), g = S // model_patch_size.

    One fused graph per batch: crop-box sampling, antialiased crop-resize,
    H/V flips (p=0.5 each), and the SimMIM mask draw. uint8 input is
    normalized on device (ToTensor /255) and a channelless (B, H0, W0)
    grayscale source is augmented once and broadcast to RGB at the end —
    the loader ships 12x fewer bytes than f32 RGB over the host link.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    grayscale = images.ndim == 3
    if grayscale:
        images = images[..., None]
    b, h0, w0, _ = images.shape
    s = out_size
    # mirror the host MaskGenerator's constructor asserts (mask_generator.py)
    # — a floored rand_size would return a wrong-shaped token mask and fail
    # as an opaque broadcast error deep inside the first train step
    if s % mask_patch_size:
        raise ValueError(
            f"image size {s} not divisible by mask_patch_size {mask_patch_size}")
    if mask_patch_size % model_patch_size:
        raise ValueError(
            f"mask_patch_size {mask_patch_size} not divisible by "
            f"model_patch_size {model_patch_size}")
    rand_size = s // mask_patch_size
    mask_count = int(math.ceil(rand_size * rand_size * mask_ratio))
    mscale = mask_patch_size // model_patch_size

    keys = jax.random.split(key, b)

    def one(img, k):
        k_box, k_fh, k_fv, k_mask = jax.random.split(k, 4)
        i, j, ch, cw = sample_crop_box(k_box, h0, w0, scale, ratio)
        out = crop_resize_bilinear(img, i, j, ch, cw, s)
        out = jnp.where(jax.random.bernoulli(k_fh), out[:, ::-1, :], out)
        out = jnp.where(jax.random.bernoulli(k_fv), out[::-1, :, :], out)
        mask = random_mask(k_mask, rand_size, mask_count, mscale)
        return out, mask

    x, mask = jax.vmap(one)(images, keys)
    if grayscale:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    return x, mask
