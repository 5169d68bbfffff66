#!/usr/bin/env python
"""Sliding-window gigapixel mosaic inference with blended stitching.

TPU-native rebuild of the reference sw_processing.py: instead of 49
sequential single-tile forwards plus O(H*W) Python blending loops, the mosaic
stays HBM-resident — one batched tile gather, one vmapped ViT forward over
the tile batch, and the ramp-blended stitch as a fused overlap-add.
"""

import argparse
import os

import numpy as np
from PIL import Image

import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.cli import create_dir, imsave, load_model
from vit_ocm_wmsegmentation_tpu.ops.threshold import threshold_multiplicative


def parse_args():
    parser = argparse.ArgumentParser("Visualize Self-Attention maps")
    parser.add_argument("--arch", default="vit_small", type=str,
                        choices=["vit_tiny", "vit_small", "vit_base"])
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--image_path", required=True, type=str)
    parser.add_argument("--image_size", default=(1152, 1152), type=int, nargs="+")
    parser.add_argument("--window_size", default=384, type=int)
    parser.add_argument("--stride", default=128, type=int)
    parser.add_argument("--output_dir", default="temp/")
    parser.add_argument("--bf16", default=0, type=int,
                        help="run the ViT in bfloat16 (MXU-native, ~equal masks — "
                             "bf16-vs-f32 Dice > 0.99, see BENCH.md); 0 = float32 "
                             "like the reference")
    return parser.parse_args()


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    size = tuple(args.image_size) if len(args.image_size) == 2 else (args.image_size[0],) * 2
    params, cfg, _ = load_model(args.arch, args.patch_size, args.pretrained_weights, args.checkpoint_key)

    img = Image.open(args.image_path).convert("RGB").resize((size[1], size[0]))
    gray = np.asarray(img.convert("L"), np.uint8)
    create_dir(args.output_dir)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        params = pl.cast_params(params, jnp.bfloat16)
    mask, attn = pl.segment_mosaic(params, cfg, jnp.asarray(gray), args.window_size, args.stride,
                                   dtype=dtype)
    attn = np.asarray(attn)
    imsave(os.path.join(args.output_dir, "attention_map_sw.jpg"), attn)
    _, _, heatmap_otsu = threshold_multiplicative(jnp.asarray(gray), jnp.asarray(attn))
    imsave(os.path.join(args.output_dir, "otsu_sw_heatmap.jpg"), np.asarray(heatmap_otsu), cmap="gray")
    imsave(os.path.join(args.output_dir, "otsu_sw.jpg"), np.asarray(mask), cmap="gray")
    print(f"tiles processed in one fused graph; output in {args.output_dir}")


if __name__ == "__main__":
    main()
