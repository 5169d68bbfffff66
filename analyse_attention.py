#!/usr/bin/env python
"""Visualize self-attention maps of a (DINO-pretrained) ViT on OCM images.

TPU-native rebuild of the reference entry point
(/root/reference/Self-supervised_segmentation/analyse_attention.py): same
flags, same output files (img.png, attn-head{j}.png, attn-average.png,
result.png, OTSU_th_*.png, optional per-query maps / feature dumps), with the
whole attention -> smooth -> threshold chain fused into one jitted XLA graph
instead of a per-image GPU->CPU round trip.
"""

import argparse
import os
import time
from glob import glob

import numpy as np
from PIL import Image

import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.cli import create_dir, imsave, load_model, save_threshold_outputs
from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.ops import stitch as st
from vit_ocm_wmsegmentation_tpu.ops.filters import median_filter
from vit_ocm_wmsegmentation_tpu.ops.morphology import get_rois, region_centroids
from vit_ocm_wmsegmentation_tpu.ops.resize import resize_linear_cv2, smooth_attention, upsample_nearest
from vit_ocm_wmsegmentation_tpu.ops.threshold import yen_binary_u8


def parse_args():
    parser = argparse.ArgumentParser("Visualize Self-Attention maps")
    parser.add_argument("--arch", default="vit_small", type=str,
                        choices=["vit_tiny", "vit_small", "vit_base"])
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--image_path", default=None, type=str)
    parser.add_argument("--image_size", default=(384, 384), type=int, nargs="+")
    parser.add_argument("--output_dir", default="results/attention/")
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument("--crop", type=int, default=1, help="Amount of croping (4 or 16)")
    parser.add_argument("--window_stride", type=int, default=0)
    parser.add_argument("--region_query", type=bool, default=False)
    parser.add_argument("--query_analysis", type=bool, default=False)
    parser.add_argument("--query_rate", type=int, default=10)
    parser.add_argument("--save_query", type=bool, default=False)
    parser.add_argument("--save_feature", type=bool, default=False)
    parser.add_argument("--infer_mlp", default="auto",
                        choices=["auto", "none", "kernel", "lnout"],
                        help="inference MLP dispatch: auto = the measured-"
                             "best shipped route (the cross-layer fused "
                             "Pallas block, 13.34 vs 12.10 MP/s — BENCH.md "
                             "r5); none = stock XLA (exact-erf masks); "
                             "kernel/lnout select a route explicitly "
                             "(models/vit.set_infer_mlp)")
    parser.add_argument("--quant", default="none", choices=["none", "int8"],
                        help="inference quantization: int8 runs the "
                             "projection/MLP matmuls as dynamic W8A8 dots "
                             "on the MXU's double-rate int8 path "
                             "(ops/quant.py)")
    return parser.parse_args()


def _load_inputs(path, size_hw):
    """(model input f32 (1,H,W,3) via BILINEAR resize, gray u8 via BICUBIC+L)
    — the two resize paths of the reference (:102-106, :118-122)."""
    img = Image.open(path).convert("RGB")
    model_in = np.asarray(
        img.resize((size_hw[1], size_hw[0]), Image.Resampling.BILINEAR), np.float32
    ) / 255.0
    gray = np.asarray(
        img.resize((size_hw[1], size_hw[0]), Image.Resampling.BICUBIC).convert("L"), np.uint8
    )
    return model_in[None], gray


def analyse_single(args, params, cfg, img_path):
    size = tuple(args.image_size) if len(args.image_size) == 2 else (args.image_size[0],) * 2
    x, gray = _load_inputs(img_path, size)
    image_name = os.path.basename(img_path).rsplit(".", 1)[0]
    outdir = os.path.join(args.output_dir, image_name)
    create_dir(outdir)

    heads = np.asarray(pl.attention_heads(params, cfg, jnp.asarray(x)))[0]  # (nh, H, W)
    avg = heads.mean(axis=0)
    avg = np.asarray(median_filter(jnp.asarray(avg), 1))

    # normalized input image, like torchvision save_image(normalize=True)
    disp = x[0]
    disp = (disp - disp.min()) / max(disp.max() - disp.min(), 1e-12)
    imsave(os.path.join(outdir, "img.png"), disp)

    for j in range(heads.shape[0]):
        imsave(os.path.join(outdir, f"attn-head{j}.png"), heads[j])

    if args.save_feature:
        feats = vit.last_block_key_features(params, cfg, jnp.asarray(x))  # (1, gh, gw, D)
        up = resize_linear_cv2(jnp.moveaxis(feats[0], -1, 0), size)  # (D, H, W)
        fdir = os.path.join(outdir, "features")
        create_dir(fdir)
        up = np.asarray(up)
        for f in range(1, up.shape[0]):
            imsave(os.path.join(fdir, f"{f}.png"), up[f], cmap="gray")

    if args.threshold is not None:
        smoothed = np.asarray(smooth_attention(jnp.asarray(avg[:: cfg.patch_size, :: cfg.patch_size]), cfg.patch_size, size))
        imsave(os.path.join(outdir, "attn-average.png"), smoothed)
        save_threshold_outputs(outdir, gray, smoothed)

        gh, gw = size[0] // cfg.patch_size, size[1] // cfg.patch_size
        if args.region_query:
            binary = np.asarray(yen_binary_u8(jnp.asarray(gray)))
            imsave(os.path.join(outdir, "YEN_th.png"), binary, cmap="gray")
            labels = get_rois(binary)
            points = region_centroids(labels)
            print(f"Number of objects after morphology cleaning: {labels.max()}")
            if not points:
                print("No query points found.")
            else:
                # reference query index: x//p * gw + y//p (analyse_attention.py:192)
                # — note the reference transposes row/col AND omits the +1 CLS
                # offset; both quirks are replicated for parity
                queries = [int(px // cfg.patch_size) * gw + int(py // cfg.patch_size) for px, py in points]
                queries = [min(q, gh * gw) for q in queries]
                rows = vit.query_attention_rows(params, cfg, jnp.asarray(x), jnp.asarray(queries))
                rows = np.asarray(rows)[0, :, :, 1:]  # (nh, Q, N)
                maps = rows.mean(axis=0).reshape(len(queries), gh, gw)
                maps = np.repeat(np.repeat(maps, cfg.patch_size, 1), cfg.patch_size, 2)
                if args.save_query:
                    qdir = os.path.join(outdir, "queries")
                    create_dir(qdir)
                    for q in range(len(queries)):
                        imsave(os.path.join(qdir, f"attn-average-query-{q}.png"), maps[q])
                avg_q = maps.mean(axis=0)
                imsave(os.path.join(outdir, "attn-average-queried.png"), avg_q)
                med = np.asarray(median_filter(jnp.asarray(avg_q), 1))
                imsave(os.path.join(outdir, "attn-average-queried-median.png"), med)
                smooth_q = np.asarray(
                    smooth_attention(jnp.asarray(med[:: cfg.patch_size, :: cfg.patch_size]), cfg.patch_size, size)
                )
                save_threshold_outputs(outdir, gray, smooth_q, name="attn-average-queried-threshold")

        if args.query_analysis:
            adir = os.path.join(outdir, "analysis")
            create_dir(adir)
            queries = []
            # replicates analyse_attention.py:232-234 exactly, including its
            # square-only row stride: the reference's `w_featmap` is the ROW
            # grid (img.shape[-2]//patch) despite the name, so query =
            # i*gh*rate + j*rate — for non-square inputs the reference
            # under/over-strides identically
            for i in range(0, gh // args.query_rate):
                for j in range(0, gw // args.query_rate):
                    queries.append(i * gh * args.query_rate + j * args.query_rate)
            if not queries:
                # query_rate > grid: the reference's loops run zero times and
                # it writes nothing; jnp.asarray([]) would be a float indexer
                return
            rows = vit.query_attention_rows(params, cfg, jnp.asarray(x), jnp.asarray(queries))
            rows = np.asarray(rows)[0, :, :, 1:].mean(axis=0).reshape(len(queries), gh, gw)
            for q, qidx in enumerate(queries):
                imsave(os.path.join(adir, f"attn-average-{qidx}.png"), rows[q])


def analyse_croped(args, params, cfg, img_path):
    size = tuple(args.image_size) if len(args.image_size) == 2 else (args.image_size[0],) * 2
    g = int(np.sqrt(args.crop))
    crop_hw = (size[0] // g, size[1] // g)
    img = Image.open(img_path).convert("RGB").resize((size[1], size[0]))
    image_name = os.path.basename(img_path).rsplit(".", 1)[0]
    outdir = os.path.join(args.output_dir, image_name, f"croped_{args.crop}")
    create_dir(outdir)

    crops = []
    for i in range(g):
        for j in range(g):
            box = (j * crop_hw[1], i * crop_hw[0], (j + 1) * crop_hw[1], (i + 1) * crop_hw[0])
            c = img.crop(box).resize((crop_hw[1], crop_hw[0]), Image.Resampling.BILINEAR)
            crops.append(np.asarray(c, np.float32) / 255.0)
    batch = jnp.asarray(np.stack(crops))  # (T, h, w, 3)
    grids = vit.cls_attention_grid(params, cfg, batch)  # (T, nh, gh, gw)
    maps = np.asarray(upsample_nearest(jnp.mean(grids, axis=1), cfg.patch_size))  # (T, h, w)
    recon = np.asarray(st.concat_crops(jnp.asarray(maps)))

    gray = np.asarray(
        Image.open(img_path).convert("RGB").resize((size[1], size[0]), Image.Resampling.BICUBIC).convert("L"),
        np.uint8,
    )
    Image.fromarray(gray).save(os.path.join(outdir, "img.png"))
    print("img.png saved.")
    if args.threshold is not None:
        smoothed = np.asarray(
            smooth_attention(jnp.asarray(recon[:: cfg.patch_size, :: cfg.patch_size]), cfg.patch_size, size)
        )
        imsave(os.path.join(outdir, "attn-average.png"), smoothed)
        save_threshold_outputs(outdir, gray, smoothed)


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    if isinstance(args.image_size, int):
        args.image_size = [args.image_size, args.image_size]
    if len(args.image_size) == 1:
        args.image_size = [args.image_size[0]] * 2
    params, cfg, _ = load_model(args.arch, args.patch_size, args.pretrained_weights, args.checkpoint_key)
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_quant

    set_infer_quant(args.quant)
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_mlp

    set_infer_mlp(args.infer_mlp)

    if args.image_path is None:
        raise SystemExit("Please use the `--image_path` argument to indicate the path of the image.")
    paths = sorted(glob(args.image_path)) if os.path.isfile(args.image_path) else sorted(glob(args.image_path + "/*.jpg"))
    if not paths:
        raise SystemExit(f"no images found at {args.image_path}")

    start = time.time()
    for p in paths:
        if args.crop > 1 or args.window_stride > 0:
            # the reference's window_stride is vestigial: Croped_Dataset
            # ignores it (its sliding-window call is commented out,
            # analyse_attention.py:262) and runs the grid path with
            # crop_rate sqrt(crop) — including crop==1 as a single "crop".
            # The real sliding window lives in sw_processing.py.
            if args.crop not in (1, 4, 16):
                print("crop must be 1, 4 or 16")
            else:
                analyse_croped(args, params, cfg, p)
        else:
            analyse_single(args, params, cfg, p)
    dt = time.time() - start
    print(f"Execution time: {int(dt // 60)}m {int(dt % 60)}s")


if __name__ == "__main__":
    main()
