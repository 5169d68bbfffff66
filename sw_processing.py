#!/usr/bin/env python
"""Sliding-window gigapixel mosaic inference with blended stitching.

TPU-native rebuild of the reference sw_processing.py: instead of 49
sequential single-tile forwards plus O(H*W) Python blending loops, the mosaic
stays HBM-resident — one batched tile gather, one vmapped ViT forward over
the tile batch, and the ramp-blended stitch as a fused overlap-add.

``--image_path`` may also be a directory: every image in it is segmented as
a pipelined stream — a prefetch thread decodes and uploads mosaic i+2 while
the chip computes i+1 and the host writes back i, so neither the ~host-link
upload nor PNG encoding stalls the accelerator (serving mode; the reference
processes exactly one image per process, sw_processing.py:165-266).
"""

import argparse
import os
import time
from collections import deque
from glob import glob

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.cli import create_dir, imsave, imsave_fast, load_model
from vit_ocm_wmsegmentation_tpu.data.prefetch import prefetch
from vit_ocm_wmsegmentation_tpu.ops.threshold import min_max_normalize, threshold_multiplicative


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
    parser.add_argument("--writers", default=0, type=int,
                        help="directory mode: PNG writer threads (0 = auto, "
                             "min(4, cpu_count-1)); encode is the stream "
                             "bottleneck on few-core hosts (BENCH.md)")
    parser.add_argument("--save", default="all", choices=["all", "mask"],
                        help="directory mode: artifacts per mosaic; 'mask' "
                             "writes only otsu_sw.jpg (1/3 the encode + "
                             "wire bytes)")
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
                             "(ops/quant.py; Dice-parity-gated in "
                             "tests/test_quant.py and tools/probe_int8.py)")
    parser.add_argument("--streamed", default="auto", choices=["auto", "0", "1"],
                        help="route mosaics through the bounded-memory band-"
                             "streamed pipeline (segment_mosaic_streamed: "
                             "HBM-resident canvas, one dispatch per "
                             "band_chunk tile rows, identical numbers). "
                             "auto = streamed above %d MP, where the fused "
                             "graph's per-tile attention stack approaches "
                             "HBM limits (BENCH.md size scaling)"
                             % (pl.STREAM_AUTO_MP,))
    parser.add_argument("--band_chunk", default=None, type=int,
                        help="tile rows per dispatch in streamed mode "
                             "(default: pipeline.DEFAULT_BAND_CHUNK, the "
                             "on-chip-swept value)")
    parser.add_argument("--exact_stitch", default=0, type=int,
                        help="threshold the reference's re-stitched uint8 "
                             "mosaic bit-exactly (sw_processing.py:224-229 "
                             "semantics, incl. per-blend truncation) instead "
                             "of the original image (the better default; "
                             "PARITY.md documented delta)")
    parser.add_argument("--mesh", default=1, type=int,
                        help="on a multi-chip host, shard the tile axis "
                             "across all chips (pure-dp mesh through the "
                             "shard_map kernel islands — masks bit-equal to "
                             "single-chip, MULTICHIP_r04.json); 0 = force "
                             "single-chip")
    return parser.parse_args()


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    size = tuple(args.image_size) if len(args.image_size) == 2 else (args.image_size[0],) * 2
    params, cfg, _ = load_model(args.arch, args.patch_size, args.pretrained_weights, args.checkpoint_key)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        params = pl.cast_params(params, jnp.bfloat16)
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_quant

    set_infer_quant(args.quant)
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_mlp

    set_infer_mlp(args.infer_mlp)
    create_dir(args.output_dir)

    use_streamed = (args.streamed == "1"
                    or (args.streamed == "auto"
                        and size[0] * size[1] > pl.STREAM_AUTO_MP * 1e6))
    band_chunk = args.band_chunk if args.band_chunk else pl.DEFAULT_BAND_CHUNK

    # multi-chip by default, like mim.py:96 — a pure-dp mesh shards each
    # tile batch (fused path) / band tile row (streamed path) across chips
    # via the shard_map kernel islands; masks are bit-equal to single-chip
    # (certified every round in MULTICHIP_r*.json)
    from vit_ocm_wmsegmentation_tpu.parallel import make_mesh

    mesh = make_mesh() if args.mesh and len(jax.devices()) > 1 else None
    if mesh is not None:
        print(f"mesh: sharding tiles across {mesh.size} devices")

    def segment(gray_dev, with_heat=True):
        if use_streamed:
            mask, attn = pl.segment_mosaic_streamed(
                params, cfg, gray_dev, args.window_size, args.stride,
                dtype=dtype, exact_stitch=bool(args.exact_stitch),
                band_chunk=band_chunk, mesh=mesh)
        else:
            mask, attn = pl.segment_mosaic(params, cfg, gray_dev, args.window_size, args.stride,
                                           dtype=dtype, exact_stitch=bool(args.exact_stitch),
                                           mesh=mesh)
        if not with_heat:
            return mask, attn, None
        _, _, heatmap_otsu = threshold_multiplicative(gray_dev, attn)
        return mask, attn, heatmap_otsu

    # one artifact set per mosaic: (filename, cmap) for (attention, heatmap
    # Otsu, mask) — shared by the single-image and streaming writers
    artifacts = (("attention_map_sw.jpg", None),
                 ("otsu_sw_heatmap.jpg", "gray"),
                 ("otsu_sw.jpg", "gray"))

    def write(out_dir, mask, attn, heatmap_otsu, save=imsave):
        create_dir(out_dir)
        for (fname, cmap), arr in zip(artifacts, (attn, heatmap_otsu, mask)):
            save(os.path.join(out_dir, fname), np.asarray(arr), cmap=cmap)

    if not os.path.isdir(args.image_path):
        img = Image.open(args.image_path).convert("RGB").resize((size[1], size[0]))
        gray = jnp.asarray(np.asarray(img.convert("L"), np.uint8))
        write(args.output_dir, *segment(gray))
        how = ("band-streamed (bounded memory)" if use_streamed
               else "in one fused graph")
        print(f"tiles processed {how}; output in {args.output_dir}")
        return

    # serving mode: stream every mosaic in the folder through a 3-stage
    # software pipeline (decode+upload | compute | write-back), each stage
    # one mosaic ahead of the next — the chip never idles on IO
    paths = sorted(p for p in glob(os.path.join(args.image_path, "*"))
                   if p.lower().endswith((".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")))
    if not paths:
        raise SystemExit(f"no images found in {args.image_path}")

    def produce():
        for p in paths:  # runs on the prefetch thread: decode, resize, upload
            img = Image.open(p).convert("RGB").resize((size[1], size[0]))
            gray = np.asarray(img.convert("L"), np.uint8)
            yield os.path.splitext(os.path.basename(p))[0], jax.device_put(gray)

    mask_only = args.save == "mask"

    def segment_stream(gray_dev):
        # mask-only serving skips the heatmap-Otsu graph entirely
        mask, attn, heat = segment(gray_dev, with_heat=not mask_only)
        if mask_only:
            outs = (mask,)
        else:
            # quantize the attention map to viridis LUT indices ON DEVICE
            # (matplotlib's own 256-level quantization: floor(norm*256)
            # clipped) so the wire carries uint8, and write-back is a LUT
            # gather + PNG
            idx = jnp.clip(jnp.floor(min_max_normalize(attn) * 256.0), 0, 255).astype(jnp.uint8)
            outs = (mask, idx, heat)
        for a in outs:  # start device->host DMA now, behind the compute
            a.copy_to_host_async()
        return outs

    def write_stream(out_dir, mask, attn_idx=None, heat=None):
        if mask_only:
            create_dir(out_dir)
            imsave_fast(os.path.join(out_dir, "otsu_sw.jpg"), mask, cmap="gray")
            return
        write(out_dir, mask, attn_idx, heat, save=imsave_fast)

    from concurrent.futures import ThreadPoolExecutor

    if args.writers < 0:
        raise SystemExit(f"--writers must be >= 0, got {args.writers}")
    n_writers = args.writers or max(1, min(4, (os.cpu_count() or 2) - 1))
    writer = ThreadPoolExecutor(max_workers=n_writers)  # PNG encode off the dispatch path
    inflight = deque()  # (name, device results) dispatched but not written
    pending = deque()  # bounded writer backlog
    t0 = time.perf_counter()
    t_first = None
    for name, gray in prefetch(produce(), depth=2):
        inflight.append((name, segment_stream(gray)))  # async dispatch
        if len(inflight) > 1:
            done, outs = inflight.popleft()
            pending.append(writer.submit(write_stream, os.path.join(args.output_dir, done), *outs))
            while len(pending) > 2 * n_writers:
                pending.popleft().result()
            if t_first is None:
                t_first = time.perf_counter()
    while inflight:
        done, outs = inflight.popleft()
        pending.append(writer.submit(write_stream, os.path.join(args.output_dir, done), *outs))
    for f in pending:
        f.result()
    writer.shutdown()
    dt = time.perf_counter() - t0
    mp_one = size[0] * size[1] / 1e6
    mp = len(paths) * mp_one
    steady = ""
    if t_first is not None and len(paths) > 1:
        rate = (len(paths) - 1) * mp_one / (time.perf_counter() - t_first)
        steady = f" ({rate:.2f} MP/s steady-state after first-mosaic compile)"
    print(f"streamed {len(paths)} mosaics ({mp:.1f} MP) in {dt:.2f}s = "
          f"{mp / dt:.2f} MP/s incl. one-time compile{steady}; output in {args.output_dir}")


if __name__ == "__main__":
    main()
