#!/usr/bin/env python
"""Labeled evaluation of attention-based white-matter segmentation.

TPU-native rebuild of the reference eval.py (the paper's headline metric
path): same flags, same method choices, same per-image metric logging — with
the entire per-image pipeline fused on device.
"""

import argparse

import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import evaluation
from vit_ocm_wmsegmentation_tpu.cli import create_dir, load_model
from vit_ocm_wmsegmentation_tpu.data import build_eval_samples
from vit_ocm_wmsegmentation_tpu.utils.logger import create_logger
from vit_ocm_wmsegmentation_tpu.utils.seeding import seeding
from vit_ocm_wmsegmentation_tpu.utils.wandb_shim import get_wandb


def parse_args():
    parser = argparse.ArgumentParser("Visualize Self-Attention maps")
    parser.add_argument("--arch", default="vit_small", type=str,
                        choices=["vit_tiny", "vit_small", "vit_base"])
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--eval_dataset_path", default="", type=str)
    parser.add_argument("--image_size", default=384, type=int, nargs="+")
    parser.add_argument("--output_dir", default="results/eval/")
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument("--crop", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--wandb", default=False)
    parser.add_argument("--tag", default="k-means")
    parser.add_argument("--method", default="ours",
                        help="ours, otsu, k-means, k-means_ours, chan-vese, "
                             "chan-vese_ours, heatmap_threshold, k-means_feature_clustering")
    parser.add_argument("--median_filter", default=1, type=int)
    # parsed-but-never-read flags the reference's eval.py also accepts
    # (eval.py:38-45 — dead there too); kept so reference users' invocation
    # scripts remain drop-in
    parser.add_argument("--region_query", type=bool, default=False, help=argparse.SUPPRESS)
    parser.add_argument("--query_analysis", type=bool, default=False, help=argparse.SUPPRESS)
    parser.add_argument("--query_rate", type=int, default=10, help=argparse.SUPPRESS)
    parser.add_argument("--save_query", type=bool, default=False, help=argparse.SUPPRESS)
    parser.add_argument("--save_feature", type=bool, default=False, help=argparse.SUPPRESS)
    parser.add_argument("--bf16", default=0, type=int,
                        help="run the ViT in bfloat16 (MXU-native; attention "
                             "maps still leave in f32 and thresholds/metrics "
                             "are unchanged). 0 = float32 like the reference")
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
                             "projection/MLP matmuls as dynamic W8A8 dots on "
                             "the MXU's double-rate int8 path (ops/quant.py; "
                             "trained-weights metric deltas <= 0.0064, "
                             "tools/quant_accuracy.py)")
    return parser.parse_args()


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    create_dir(args.output_dir)
    logger = create_logger(args.output_dir, name=f"{args.arch}_{args.patch_size}")
    seeding(0)
    wandb, use_wandb = get_wandb(bool(args.wandb), output_dir=args.output_dir)
    if use_wandb:
        wandb.init(project="temp2", name=f"{args.method}_{args.crop}", config=vars(args))

    image_size = args.image_size[0] if isinstance(args.image_size, list) else args.image_size
    if not args.eval_dataset_path:
        raise SystemExit("Please use the `--eval_dataset_path` argument to indicate the dataset path.")
    samples = build_eval_samples(args.eval_dataset_path, image_size, crop=int(args.crop))
    print(f"images: {len(samples)}")

    params, cfg, _ = load_model(args.arch, args.patch_size, args.pretrained_weights, args.checkpoint_key)
    logger.info(f"Creating model:{args.arch}/{args.patch_size}")
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_quant

    set_infer_quant(args.quant)
    from vit_ocm_wmsegmentation_tpu.models.vit import set_infer_mlp

    set_infer_mlp(args.infer_mlp)
    acc, f1, loss = evaluation.validate(
        params, cfg, samples, method=args.method, crop=args.crop,
        median_size=int(args.median_filter), logger=logger,
        wandb=wandb if use_wandb else None, batch_size=int(args.batch_size),
        dtype=jnp.bfloat16 if int(args.bf16) else jnp.float32,
    )
    if use_wandb:
        wandb.finish()
    return acc, f1, loss


if __name__ == "__main__":
    main()
