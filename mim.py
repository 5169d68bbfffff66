#!/usr/bin/env python
"""Masked-image-modeling pretraining of the ViT on OCM patches.

TPU-native rebuild of the reference mim.py: same flags and config keys, with
the train step (fwd + bwd + clip + AdamW) compiled to one XLA graph and
batches data-parallel over the device mesh instead of nn.DataParallel.
"""

import argparse

import jax

from vit_ocm_wmsegmentation_tpu import evaluation
from vit_ocm_wmsegmentation_tpu.data import build_eval_samples, build_simmim_loader
from vit_ocm_wmsegmentation_tpu.parallel import make_mesh
from vit_ocm_wmsegmentation_tpu.train.mim_trainer import train_mim
from vit_ocm_wmsegmentation_tpu.utils.config import get_config
from vit_ocm_wmsegmentation_tpu.utils.logger import create_logger
from vit_ocm_wmsegmentation_tpu.utils.seeding import seeding
from vit_ocm_wmsegmentation_tpu.utils.wandb_shim import get_wandb


def parse_option():
    parser = argparse.ArgumentParser("MIM Pretraining")
    parser.add_argument("--opts", default=None, nargs="+",
                        help="Modify config options by adding 'KEY VALUE' pairs.")
    parser.add_argument("--arch", default="vit_small", type=str,
                        choices=["vit_tiny", "vit_small", "vit_base"])
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--image_path", default="", type=str)
    parser.add_argument("--image_size", default=384, type=int)
    parser.add_argument("--output_dir", default="output/mim/", type=str)
    parser.add_argument("--output", default="output", type=str)
    parser.add_argument("--epochs", default=30, type=int)
    parser.add_argument("--warmup_epochs", default=20, type=int)
    parser.add_argument("--num_workers", default=1, type=int)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--mask_patch_size", default=16, type=int)
    parser.add_argument("--mask_ratio", default=0.5, type=float)
    parser.add_argument("--tag", default="AM", type=str)
    parser.add_argument("--wandb", default=False)
    parser.add_argument("--loss_operation", default="max", type=str)
    parser.add_argument("--eval_dataset_path", default="", type=str)
    parser.add_argument("--crop", type=int, default=1)
    parser.add_argument("--median_filter", type=int, default=1)
    parser.add_argument("--roi_masking", default=False, type=bool)
    parser.add_argument("--early_stopping", default=False, type=bool)
    args = parser.parse_args()
    return get_config(args)


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    cfg = parse_option()
    logger = create_logger(cfg.DATA.OUTPUT_DIR, name=f"{cfg.MODEL.NAME}_{cfg.MODEL.PATCH_SIZE}")
    seeding(cfg.SEED)
    wandb, use_wandb = get_wandb(bool(cfg.WANDB), output_dir=cfg.DATA.OUTPUT_DIR)
    if use_wandb:
        wandb.init(project="mim", name=f"{cfg.TAG}_{cfg.DATA.IMG_SIZE}_{cfg.DATA.BATCH_SIZE}B", config=dict(cfg))

    device_aug = cfg.DATA.DEVICE_AUG and not cfg.roi_masking
    if cfg.DATA.DEVICE_AUG and not device_aug:
        logger.warning("DATA.DEVICE_AUG ignored: roi_masking needs host CC labeling, "
                       "falling back to the host augmentation loader")
    if device_aug:
        # the whole SimMIM transform runs on device (data/device_aug.py);
        # the host only decodes
        from vit_ocm_wmsegmentation_tpu.data import build_simmim_device_loader

        loader = build_simmim_device_loader(
            cfg.DATA.IMAGE_PATH, cfg.DATA.BATCH_SIZE, cfg.DATA.IMG_SIZE,
            cfg.DATA.MASK_PATCH_SIZE, cfg.MODEL.PATCH_SIZE, cfg.DATA.MASK_RATIO,
            seed=cfg.SEED,
        )
    else:
        loader = build_simmim_loader(
            cfg.DATA.IMAGE_PATH, cfg.DATA.BATCH_SIZE, cfg.DATA.IMG_SIZE,
            cfg.DATA.MASK_PATCH_SIZE, cfg.MODEL.PATCH_SIZE, cfg.DATA.MASK_RATIO,
            roi_masking=cfg.roi_masking, seed=cfg.SEED,
        )
    logger.info(f"Creating model:{cfg.MODEL.NAME}/{cfg.MODEL.PATCH_SIZE}")

    eval_fn = None
    if cfg.eval_dataset_path:
        samples = build_eval_samples(cfg.eval_dataset_path, cfg.DATA.IMG_SIZE, crop=int(cfg.crop))

        def eval_fn(params, vit_cfg, epoch):
            evaluation.validate(params, vit_cfg, samples, method=cfg.method,
                                crop=cfg.crop, median_size=int(cfg.median_filter),
                                logger=logger, wandb=wandb if use_wandb else None, epoch=epoch)

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    train_mim(cfg, loader, eval_fn, mesh=mesh, logger=logger, use_wandb=use_wandb,
              wandb=wandb if use_wandb else None)
    if use_wandb:
        wandb.finish()


if __name__ == "__main__":
    main()
