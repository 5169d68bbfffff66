#!/usr/bin/env python
"""Pseudo-ground-truth distillation: frozen ViT teacher -> UNet student.

TPU-native rebuild of the reference PGT.py: the teacher's Otsu-thresholded
attention masks are generated *inside the device graph* for the whole batch
(one fused call replaces the reference's per-image GPU->CPU loop,
PGT.py:57-86); the UNet student trains on them with Dice loss.
"""

import argparse
from glob import glob

import jax

from vit_ocm_wmsegmentation_tpu.models import probing, unet
from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt
from vit_ocm_wmsegmentation_tpu.train.supervised import (
    SegLoader,
    split_reference,
    teacher_pseudo_labels,
    test_supervised,
    train_supervised,
)
from vit_ocm_wmsegmentation_tpu.utils.seeding import seeding


def parse_args():
    parser = argparse.ArgumentParser("Pseudo-ground-truth UNet distillation")
    parser.add_argument("--arch", default="vit_small", type=str)
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--image_path", required=True, type=str,
                        help="folder with images/ (labels/ optional, used for test metrics)")
    parser.add_argument("--epochs", default=30, type=int)
    parser.add_argument("--batch_size", default=3, type=int)
    parser.add_argument("--base_lr", default=1e-4, type=float)
    parser.add_argument("--ratio", default=1.0, type=float)
    parser.add_argument("--H", default=384, type=int)
    parser.add_argument("--name", default="pgt", type=str)
    parser.add_argument("--rand", action="store_true",
                        help="average a random head subset per image (PGT.py rand mode)")
    return parser.parse_args()


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    seeding(42)
    # frozen 12-block teacher (build_finetune_model, model.py:176-193)
    tcfg = probing.finetune_vit_config(args.H, args.patch_size)
    if args.pretrained_weights:
        teacher = ckpt.load_torch_checkpoint(args.pretrained_weights, tcfg, args.checkpoint_key)
        print(f"Teacher weights loaded from {args.pretrained_weights}")
    else:
        from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod

        teacher = vit_mod.init(tcfg, jax.random.PRNGKey(0))
        print("There is no reference weights available for this model => We use random weights.")

    images = sorted(glob(args.image_path + "/images/*"))
    labels = sorted(glob(args.image_path + "/labels/*")) or None
    (tr_x, _), (va_x, _), (te_x, te_y) = split_reference(images, labels or images, "pgt", args.ratio)
    print(f"Dataset Size:\nTrain: {len(tr_x)} - Valid: {len(va_x)}")

    params, state = unet.init(jax.random.PRNGKey(1))

    def apply_fn(p, s, x, train):
        return unet.apply(p, s, x, train=train)

    rng_holder = [jax.random.PRNGKey(7)]

    def pseudo_fn(x):
        if not args.rand:
            return teacher_pseudo_labels(teacher, tcfg, x)
        rng_holder[0], sub = jax.random.split(rng_holder[0])
        return teacher_pseudo_labels(teacher, tcfg, x, sub)

    train_loader = SegLoader(tr_x, None, args.H, args.batch_size, shuffle=True)
    valid_loader = SegLoader(va_x, None, args.H, args.batch_size)
    params, state, tl, vl = train_supervised(
        apply_fn, params, state, train_loader, valid_loader,
        epochs=args.epochs, lr=args.base_lr, checkpoint_path=f"files/{args.name}",
        pseudo_label_fn=pseudo_fn,
    )
    te_labels = te_y if labels else [None] * len(te_x)
    # the reference's PGT test loop resizes GT masks with cv2's default
    # INTER_LINEAR (PGT.py:339), unlike finetune's INTER_NEAREST
    test_supervised(apply_fn, params, state, te_x, te_labels, args.H, f"results/{args.name}",
                    pseudo_label_fn=pseudo_fn, mask_nearest=False)


if __name__ == "__main__":
    main()
