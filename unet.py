#!/usr/bin/env python
"""Fully-supervised UNet baseline on labeled OCM.

TPU-native rebuild of the reference unet.py (which runs at module level with
globals, unet.py:19-41,460-470): classic 4-level UNet, Dice loss, Adam 1e-4,
150 epochs, batch 8, 25/5/30+ split, triptych test outputs. Flags replace
the module globals; defaults match.
"""

import argparse
from glob import glob

import jax

from vit_ocm_wmsegmentation_tpu.models import unet
from vit_ocm_wmsegmentation_tpu.train.supervised import (
    SegLoader,
    split_reference,
    test_supervised,
    train_supervised,
)
from vit_ocm_wmsegmentation_tpu.utils.seeding import seeding


def parse_args():
    parser = argparse.ArgumentParser("UNet supervised baseline")
    parser.add_argument("--image_path", required=True, type=str)
    parser.add_argument("--H", default=512, type=int)
    parser.add_argument("--W", default=512, type=int)
    parser.add_argument("--ratio", default=1.0, type=float)
    parser.add_argument("--epochs", default=150, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--base_lr", default=1e-4, type=float)
    parser.add_argument("--name", default="unet", type=str)
    return parser.parse_args()


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    seeding(42)
    images = sorted(glob(args.image_path + "/images/*"))
    labels = sorted(glob(args.image_path + "/labels/*"))
    (tr_x, tr_y), (va_x, va_y), (te_x, te_y) = split_reference(images, labels, "unet", args.ratio)
    print(f"Dataset Size:\nTrain: {len(tr_x)} / {len(tr_y)} - Valid: {len(va_x)} / {len(va_y)}")

    params, state = unet.init(jax.random.PRNGKey(0))

    def apply_fn(p, s, x, train):
        return unet.apply(p, s, x, train=train)

    size = (args.H, args.W)
    train_loader = SegLoader(tr_x, tr_y, size, args.batch_size, shuffle=True)
    valid_loader = SegLoader(va_x, va_y, size, args.batch_size)
    params, state, tl, vl = train_supervised(
        apply_fn, params, state, train_loader, valid_loader,
        epochs=args.epochs, lr=args.base_lr, checkpoint_path=f"files/{args.name}",
    )
    # the reference's unet test loop resizes GT masks with cv2's default
    # INTER_LINEAR (unet.py:390), unlike finetune's INTER_NEAREST
    test_supervised(apply_fn, params, state, te_x, te_y, size, f"results/{args.name}",
                    mask_nearest=False)


if __name__ == "__main__":
    main()
