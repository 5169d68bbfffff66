#!/usr/bin/env python
"""Supervised finetuning: LinearProbing head on a (pretrained) ViT.

TPU-native rebuild of the reference finetune.py: ViT-S/8 (12 blocks) +
2-layer PixelShuffle decoder trained with Dice loss on labeled OCM, Adam +
ReduceLROnPlateau, best-validation checkpointing, test pass with metrics and
image|GT|prediction triptychs. The reference hard-codes its args in main()
(finetune.py:366-383); we expose them as flags with the same defaults.
"""

import argparse
from glob import glob

import jax

from vit_ocm_wmsegmentation_tpu.cli import str2bool
from vit_ocm_wmsegmentation_tpu.models import probing
from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt
from vit_ocm_wmsegmentation_tpu.train.supervised import (
    SegLoader,
    split_reference,
    test_supervised,
    train_supervised,
)
from vit_ocm_wmsegmentation_tpu.utils.seeding import seeding


def parse_args():
    parser = argparse.ArgumentParser("LinearProbing finetune")
    parser.add_argument("--arch", default="vit_small", type=str)
    parser.add_argument("--patch_size", default=8, type=int)
    parser.add_argument("--image_size", default=384, type=int)
    parser.add_argument("--pretrained_weights", default="", type=str)
    parser.add_argument("--checkpoint_key", default="teacher", type=str)
    parser.add_argument("--image_path", required=True, type=str,
                        help="dataset root with images/ and labels/")
    parser.add_argument("--epochs", default=30, type=int)
    parser.add_argument("--batch_size", default=3, type=int)
    parser.add_argument("--base_lr", default=1e-4, type=float)
    parser.add_argument("--ratio", default=1.0, type=float)
    parser.add_argument("--layer_num", default=2, type=int, choices=[1, 2])
    parser.add_argument("--finetune", default=True, type=str2bool,
                        help="False freezes the encoder (probing only)")
    parser.add_argument("--name", default="ft", type=str)
    parser.add_argument("--H", default=None, type=int,
                        help="working size; defaults to --image_size")
    args = parser.parse_args()
    if args.H is None:
        args.H = args.image_size
    return args


def main():
    from vit_ocm_wmsegmentation_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    seeding(42)
    cfg = probing.finetune_vit_config(args.H, args.patch_size)
    params = probing.init(cfg, jax.random.PRNGKey(0), layer_num=args.layer_num)
    if args.pretrained_weights:
        try:
            params["encoder"] = ckpt.load_torch_checkpoint(args.pretrained_weights, cfg, args.checkpoint_key)
            print(f"Pretrained weights found at {args.pretrained_weights} and loaded")
        except Exception as e:
            print(f"could not load pretrained weights ({e}); using random encoder")

    images = sorted(glob(args.image_path + "/images/*"))
    labels = sorted(glob(args.image_path + "/labels/*"))
    (tr_x, tr_y), (va_x, va_y), (te_x, te_y) = split_reference(images, labels, "finetune", args.ratio)
    print(f"Dataset Size:\nTrain: {len(tr_x)} / {len(tr_y)} - Valid: {len(va_x)} / {len(va_y)}")

    frozen_encoder = params["encoder"] if not args.finetune else None

    def apply_fn(p, state, x, train):
        if frozen_encoder is not None:
            p = dict(p, encoder=jax.lax.stop_gradient(p["encoder"]))
        full = dict(p, state=state)
        y, new_state = probing.apply(full, cfg, x, layer_num=args.layer_num, train=train)
        return y, new_state

    state = params.pop("state")
    train_loader = SegLoader(tr_x, tr_y, args.H, args.batch_size, shuffle=True)
    valid_loader = SegLoader(va_x, va_y, args.H, args.batch_size)
    params, state, tl, vl = train_supervised(
        apply_fn, params, state, train_loader, valid_loader,
        epochs=args.epochs, lr=args.base_lr, checkpoint_path=f"files/{args.name}",
    )
    test_supervised(apply_fn, params, state, te_x, te_y, args.H, f"results/{args.name}")


if __name__ == "__main__":
    main()
