#!/usr/bin/env python
"""Swin-Tiny brain-region classification on the Allen dataset.

TPU-native rebuild of the reference Allen_data_Backbone/train.py: instead of
the HF torch Trainer, the JAX Swin (models/swin.py) trains with a jitted
AdamW loop (lr 5e-5, linear warmup 10%, grad accumulation 4, 3 epochs,
per-epoch accuracy, keep-best). Supports pretrained initialization by
converting the HF `microsoft/swin-tiny-patch4-window7-224` torch weights
(offline: falls back to from-scratch, the reference's SwinModel(config) arm).

Data: an imagefolder — <data_path>/<class_name>/*.png|jpg. The reference's
80/20 random split (train_test_split(test_size=0.2)) is reproduced with a
fixed seed.
"""

import argparse
import json
import os
import sys
from glob import glob

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from vit_ocm_wmsegmentation_tpu.models import swin
from vit_ocm_wmsegmentation_tpu.train.classifier import train_classifier


def get_args():
    parser = argparse.ArgumentParser(description="Train a model on Allen data")
    parser.add_argument("--data_path", type=str, required=True,
                        help="imagefolder root: <root>/<class>/*.png")
    parser.add_argument("--model_name", type=str, default="microsoft/swin-tiny-patch4-window7-224")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--from_scratch", action="store_true",
                        help="skip pretrained init (the reference's SwinModel(config) arm)")
    parser.add_argument("--amp", action="store_true",
                        help="bf16 compute / f32 master mixed precision "
                             "(the repo-wide MIM AMP rule)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", type=str, default="swin_allen_output",
                        help="best checkpoint + history destination "
                             "(the reference's trainer.save_model/save_metrics)")
    return parser.parse_args()


def load_imagefolder(root):
    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    label2id = {c: i for i, c in enumerate(classes)}
    samples = []
    for c in classes:
        for p in sorted(glob(os.path.join(root, c, "*"))):
            samples.append((p, label2id[c]))
    return samples, classes


def make_batches(samples, batch_size, image_size, *, train, seed):
    def gen(epoch):
        rng = np.random.default_rng((seed, epoch, int(train)))
        order = rng.permutation(len(samples)) if train else np.arange(len(samples))
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            xs, ys = [], []
            for i in idx:
                path, label = samples[i]
                img = Image.open(path).convert("RGB").resize((image_size, image_size))
                if train and rng.random() < 0.5:
                    img = img.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
                xs.append(np.asarray(img, np.float32) / 255.0)
                ys.append(label)
            yield np.stack(xs), np.asarray(ys, np.int32)

    return gen


def main():
    args = get_args()
    samples, classes = load_imagefolder(args.data_path)
    print(f"{len(samples)} images, {len(classes)} classes: {classes}")
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(samples))
    n_val = int(len(samples) * 0.2)
    val = [samples[i] for i in order[:n_val]]
    train = [samples[i] for i in order[n_val:]]

    cfg = swin.SwinConfig(img_size=args.image_size, num_classes=len(classes))
    params = None
    if not args.from_scratch:
        try:
            import torch
            from transformers import AutoModelForImageClassification

            hf = AutoModelForImageClassification.from_pretrained(
                args.model_name, num_labels=len(classes), ignore_mismatched_sizes=True
            )
            params = swin.params_from_hf(hf.state_dict(), cfg)
            print(f"initialized from {args.model_name}")
        except Exception as e:
            print(f"pretrained init unavailable ({type(e).__name__}); training from scratch")
    if params is None:
        params = swin.init(cfg, jax.random.PRNGKey(args.seed))

    def apply_fn(p, x):
        return swin.apply(p, cfg, x)

    steps = max(len(train) // args.batch_size, 1)
    best, history = train_classifier(
        apply_fn, params,
        make_batches(train, args.batch_size, args.image_size, train=True, seed=args.seed),
        make_batches(val, args.batch_size, args.image_size, train=False, seed=args.seed),
        epochs=args.epochs, lr=5e-5, grad_accum=4, steps_per_epoch=steps,
        amp=args.amp,
    )
    print("final:", history[-1])
    # persist like the reference (train.py:165-173 trainer.save_model +
    # save_metrics): best params as an orbax checkpoint + history JSON
    from vit_ocm_wmsegmentation_tpu.train.checkpoint import save_checkpoint

    path = save_checkpoint(args.output_dir, 0, {"params": best})
    with open(os.path.join(args.output_dir, "history.json"), "w") as f:
        json.dump({"history": history, "classes": classes}, f, indent=2)
    print(f"saved best checkpoint to {path}")


if __name__ == "__main__":
    main()
