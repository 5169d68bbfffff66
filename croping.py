#!/usr/bin/env python
"""Offline tiler: split a folder of images into non-overlapping square crops
on disk (rebuild of croping.py:13-37)."""

import argparse
import os
from glob import glob

from PIL import Image


def parse_args():
    parser = argparse.ArgumentParser("Offline image tiler")
    parser.add_argument("--image_path", required=True, type=str)
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--crop_size", default=384, type=int)
    return parser.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    if os.path.isfile(args.image_path):  # convenience over the reference:
        paths = [args.image_path]        # a single file tiles that file
    else:
        paths = sorted(p for p in glob(os.path.join(args.image_path, "*"))
                       if p.lower().endswith((".jpg", ".png")))
        if not paths:
            raise SystemExit(f"no .jpg/.png images found in {args.image_path}")
    count = 0
    for path in paths:
        img = Image.open(path)
        name = os.path.basename(path)[:-4]
        w, h = img.size
        c = args.crop_size
        # ceil + min-clamped boxes (croping.py:21-36): partial edge crops are
        # KEPT (smaller than crop_size), x-index first, .jpg output
        for i in range(-(-w // c)):
            for j in range(-(-h // c)):
                crop = img.crop((i * c, j * c, min((i + 1) * c, w), min((j + 1) * c, h)))
                crop.save(os.path.join(args.output_dir, f"{name}_{i}_{j}.jpg"))
                count += 1
    print(f"wrote {count} crops from {len(paths)} images to {args.output_dir}")


if __name__ == "__main__":
    main()
