"""Build the local MIM pretraining corpus for the trained-weights parity
runs (BENCH.md "trained-weights parity"; VERDICT r3 #5 error budget).

The reference pretrains on ~600 OCM tiles (sw_processing-cropped). This
image has exactly one real OCM image (the committed 800² example), so the
corpus is: that image plus a family of synthetic OCM-like 1152² mosaics
(same generator family as bench.py / tools/parity_fullscale.py — Gaussian
tissue texture + brighter white-matter blobs), all tiled to 224² with
stride 112 (the croping.py geometry halved to keep edge coverage).

Deterministic: seed 0..n_mosaics-1. ~600 tiles at the defaults.

Usage: python tools/make_pretrain_tiles.py [--out /tmp/mim_tiles]
"""

import argparse
import os

import numpy as np
from PIL import Image

REAL = ("/root/reference/Self-supervised_segmentation/images/"
        "brain_08_z43_roi02/img.png")


def synth_mosaic(seed: int, size: int = 1152) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.normal(110, 35, (size, size))
    # 2-4 bright blobs of varying geometry (white matter)
    for _ in range(int(rng.integers(2, 5))):
        y0, x0 = rng.integers(0, size - 200, 2)
        h, w = rng.integers(150, 700, 2)
        base[y0:y0 + h, x0:x0 + w] += float(rng.uniform(35, 70))
    return np.clip(base, 0, 255).astype(np.uint8)


def tile(img: np.ndarray, out_dir: str, prefix: str, win: int, stride: int):
    n = 0
    for y in range(0, img.shape[0] - win + 1, stride):
        for x in range(0, img.shape[1] - win + 1, stride):
            Image.fromarray(img[y:y + win, x:x + win]).save(
                os.path.join(out_dir, f"{prefix}_{y}_{x}.png"))
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mim_tiles")
    ap.add_argument("--n_mosaics", type=int, default=7)
    ap.add_argument("--win", type=int, default=224)
    ap.add_argument("--stride", type=int, default=112)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    total = 0
    if os.path.exists(REAL):
        real = np.asarray(Image.open(REAL).convert("L"))
        real3 = np.stack([real] * 3, -1)
        total += tile(real3, args.out, "real", args.win, args.stride)
    for s in range(args.n_mosaics):
        m = synth_mosaic(s)
        total += tile(np.stack([m] * 3, -1), args.out, f"syn{s}",
                      args.win, args.stride)
    print(f"wrote {total} tiles to {args.out}")


if __name__ == "__main__":
    main()
