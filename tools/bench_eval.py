"""Labeled-eval throughput: img/s at 384^2, fp32 vs bf16, per-image vs batched.

Reproduces the BENCH.md "labeled eval" row on the real chip with synthetic
samples (the pipeline cost is weight- and content-independent). Times a
steady-state pass: one full validate() to compile, then a timed validate()
over the same samples.

Usage: python tools/bench_eval.py [--n 48] [--batch 8]
"""

import argparse
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import evaluation
from vit_ocm_wmsegmentation_tpu.models import vit


def synth_samples(n, size, gray_exact=True):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        img_u8 = (rng.random((size, size)) * 255).astype(np.uint8)
        s = types.SimpleNamespace(
            image=np.repeat((img_u8 / 255.0).astype(np.float32)[..., None], 3, -1),
            gray=img_u8,
            label=(rng.random((size, size)) > 0.5).astype(np.float32),
            crop_image=None, crop_gray=None, gray_exact=gray_exact,
        )
        out.append(s)
    return out


def run(params, cfg, samples, batch, dtype):
    # compile BOTH shapes the timed pass will dispatch: the full batch and
    # the remainder chunk (n % batch) — a fresh compile inside the timed
    # region would dominate every img/s number over the remote-compile link
    warm = samples[: 2 * max(batch, 1)]
    rem = len(samples) % max(batch, 1)
    if rem:
        warm = list(warm) + list(samples[:rem])
    evaluation.validate(params, cfg, warm, batch_size=batch, dtype=dtype)
    t0 = time.perf_counter()
    evaluation.validate(params, cfg, samples, batch_size=batch, dtype=dtype)
    dt = time.perf_counter() - t0
    return len(samples) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=384)
    args = ap.parse_args()

    cfg = vit.VIT_SMALL(patch_size=8)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    samples = synth_samples(args.n, args.size)
    samples_rgb = synth_samples(args.n, args.size, gray_exact=False)

    for label, smp, batch, dtype in (
        ("per-image fp32", samples, 1, jnp.float32),
        ("batched  f32-wire", samples_rgb, args.batch, jnp.float32),
        ("batched  u8-wire ", samples, args.batch, jnp.float32),
        ("batched  u8-wire bf16", samples, args.batch, jnp.bfloat16),
    ):
        ips = run(params, cfg, smp, batch, dtype)
        print(f"{label}: {ips:.1f} img/s ({args.n} x {args.size}^2, method=ours)",
              flush=True)


if __name__ == "__main__":
    main()
