"""A/B the inference-path fused-MLP Pallas block on the 1152² mosaic graph.

Motivation (r5 trace, tools/trace_ops.py mosaic): the stock inference MLP
compiles to one 3.46 ms/layer kOutput fusion — 34.7 ms (32 %) of the
109.3 ms mosaic — against a ~1.6 ms matmul floor at the chip's measured
180 TF/s dense rate; the gap is the (R, 1536) hidden's HBM round-trip plus
the unoverlapped LN/GELU tail. models/vit.INFER_MLP_KERNEL routes the
block through ops/fused_mlp.fused_mlp_block's forward (want=None), which
keeps h1 in VMEM and runs the VPU tail under the MXU dots.

Methodology: bench.py's — chained dispatches (in-graph xor feedback),
min over repeats, scalar sync. Both arms run in ONE process (the knob is
read at trace time; each arm jits a fresh closure). The accuracy gate
compares the two arms' masks (the kernel carries Eigen's rational erf —
|err| ≲ 1 ulp vs XLA's — so bit-equality is not expected; the gate is
Dice > 0.999 + reported pixel agreement).

Usage: python tools/probe_infer_mlp.py [--smoke] [--iters N]
--smoke: tiny geometry + Pallas interpret mode on CPU — validates the
dispatch plumbing and the gate without a TPU. Timing is meaningless there.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--arms", nargs="+",
                    default=["stock", "kernel", "lnout"],
                    help="stock | kernel (INFER_MLP_KERNEL) | lnout "
                         "(INFER_MLP_LNOUT cross-layer fusion)")
    args = ap.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit

    if args.smoke:
        vit.FUSED_MLP_INTERPRET = True
        size, window, stride = 192, 96, 32
        cfg = vit.ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                            pretrain_img_size=96)
    else:
        size, window, stride = 1152, 384, 128
        cfg = vit.VIT_SMALL(patch_size=8)
    params = pl.cast_params(vit.init(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((size, size)) * 255).astype(np.uint8))

    masks = {}
    for arm in args.arms:
        # set_infer_mlp clears jit caches on a mode change — essential:
        # pipeline.segment_mosaic is a module-level @jax.jit whose trace
        # cache does NOT key on the vit globals, so flipping the bare
        # globals makes every arm after the first silently re-serve the
        # first arm's graph (this probe's original same-process A/B
        # measured lnout == stock to 0.01 ms exactly that way; the device
        # trace then showed the lnout module 10 ms faster — BENCH.md r5)
        vit.set_infer_mlp("none" if arm == "stock" else arm)

        @jax.jit
        def step(im):
            mask, _ = pl.segment_mosaic(params, cfg, im, window, stride,
                                        dtype=jnp.bfloat16)
            return jnp.bitwise_xor(im, mask & jnp.uint8(1))

        @jax.jit
        def mask_of(im):
            mask, _ = pl.segment_mosaic(params, cfg, im, window, stride,
                                        dtype=jnp.bfloat16)
            return mask

        masks[arm] = np.asarray(mask_of(img)) > 0
        im = step(step(img))
        float(jnp.sum(im))  # scalar sync: warmup truly finished
        dt = 1e9
        for _ in range(args.repeats):
            im = img
            start = time.perf_counter()
            for _ in range(args.iters):
                im = step(im)
            float(jnp.sum(im))
            dt = min(dt, time.perf_counter() - start)
        ms = dt / args.iters * 1e3
        print(json.dumps({
            "arm": arm, "ms_per_mosaic": round(ms, 2),
            "mp_per_s": round(size * size / 1e6 / (ms / 1e3), 3),
        }), flush=True)

    rc = 0
    a = masks.get("stock")
    for arm, b in masks.items():
        if arm == "stock" or a is None:
            continue
        inter = np.logical_and(a, b).sum()
        dice = 2.0 * inter / max(a.sum() + b.sum(), 1)
        agree = float((a == b).mean())
        # gate at the same Dice>0.99 bench.py holds its bf16-vs-f32 masks
        # to: the kernel's Eigen erf differs from XLA's by ~1 ulp and the
        # min-max+Otsu chain amplifies that into ±1-bin boundary-pixel
        # flips (Dice 0.9932 measured at 1152², within the reference's own
        # thr±1 jitter envelope of 0.9867 — BENCH.md error budget)
        print(json.dumps({"gate": f"{arm}_vs_stock_mask",
                          "dice": round(float(dice), 6),
                          "pixel_agreement": round(agree, 6),
                          "ok": bool(dice > 0.99)}), flush=True)
        rc = rc or (0 if dice > 0.99 else 1)
    return rc


if __name__ == "__main__":
    sys.exit(main())
