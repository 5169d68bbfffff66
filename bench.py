#!/usr/bin/env python
"""North-star benchmark: OCM megapixels/sec/chip on tiled ViT-S/8 attention
inference (the fused sliding-window mosaic pipeline, 1152^2 mosaic = 49
overlapping 384^2 tiles, window 384 / stride 128 — the exact geometry of
sw_processing.py).

Baseline: the reference's measured eval throughput is ~2 images/s at 384^2
on an RTX 2080 Ti including its per-image CPU post-processing
(BASELINE.md), i.e. 2 * 0.384^2 = 0.295 MP/s. vs_baseline is measured
against that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    try:  # persistent compile cache: repeated driver runs skip recompiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    # The TPU relay occasionally drops for minutes (backend init raises
    # UNAVAILABLE, and jax caches a failed init for the process lifetime).
    # Probe in fresh subprocesses and only touch the in-process backend once
    # a probe succeeds, so a transient outage doesn't fail the bench run.
    import subprocess

    probe = [sys.executable, "-c", "import jax; jax.devices()"]
    for attempt in range(3):
        # a failed init takes ~25 min to raise on its own; give it 35 so the
        # normal failure path (no kill) is what bounds the attempt
        timed_out = False
        try:
            r = subprocess.run(probe, capture_output=True, timeout=2100)
            ok, err = r.returncode == 0, r.stderr.decode()[-2000:]
        except subprocess.TimeoutExpired:
            # killing a mid-init probe can wedge the relay grant for ~2-3
            # min (CLAUDE.md) — treat as a failed attempt and wait it out
            ok, err, timed_out = False, "backend probe timed out (2100s)", True
        if ok:
            break
        if attempt == 2:
            sys.stderr.write(err)
            raise RuntimeError("TPU backend unavailable after 3 probes")
        wait = 180 if timed_out else 60
        print(f"backend probe {attempt + 1} failed; retrying in {wait}s",
              file=sys.stderr, flush=True)
        time.sleep(wait)
    import jax.numpy as jnp

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit

    size, window, stride = 1152, 384, 128
    cfg = vit.VIT_SMALL(patch_size=8)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    params = pl.cast_params(params, jnp.bfloat16)  # MXU-native compute; fp32 accum/softmax
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((size, size)) * 255).astype(np.uint8))

    def run(im):
        mask, attn = pl.segment_mosaic(params, cfg, im, window, stride, dtype=jnp.bfloat16)
        return mask, attn

    # parity gate: the bf16 mask must agree with the fp32 pipeline (the
    # metric is MP/s *at Dice parity*)
    params32 = vit.init(cfg, jax.random.PRNGKey(0))
    mask32, _ = pl.segment_mosaic(params32, cfg, img, window, stride)
    mask16, attn = run(img)
    m32 = np.asarray(mask32) > 0
    m16 = np.asarray(mask16) > 0
    inter = np.logical_and(m32, m16).sum()
    dice = 2 * inter / max(m32.sum() + m16.sum(), 1)
    assert dice > 0.99, f"bf16/fp32 mask Dice {dice:.4f} below parity gate"

    # compile + warmup. Timing methodology (BENCH.md): over the device tunnel
    # block_until_ready can return before execution completes, so every
    # dispatch is chained on the previous output (the mask's low bit perturbs
    # the next input — identical shapes/compute, forced serial dependency)
    # and the clock stops on a scalar host transfer. The xor chain step is
    # INSIDE the jitted graph (same as tools/probe_scaling.py's mosaic
    # workload): dispatching it as a separate eager op costs ~6 ms/iter of
    # relay round-trips that belong to the harness, not the pipeline
    # (measured r4: 115.8 ms/iter eager-xor vs 109.3 ms/iter slope fit).

    @jax.jit
    def step(im):
        mask, attn = run(im)
        return jnp.bitwise_xor(im, mask & jnp.uint8(1))

    im = step(step(img))
    float(jnp.sum(im))  # scalar sync: warmup truly finished

    # min over repeats: the relay adds sporadic multi-ms stalls; the fastest
    # full chain is the one where the device ran back-to-back, which is the
    # sustained rate (cross-checked by tools/probe_scaling.py's slope fit).
    # 60-iteration chains (r5, VERDICT r4 next #2): the fixed ~26 ms relay
    # dispatch intercept per chain amortizes to ~0.4 ms/mosaic instead of
    # the 1.3 ms/mosaic it cost at 20 — the wall number converges on the
    # slope-fit sustained rate instead of sitting 1.7 % under it
    iters = 60
    dt = 1e9
    for _ in range(3):
        im = img
        start = time.perf_counter()
        for _ in range(iters):
            im = step(im)
        float(jnp.sum(im))  # scalar sync: all chained dispatches executed
        dt = min(dt, time.perf_counter() - start)

    mp = size * size / 1e6
    mp_per_s = mp * iters / dt
    baseline_mp_per_s = 2.0 * (0.384**2)  # reference eval: ~2 img/s at 384^2
    print(json.dumps({
        "metric": "mosaic_attention_inference_megapixels_per_sec_per_chip",
        "value": round(mp_per_s, 3),
        "unit": "MP/s",
        "vs_baseline": round(mp_per_s / baseline_mp_per_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
