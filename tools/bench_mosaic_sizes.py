"""Re-measure the BENCH.md mosaic size-scaling rows (2304², 4608²) with the
same relay-robust methodology as bench.py: every dispatch chained on the
previous output via an in-graph xor feedback, min over repeats, scalar sync.

The r2/r3 rows were single-shot wall clocks measured before the r4 unrolled
inference block loop shipped; this re-runs them against the shipped kernel
configuration so the size-scaling table carries one consistent column
(VERDICT r3 next #8). The workload geometry is sw_processing.py:235-258
scaled in linear size (window 384 / stride 128).

Usage: python tools/bench_mosaic_sizes.py [--sizes 2304 4608] [--iters N]
Prints one JSON line per size.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[2304, 4608])
    ap.add_argument("--iters", type=int, default=0,
                    help="chain length per repeat (0 = auto: ~8 s of device time)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit

    window, stride = 384, 128
    cfg = vit.VIT_SMALL(patch_size=8)
    params = pl.cast_params(vit.init(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)

    for size in args.sizes:
        rng = np.random.default_rng(0)
        img = jnp.asarray((rng.random((size, size)) * 255).astype(np.uint8))

        @jax.jit
        def step(im):
            mask, attn = pl.segment_mosaic(params, cfg, im, window, stride,
                                           dtype=jnp.bfloat16)
            return jnp.bitwise_xor(im, mask & jnp.uint8(1))

        im = step(step(img))
        float(jnp.sum(im))  # scalar sync: warmup truly finished

        # self-calibrating chain length: probe one already-compiled iteration
        # and size the chain to ~8 s of device time, so the tool stays valid
        # across kernel speedups instead of trusting a stale per-size table
        t0 = time.perf_counter()
        im = step(im)
        float(jnp.sum(im))
        est_s = time.perf_counter() - t0
        iters = args.iters or max(3, int(8.0 / max(est_s, 1e-3)))
        print(json.dumps({"mosaic": f"{size}x{size}", "probe_s": round(est_s, 3),
                          "derived_iters": iters}), flush=True)
        dt = 1e9
        for _ in range(args.repeats):
            im = img
            start = time.perf_counter()
            for _ in range(iters):
                im = step(im)
            float(jnp.sum(im))  # scalar sync: all chained dispatches executed
            dt = min(dt, time.perf_counter() - start)

        mp = size * size / 1e6
        n_tiles = ((size - window) // stride + 1) ** 2
        print(json.dumps({
            "mosaic": f"{size}x{size}",
            "tiles": n_tiles,
            "iters": iters,
            "ms_per_mosaic": round(dt * 1e3 / iters, 1),
            "mp_per_s": round(mp * iters / dt, 2),
            "ms_per_tile": round(dt * 1e3 / iters / n_tiles, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
