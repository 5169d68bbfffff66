"""Allen Swin-Tiny classifier throughput: fp32 vs AMP A/B (VERDICT r3 #6).

Reproduces the BENCH.md "Allen Swin-Tiny classifier" row on the real chip
with the iteration-scaling methodology (tools/probe_scaling.py): time one
chained run of N steps for N in {1, 2, 4, 8, 16}, fit time = intercept +
N * slope, report slope-implied samples/s for the train step and the eval
step, fp32 and AMP (bf16 compute / f32 master, the same rule the MIM step
uses — train/classifier.py::make_classifier_step).

Reference baseline: the upstream repo's committed Colab log, 48.81 train /
111.98 eval samples/s (Allen_data_Backbone/train.py:137-151, HF Trainer
fp16 on the Colab GPU).

Usage: python tools/bench_allen.py [--batch 16] [--arms fp32,amp]
Prints one JSON line per (arm, phase).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass


def fit(ns, ts):
    ns, ts = np.asarray(ns, np.float64), np.asarray(ts, np.float64)
    slope, intercept = np.polyfit(ns, ts, 1)
    pred = intercept + slope * ns
    ss_res = float(np.sum((ts - pred) ** 2))
    ss_tot = float(np.sum((ts - np.mean(ts)) ** 2))
    return slope, intercept, 1.0 - ss_res / max(ss_tot, 1e-30)


def timed_chain(fn, state, n):
    t0 = time.perf_counter()
    s = state
    for _ in range(n):
        s = fn(s)
    leaf = jax.tree.leaves(s)[0]
    _ = float(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.float32)))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--arms", default="fp32,amp")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from vit_ocm_wmsegmentation_tpu.models import swin
    from vit_ocm_wmsegmentation_tpu.train.classifier import (
        hf_linear_schedule, make_classifier_step)
    import optax

    cfg = swin.SwinConfig(num_classes=5)
    params = swin.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(
        (args.batch, args.image_size, args.image_size, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, (args.batch,)).astype(np.int32))
    apply_fn = lambda p, xx: swin.apply(p, cfg, xx)

    for arm in args.arms.split(","):
        amp = arm == "amp"
        tx = optax.adamw(hf_linear_schedule(5e-5, 1000), weight_decay=0.0)
        train_step, eval_step = make_classifier_step(apply_fn, tx, amp=amp)

        # --- train: chain params/opt_state through donated steps; each
        # timed run starts from a fresh on-device copy of the originals
        keep = (params, tx.init(params))
        fresh = jax.jit(lambda s: jax.tree.map(lambda a: a + 0, s))

        def run_train(s):
            p, o, _ = train_step(s[0], s[1], x, y)
            return (p, o)

        for _ in range(2):
            timed_chain(run_train, fresh(keep), 1)  # warmup ends on scalar sync
        ns = [1, 2, 4, 8, 16]
        ts = [min(timed_chain(run_train, fresh(keep), n)
                  for _ in range(args.repeats)) for n in ns]
        slope, intercept, r2 = fit(ns, ts)
        print(json.dumps({
            "arm": arm, "phase": "train", "batch": args.batch,
            "ms_per_step": round(slope * 1e3, 3),
            "samples_per_s": round(args.batch / slope, 1),
            "intercept_ms": round(intercept * 1e3, 1), "r2": round(r2, 6),
        }), flush=True)

        # --- eval: logits depend on x only; chain by xoring a bit of the
        # count back into the input so the runs serialize on device
        p_eval = keep[0]

        def run_eval(xx):
            c, _ = eval_step(p_eval, xx, y)
            return xx + (c.astype(jnp.float32) * 0.0)

        for _ in range(2):
            timed_chain(run_eval, x, 1)
        ts = [min(timed_chain(run_eval, x, n) for _ in range(args.repeats))
              for n in ns]
        slope, intercept, r2 = fit(ns, ts)
        print(json.dumps({
            "arm": arm, "phase": "eval", "batch": args.batch,
            "ms_per_step": round(slope * 1e3, 3),
            "samples_per_s": round(args.batch / slope, 1),
            "intercept_ms": round(intercept * 1e3, 1), "r2": round(r2, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
