"""Standalone residual+LN+MLP block microbench at the mosaic shape.

Isolates the 3.46 ms/layer convert_reduce_fusion the r5 trace attributed
(tools/trace_ops.py mosaic: 34.7 ms of 109.3 across 12 layers — 32 % of
the graph against a ~1.56 ms floor from the measured 180 TF/s standalone
matmul pair). Arms: the stock XLA composition (x + w2·gelu(w1·ln(x))),
the forward-only Pallas fused block at several BLOCK_R, and the bare
matmul pair without LN/GELU/residual as the floor reference. Slope-fit
over chained iterations (probe_scaling methodology).

Usage: python tools/probe_mlp_micro.py [--rows 119168]
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

from vit_ocm_wmsegmentation_tpu import nn


def fit(name, step, x0, ns=(4, 16, 48)):
    x = step(step(x0))
    float(jnp.sum(x[0, :8].astype(jnp.float32)))
    pts = []
    for n in ns:
        best = 1e9
        for _ in range(2):
            y = x0
            t0 = time.perf_counter()
            for _ in range(n):
                y = step(y)
            float(jnp.sum(y[0, :8].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        pts.append((n, best))
    n_arr = np.array([p[0] for p in pts], dtype=np.float64)
    t_arr = np.array([p[1] for p in pts], dtype=np.float64) * 1e3
    slope, icept = np.polyfit(n_arr, t_arr, 1)
    print(json.dumps({"arm": name, "slope_ms": round(float(slope), 3),
                      "intercept_ms": round(float(icept), 1)}), flush=True)
    return float(slope)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=119168)  # 49 x 2432
    ap.add_argument("--blocks", type=int, nargs="+", default=[512, 1024, 2048])
    args = ap.parse_args()

    from vit_ocm_wmsegmentation_tpu.ops.fused_mlp import fused_mlp_block

    d, h = 384, 1536
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(0, 0.05, s).astype(np.float32)).astype(jnp.bfloat16)
    x0 = f(args.rows, d)
    scale = jnp.asarray(rng.normal(1, 0.1, d).astype(np.float32)).astype(jnp.bfloat16)
    bias, b1, b2 = f(d), f(h), f(d)
    w1, w2 = f(d, h), f(h, d)

    @jax.jit
    def stock(x):
        hh = nn.layer_norm({"scale": scale, "bias": bias}, x, 1e-6)
        hh = nn.linear({"kernel": w1, "bias": b1}, hh)
        return x + nn.linear({"kernel": w2, "bias": b2}, nn.gelu(hh))

    @jax.jit
    def pair(x):  # floor: the two matmuls alone
        return jnp.dot(jnp.dot(x, w1, preferred_element_type=jnp.bfloat16),
                       w2, preferred_element_type=jnp.bfloat16)

    fit("stock_xla", stock, x0)
    fit("matmul_pair_floor", pair, x0)
    for br in args.blocks:
        kern = jax.jit(lambda x, br=br: fused_mlp_block(
            x, scale, bias, w1, b1, w2, b2, 1e-6, br, False))
        try:
            fit(f"kernel@{br}", kern, x0)
        except Exception as e:  # Mosaic compile failures recorded, not fatal
            print(json.dumps({"arm": f"kernel@{br}",
                              "error": repr(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
