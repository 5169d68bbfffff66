"""Iteration-count-scaling probe: a methodologically independent estimate of
this chip's sustained compute rate (VERDICT r2 "Next round" #1).

The round-2 roofline rested on one timing scheme (chained dispatches, scalar
sync, fixed iteration count). If a fixed per-run overhead were being
amortized into the sustained rate incorrectly, the "93 % of floor"
conclusion would move. This probe separates the two *by construction*: time
one chained run of N iterations for N in {1, 2, 4, ...}, take the min over
repeats (robust to relay noise), and fit time(N) = overhead + N * t_iter by
least squares. The slope is the true sustained per-iteration time, with any
fixed dispatch/sync/transfer overhead isolated in the intercept.

One workload per process (the tunnel pollutes timings after mid-script
fresh compiles — same rule as probe_dot.py):

    python tools/probe_scaling.py mlp     # ViT-S MLP pair, 112896x384x1536
    python tools/probe_scaling.py wide    # 16384x512x8192 pair
    python tools/probe_scaling.py attn    # the production flash kernel, mosaic shape
    python tools/probe_scaling.py mosaic  # the full 1152^2 headline graph

Prints one JSON line with slope/intercept/R^2 and the slope-implied rate.
"""

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


def timed_chain(fn, x0, n):
    """One timed run: n chained dispatches (each input = previous output),
    clock stopped on a scalar host transfer."""
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        x = fn(x)
    leaf = jax.tree.leaves(x)[0]
    _ = float(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.float32)))
    return time.perf_counter() - t0


def fit_and_report(name, fn, x0, ns, flops_per_iter=None, mp_per_iter=None, repeats=3):
    factory = x0 if callable(x0) else (lambda: x0)
    # warmup must end on a scalar sync (block_until_ready returns early
    # over the tunnel, CLAUDE.md)
    for _ in range(2):
        timed_chain(fn, factory(), 1)
    times = []
    for n in ns:
        times.append(min(timed_chain(fn, factory(), n) for _ in range(repeats)))
    ns_a = np.asarray(ns, np.float64)
    ts = np.asarray(times, np.float64)
    slope, intercept = np.polyfit(ns_a, ts, 1)
    pred = intercept + slope * ns_a
    ss_res = float(np.sum((ts - pred) ** 2))
    ss_tot = float(np.sum((ts - ts.mean()) ** 2))
    out = {
        "workload": name,
        "ns": list(ns),
        "times_s": [round(t, 5) for t in times],
        "slope_ms_per_iter": round(slope * 1e3, 3),
        "intercept_ms": round(intercept * 1e3, 3),
        "r2": round(1.0 - ss_res / ss_tot, 6),
    }
    if flops_per_iter:
        out["sustained_tflops"] = round(flops_per_iter / slope / 1e12, 2)
    if mp_per_iter:
        out["sustained_mp_per_s"] = round(mp_per_iter / slope, 3)
    print(json.dumps(out), flush=True)


def matmul_pair(m, k, h):
    """x(m,k) -> x@W1(k,h) -> @W2(h,k): chained paired matmul, bf16/f32-accum
    (the round-2 'paired-matmul probes' shape family)."""
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.05, (k, h)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (h, k)), jnp.bfloat16)

    @jax.jit
    def run(x):
        y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    x0 = jnp.asarray(rng.normal(0, 0.1, (m, k)), jnp.bfloat16)
    return run, x0, 2 * m * k * h * 2


def attn_workload():
    """The production Pallas flash-attention forward at the mosaic shape
    (49 tiles x 6 heads, N=2305 padded 2432, D=64), chained o -> q."""
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention

    b, h, n, d = 49, 6, 2305, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, h, n, d)), jnp.bfloat16)

    @jax.jit
    def run(q_in):
        return flash_attention(q_in, k, v).astype(jnp.bfloat16)

    return run, q, 4 * b * h * n * n * d


def mha_workload():
    """The full MHSA block (qkv proj -> attention kernel -> out proj) at the
    mosaic shape, as the model actually runs it — wrapper layout ops and all."""
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import mha_flash

    b, n, dm, h = 49, 2305, 384, 6
    rng = np.random.default_rng(0)
    params = {
        "wqkv": jnp.asarray(rng.normal(0, 0.03, (dm, 3 * dm)), jnp.bfloat16),
        "bqkv": jnp.asarray(rng.normal(0, 0.03, (3 * dm,)), jnp.bfloat16),
        "wo": jnp.asarray(rng.normal(0, 0.03, (dm, dm)), jnp.bfloat16),
        "bo": jnp.asarray(rng.normal(0, 0.03, (dm,)), jnp.bfloat16),
    }

    @jax.jit
    def run(x):
        return mha_flash(x, params, h)

    x0 = jnp.asarray(rng.normal(0, 1, (b, n, dm)), jnp.bfloat16)
    d = dm // h
    fl = 4 * b * h * n * n * d + 2 * b * n * dm * 4 * dm  # dots + qkv/proj
    return run, x0, fl


def vitblock_workload():
    """One full ViT block (LN -> mha -> residual -> LN -> MLP -> residual)
    at the mosaic shape on the padded stream, as lax.scan runs it. The gap
    between this slope and (mha slope + dense FLOPs / sustained matmul rate)
    is the non-matmul tail: LN/GELU/residual HBM round trips."""
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import padded_rows

    b, n, dm, h = 49, 2305, 384, 6
    cfg = vit.ViTConfig(patch_size=8, embed_dim=dm, depth=1, num_heads=h)
    rng = np.random.default_rng(0)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    bp = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["blocks"])

    @jax.jit
    def run(x):
        return vit._block_forward(bp, cfg, x, n_valid=n)

    x0 = jnp.asarray(rng.normal(0, 1, (b, padded_rows(n), dm)), jnp.bfloat16)
    d = dm // h
    fl = 4 * b * h * n * n * d + 2 * b * n * dm * (4 * dm + 2 * 4 * dm)
    return run, x0, fl


def mosaic_workload():
    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit

    if os.environ.get("PROBE_UNROLL_BLOCKS") == "1":
        # A/B knob for the unrolled inference block loop (vit._scan_blocks)
        vit.UNROLL_INFER_BLOCKS = True
    size, window, stride = 1152, 384, 128
    cfg = vit.VIT_SMALL(patch_size=8)
    params = pl.cast_params(vit.init(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((size, size)) * 255).astype(np.uint8))

    @jax.jit
    def run(im):
        mask, _ = pl.segment_mosaic(params, cfg, im, window, stride, dtype=jnp.bfloat16)
        return jnp.bitwise_xor(im, mask & jnp.uint8(1))

    return run, img, None, size * size / 1e6


def mim_workload():
    """The full AMP MIM train step at the BENCH.md row shape (224², batch 60,
    depth-4 ViT-S/8): chained params -> true per-step device time."""
    from vit_ocm_wmsegmentation_tpu.models import simmim
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
    from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step
    from vit_ocm_wmsegmentation_tpu.train.optim import build_optimizer
    from vit_ocm_wmsegmentation_tpu.utils.config import default_config

    # depth-4 / heads-3 matches the reference MIM model (model.py:96-97)
    vit_cfg = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                        pretrain_img_size=224)
    params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    cfg = default_config()
    tx = build_optimizer(cfg, params, lambda t: 1e-4)
    opt_state = tx.init(params)
    step = make_train_step(vit_cfg, tx, amp=True)

    rng = np.random.default_rng(0)
    g = 224 // 8
    x = jnp.asarray(rng.random((60, 224, 224, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((60, g, g)) > 0.6).astype(np.int32))

    # make_train_step donates params/opt_state; chain by passing the updated
    # state through. Each timed run starts from a fresh device-side copy so
    # the donated buffers of the previous run are never reused.
    def run(state):
        p, o, loss, gn = step(state[0], state[1], x, mask)
        return (p, o)

    state_keep = (params, opt_state)
    fresh = jax.jit(lambda s: jax.tree.map(lambda a: a + 0 if jnp.issubdtype(a.dtype, jnp.inexact) else a, s))

    def x0_factory():
        return fresh(state_keep)

    # useful FLOPs: 3x forward (fwd + ~2x bwd); forward = 4 blocks of
    # qkv/proj/2xMLP dense + attention dots (2 dots x 2*N^2*d)
    t = 60 * (g * g + 1)
    dense = 4 * (2 * t * 384 * 1152 + 2 * t * 384 * 384 + 2 * 2 * t * 384 * 1536)
    attn = 4 * 4 * 60 * 6 * (g * g + 1) ** 2 * 64
    return run, x0_factory, 3 * (dense + attn)


def main():
    which = sys.argv[1]
    if which == "mlp":
        run, x0, fl = matmul_pair(112896, 384, 1536)
        fit_and_report("mlp_pair_112896x384x1536", run, x0, [1, 2, 4, 8, 16, 32, 64], fl)
    elif which == "wide":
        run, x0, fl = matmul_pair(16384, 512, 8192)
        fit_and_report("wide_pair_16384x512x8192", run, x0, [1, 2, 4, 8, 16, 32, 64], fl)
    elif which == "attn":
        run, x0, fl = attn_workload()
        fit_and_report("flash_attn_mosaic_shape", run, x0, [1, 2, 4, 8, 16, 32], fl)
    elif which == "mosaic":
        run, x0, _, mp = mosaic_workload()
        fit_and_report("mosaic_1152_full_graph", run, x0, [1, 2, 4, 8, 16], mp_per_iter=mp)
    elif which == "mim":
        run, x0f, fl = mim_workload()
        fit_and_report("mim_amp_step_224_b60", run, x0f, [1, 2, 4, 8, 16], fl)
    elif which == "mha":
        run, x0, fl = mha_workload()
        fit_and_report("mha_block_mosaic_shape", run, x0, [1, 2, 4, 8, 16, 32], fl)
    elif which == "vitblock":
        run, x0, fl = vitblock_workload()
        fit_and_report("vit_block_mosaic_shape", run, x0, [1, 2, 4, 8, 16, 32], fl)
    else:
        raise SystemExit(f"unknown workload {which}")


if __name__ == "__main__":
    main()
