"""Decompose the MIM AMP step (VERDICT r2 "Next round" #6): where do the
~50 ms go at 224²/batch 60?

Slope-times (iteration-scaling, tools/probe_scaling.py methodology) three
graphs and reports each one's sustained cost + implied rate:

  attn  : value_and_grad of the 4 blocks' attention alone
          (flash_attention_trainable at b=60·4, h=3, n=785, d=128)
  dense : value_and_grad of the MIM step with attention replaced by identity
          (everything else: patch embed, LN, MLP/GELU, decoder, L1, AdamW)
  full  : the real train step (reference: probe_scaling.py mim)

full ≈ attn + dense - (double-counted residual adds) localizes the tail.

Usage: python tools/probe_mim_tail.py
"""

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

from vit_ocm_wmsegmentation_tpu.models import simmim
from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step
from vit_ocm_wmsegmentation_tpu.train.optim import build_optimizer
from vit_ocm_wmsegmentation_tpu.utils.config import default_config


def fit(name, fn, x0_factory, ns, flops=None):
    x = x0_factory()
    x = fn(x)
    x = fn(x)
    jax.tree.map(lambda a: None, x)
    leaves = jax.tree.leaves(x)
    float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:4]))
    ts = []
    for n in ns:
        best = 1e9
        for _ in range(2):
            xx = x0_factory()
            t0 = time.perf_counter()
            for _ in range(n):
                xx = fn(xx)
            leaves = jax.tree.leaves(xx)
            float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:4]))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    A = np.vstack([ns, np.ones(len(ns))]).T
    sl, ic = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    out = {"workload": name, "slope_ms_per_iter": round(sl * 1e3, 3),
           "intercept_ms": round(ic * 1e3, 2)}
    if flops:
        out["sustained_tflops"] = round(flops / sl / 1e12, 2)
    print(json.dumps(out), flush=True)
    return sl


def attn_probe():
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_Q, flash_attention_trainable)

    b, h, n, d = 240, 3, 785, 128  # 4 blocks folded into batch
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(0, 0.3, (b, h, n, d)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, DEFAULT_BLOCK_Q, False)
                       .astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    def run(state):
        dq, dk, dv = g(state[0], state[1], state[2])
        return (dq, dk, dv)

    def x0():
        return (q0, q0 + 0.01, q0 - 0.01)

    # fwd 2 dots + bwd 5 dots ~= 3.5x fwd matmul flops
    fl = 3.5 * 4 * b * h * n * n * d
    return run, x0, fl


def dense_probe(monkey=True):
    vit_cfg = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                        pretrain_img_size=224)
    params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    cfg = default_config()
    tx = build_optimizer(cfg, params, lambda t: 1e-4)
    opt_state = tx.init(params)

    if monkey:
        # attention -> identity: keeps every dense op, LN, GELU, residual,
        # decoder, loss, optimizer — removes only the attention kernel
        orig = vit_mod.att.mha_auto
        vit_mod.att.mha_auto = lambda x, p, heads, **kw: x
    step = make_train_step(vit_cfg, tx, amp=True)

    rng = np.random.default_rng(0)
    g = 224 // 8
    x = jnp.asarray(rng.random((60, 224, 224, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((60, g, g)) > 0.6).astype(np.int32))

    def run(state):
        p, o, loss, gn = step(state[0], state[1], x, mask)
        return (p, o)

    fresh = jax.jit(lambda s: jax.tree.map(
        lambda a: a + 0 if jnp.issubdtype(a.dtype, jnp.inexact) else a, s))
    state_keep = (params, opt_state)

    def x0():
        return fresh(state_keep)

    if monkey:
        # restore AFTER tracing happens inside fit (trace occurs on first call)
        pass
    return run, x0, orig if monkey else None


def main():
    ns = [1, 2, 4, 8, 16]

    run, x0, fl = attn_probe()
    fit("mim_attn_fwd_bwd_4blocks", run, x0, ns, fl)

    run, x0, orig = dense_probe(monkey=True)
    fit("mim_step_attn_identity", run, x0, ns)
    vit_mod.att.mha_auto = orig

    import sys as _s
    for kind in _s.argv[1:] or ["nogelu", "noln"]:
        ablation_probe(kind)


def ablation_probe(kind):
    """Full train step with one elementwise family stubbed to identity —
    the slope delta vs the real step bounds that family's cost."""
    from vit_ocm_wmsegmentation_tpu import nn as nn_mod

    saved = {}
    if kind == "nogelu":
        saved["gelu"] = nn_mod.gelu
        nn_mod.gelu = lambda x: x
    elif kind == "noln":
        saved["layer_norm"] = nn_mod.layer_norm
        nn_mod.layer_norm = lambda p, x, eps=1e-6: x * p["scale"] + p["bias"]

    try:
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

        def run(state):
            p, o, loss, gn = step(state[0], state[1], x, mask)
            return (p, o)

        fresh = jax.jit(lambda s: jax.tree.map(
            lambda a: a + 0 if jnp.issubdtype(a.dtype, jnp.inexact) else a, s))
        state_keep = (params, opt_state)
        fit(f"mim_step_{kind}", run, lambda: fresh(state_keep), [1, 2, 4, 8, 16])
    finally:
        for k, v in saved.items():
            setattr(nn_mod, k, v)


if __name__ == "__main__":
    main()
