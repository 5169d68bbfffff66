"""Measure the MIM AMP step under the MLP remat variants (VERDICT r2 #6).

The hypothesis (BENCH.md "MIM tail decomposition"): the 7.7 ms GELU cost is
not VPU throughput but fusion structure — stock autodiff saves gelu(h1),
whose backward use sites force standalone erf/exp fusions that nothing
overlaps. Naming the gelu output un-saveable (models/vit.py::_mlp_forward)
makes the backward recompute it from the saved h1 INSIDE the dW2 / dh1
matmuls, where the VPU work rides under the MXU.

Variants, all slope-fit (tools/probe_scaling.py methodology):

  baseline : MLP_REMAT=None (stock autodiff, r3 measured 49.7 ms)
  gelu     : drop gelu(h1) from the saved set
  gelu+ln  : additionally drop ln2(x)
  kernel   : Pallas fused residual+LN+MLP block, fwd+bwd (ops/fused_mlp.py)
  *+lnqkv  : suffix: additionally fuse LN1 into the qkv projection
             (ops/ln_linear.py via models/vit.LN_QKV)
  *+savep  : suffix (or bare "savep"): attention backward consumes the
             forward's saved P instead of recomputing exp(s - lse) —
             targets the measured VPU-transcendental bound of the
             attention bwd (ops/flash_attention.SAVE_P)
  *+gp     : suffix: the fused-MLP backward consumes saved
             gelu(h1)/gelu'(h1) instead of recomputing them from h1 —
             transcendental-free bwd for +1 (R, H) residual of HBM
             traffic (ops/fused_mlp.SAVE_GP; VERDICT r4 #3)

Usage: python tools/probe_fused_mlp.py [--smoke] [variant ...]

--smoke: tiny geometry + Pallas interpret mode on CPU — validates the whole
probe harness (variant plumbing, guard, slope fit) without a TPU, so a
Python-level bug can never burn the relay window. Timing output is
meaningless in this mode; only the exit code and guard verdicts matter.
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


def fit(name, fn, x0_factory, ns):
    x = x0_factory()
    x = fn(x)
    x = fn(x)
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
    print(json.dumps({"workload": name, "slope_ms_per_iter": round(sl * 1e3, 3),
                      "intercept_ms": round(ic * 1e3, 2)}), flush=True)
    return sl


def probe(variant, smoke=False, fp32=False):
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa
    from vit_ocm_wmsegmentation_tpu.ops import fused_mlp

    mode = variant
    vit_mod.LN_QKV = None
    fa.SAVE_P = False
    fused_mlp.SAVE_GP = False
    if mode.endswith("+gp"):
        # fused-MLP backward consumes saved gelu(h1)/gelu'(h1) instead of
        # recomputing from h1 — transcendental-free bwd, +1 (R, H) residual
        # of HBM traffic (ops/fused_mlp.SAVE_GP)
        fused_mlp.SAVE_GP = True
        mode = mode[: -len("+gp")]
    if mode == "savep" or mode.endswith("+savep"):
        # saved-P attention backward (no exp recompute); composes with any
        # MLP/lnqkv mode
        fa.SAVE_P = True
        mode = mode[: -len("+savep")] if "+" in mode else "baseline"
    if mode.endswith("+lnqkv"):
        vit_mod.LN_QKV = "kernel"
        mode = mode[: -len("+lnqkv")] or "baseline"
    if mode.startswith("kernel@"):
        # block-size sweep: kernel@256 runs the fused block with
        # BLOCK_R=256 (vit.py reads fused_mlp.DEFAULT_BLOCK_R at call time)
        from vit_ocm_wmsegmentation_tpu.ops import fused_mlp

        fused_mlp.DEFAULT_BLOCK_R = int(mode.split("@", 1)[1])
        mode = "kernel"
    vit_mod.MLP_REMAT = None if mode == "baseline" else mode
    if smoke:
        # CPU harness validation: tiny shapes, interpret-mode kernels (the
        # savep flag is set but the flash kernel itself only runs on TPU —
        # its numerics are pinned by tests/test_flash_attention.py)
        vit_mod.FUSED_MLP_INTERPRET = True
        vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                            pretrain_img_size=32)
        batch, img = 4, 32
    else:
        vit_cfg = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                            pretrain_img_size=224)
        batch, img = 60, 224
    params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    cfg = default_config()
    tx = build_optimizer(cfg, params, lambda t: 1e-4)
    opt_state = tx.init(params)
    step = make_train_step(vit_cfg, tx, amp=not fp32)

    rng = np.random.default_rng(0)
    g = img // 8
    x = jnp.asarray(rng.random((batch, img, img, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((batch, g, g)) > 0.6).astype(np.int32))

    def run(state):
        p, o, loss, gn = step(state[0], state[1], x, mask)
        return (p, o)

    fresh = jax.jit(lambda s: jax.tree.map(
        lambda a: a + 0 if jnp.issubdtype(a.dtype, jnp.inexact) else a, s))
    state_keep = (params, opt_state)

    # miscompile guard: every variant is grad-exact vs stock, so the first
    # step's loss/grad-norm from the pristine state must agree across
    # variants to bf16 noise — a Pallas variant whose numbers diverge here
    # is Mosaic-miscompiled and must not become the default.
    sp = fresh(state_keep)
    _, _, loss, gn = step(sp[0], sp[1], x, mask)
    loss, gn = float(loss), float(gn)
    print(json.dumps({"variant": variant, "first_loss": round(loss, 6),
                      "first_gnorm": round(gn, 5)}), flush=True)

    tag = "fp32_" if fp32 else ""
    fit(f"mim_step_{tag}{variant}", run, lambda: fresh(state_keep),
        [1, 2] if smoke else [1, 2, 4, 8, 16])
    return loss, gn


# bf16 AMP step: variants are grad-exact, so first-step numbers may differ
# only by bf16 reduction noise. The grad-norm tolerance is wider than the
# loss: the lnqkv/kernel routes legitimately reassociate the LN reductions,
# which moves the global grad-norm by ~5e-3 even under the EXACT interpret
# evaluator (measured by --smoke) — while the one real Mosaic miscompile
# seen on this backend (stale VMEM scratch, one head corrupted) moved it by
# orders of magnitude. loss stays the tight alarm.
GUARD_RTOL_LOSS = 5e-3
GUARD_RTOL_GNORM = 2e-2


def main():
    args = list(sys.argv[1:])
    smoke = "--smoke" in args
    if smoke:
        args.remove("--smoke")
    # --fp32: the non-AMP step (VMEM forces the kernel to BLOCK_R=128
    # there, ops/fused_mlp.pick_block_r) — measures whether the fused
    # block still beats baseline without the bf16 halving
    fp32 = "--fp32" in args
    if fp32:
        args.remove("--fp32")
    anchor = None  # the BASELINE variant's (loss, gnorm) — never another
    # variant's: re-anchoring on whichever variant happened to succeed first
    # would let a miscompiled variant pass unguarded and fail the healthy
    # ones against it
    rc = 0
    variants = args or ["baseline", "gelu", "gelu+ln", "kernel",
                        "kernel+lnqkv", "gelu+lnqkv", "savep",
                        "gelu+lnqkv+savep", "kernel+lnqkv+savep"]
    if variants[0] != "baseline":
        variants = ["baseline"] + variants
        print(json.dumps({"note": "prepending baseline: the miscompile "
                                  "guard anchors on it"}), flush=True)
    for variant in variants:
        # a variant that fails to compile (the Pallas kernels have only met
        # the interpret-mode evaluator so far) must not sink the others
        try:
            nums = probe(variant, smoke=smoke, fp32=fp32)
        except Exception as e:  # noqa: BLE001 - survey probe, report + go on
            print(json.dumps({"workload": f"mim_step_{variant}",
                              "error": repr(e)[:500]}), flush=True)
            if variant == "baseline":
                print(json.dumps({"PROBE_GUARD_FAIL": "ALL",
                                  "note": "baseline itself failed — no "
                                          "anchor; ship nothing from this "
                                          "log"}), flush=True)
                return 1
            continue
        if variant == "baseline":
            anchor = nums
            continue
        drifts = [abs(a - b) / max(1.0, abs(a)) for a, b in zip(anchor, nums)]
        if drifts[0] > GUARD_RTOL_LOSS or drifts[1] > GUARD_RTOL_GNORM:
            print(json.dumps({"PROBE_GUARD_FAIL": variant,
                              "first_step": nums, "baseline": anchor,
                              "note": "Mosaic miscompile suspected; do NOT "
                                      "ship this variant as the default"}),
                  flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
