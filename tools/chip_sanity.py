"""Chip-vs-CPU numerics gate for the Pallas training kernels.

The test suite proves interpret-mode Pallas == XLA on CPU; the gap it
cannot cover is the real Mosaic compiler (see ops/flash_attention.py's
reused-scratch miscompile lore). This tool closes it end-to-end: the same
f32 MIM train step (fwd + flash-attention custom-VJP bwd + clip + AdamW)
is evaluated on the CPU backend ("ref" mode, XLA everywhere) and on the
chip ("check" mode, Pallas kernels engaged), and the first-step loss and
grad-norm must agree to f32 accumulation noise for every training kernel
route (MLP_REMAT x LN_QKV).

Usage:
    JAX_PLATFORMS=cpu python tools/chip_sanity.py ref    # writes the JSON
    python tools/chip_sanity.py check                    # on the chip

The reference JSON lives at tools/chip_sanity_ref.json (committed) so the
check needs no CPU pass at verification time.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Importing the package BEFORE any backend init re-asserts an explicit
# JAX_PLATFORMS=cpu env request over sitecustomize's "axon,cpu" override —
# otherwise the "ref" mode's first device op attempts axon first and hangs
# ~25 min whenever the relay is down (package __init__ does the re-assert).
import vit_ocm_wmsegmentation_tpu  # noqa: F401

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

# Pin full-f32 matmuls/convs: TPU XLA's DEFAULT precision runs f32 dots as
# bf16 passes, which puts a ~0.4% chip-vs-CPU gnorm delta on EVERY variant
# (measured r4 — the original gate could never pass on chip) and would mask
# the Mosaic miscompiles this gate exists to catch. With "highest" the XLA
# portions of the step agree to accumulation noise and the residual delta
# isolates the Pallas kernels themselves.
jax.config.update("jax_default_matmul_precision", "highest")

REF_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "chip_sanity_ref.json")

# every training kernel route; (MLP_REMAT, LN_QKV, ATTN_SAVE_P)
VARIANTS = [
    ("baseline", None, None, False),
    ("gelu", "gelu", None, False),
    ("gelu+ln", "gelu+ln", None, False),
    ("kernel", "kernel", None, False),
    ("lnqkv", None, "kernel", False),
    ("kernel+lnqkv", "kernel", "kernel", False),
    ("savep", None, None, True),
    ("kernel+lnqkv+savep", "kernel", "kernel", True),
]

# chip runs Pallas f32 kernels with bf16-free math but different reduction
# orders / fused-rsqrt paths than the CPU XLA graph
RTOL = 2e-4


def step_numbers(mlp_remat, ln_qkv, save_p=False):
    from vit_ocm_wmsegmentation_tpu.models import simmim
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa
    from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step
    from vit_ocm_wmsegmentation_tpu.train.optim import build_optimizer
    from vit_ocm_wmsegmentation_tpu.utils.config import default_config
    saved = (vit_mod.MLP_REMAT, vit_mod.LN_QKV, vit_mod.FUSED_MLP_INTERPRET,
             fa.SAVE_P)
    vit_mod.MLP_REMAT, vit_mod.LN_QKV = mlp_remat, ln_qkv
    fa.SAVE_P = save_p
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # the CPU ref must exercise the same routes: interpret-mode kernels
    vit_mod.FUSED_MLP_INTERPRET = not on_tpu
    try:
        # small but kernel-real shapes: 96^2/8 -> 145 padded tokens, the
        # qkvflat single-program path; embed 384 = the production width
        vit_cfg = ViTConfig(patch_size=8, embed_dim=384, depth=2,
                            num_heads=6, pretrain_img_size=96)
        params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
        cfg = default_config()
        tx = build_optimizer(cfg, params, lambda t: 1e-4)
        step = make_train_step(vit_cfg, tx, amp=False)

        rng = np.random.default_rng(0)
        g = 96 // 8
        x = jnp.asarray(rng.random((8, 96, 96, 3)).astype(np.float32))
        mask = jnp.asarray((rng.random((8, g, g)) > 0.6).astype(np.int32))
        _, _, loss, gnorm = step(params, tx.init(params), x, mask)
        return float(loss), float(gnorm)
    finally:
        (vit_mod.MLP_REMAT, vit_mod.LN_QKV, vit_mod.FUSED_MLP_INTERPRET,
         fa.SAVE_P) = saved


def int8_infer_numbers():
    """The dynamic-int8 inference route (ops/quant.py via mha_flash
    quant=True): the int8 dots accumulate exactly in int32, so chip-vs-CPU
    can only differ in the f32 quantize/dequantize arithmetic — a route
    whose XLA int8 lowering miscompiled would blow well past RTOL. Same
    qkvflat-real geometry as the training variants."""
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import mha_flash

    on_tpu = jax.default_backend() in ("tpu", "axon")
    vit_cfg = vit_mod.ViTConfig(patch_size=8, embed_dim=384, depth=2,
                                num_heads=6, pretrain_img_size=96)
    params = vit_mod.init(vit_cfg, jax.random.PRNGKey(0))
    bp = jax.tree.map(lambda a: a[0], params["blocks"]["attn"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 145, 384)).astype(np.float32))
    y = mha_flash(x, bp, 6, quant=True, interpret=not on_tpu)
    y = np.asarray(y, dtype=np.float64)
    return float(np.mean(y)), float(np.std(y))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "ref" and jax.default_backend() in ("tpu", "axon"):
        # a chip-generated "reference" would make the gate chip-vs-chip
        print("refusing to write the CPU reference from the TPU backend; "
              "run: JAX_PLATFORMS=cpu python tools/chip_sanity.py ref",
              file=sys.stderr)
        return 2
    results = {}
    for name, mlp_remat, ln_qkv, save_p in VARIANTS:
        try:
            loss, gnorm = step_numbers(mlp_remat, ln_qkv, save_p)
            results[name] = {"loss": loss, "gnorm": gnorm}
            print(json.dumps({"variant": name, "loss": round(loss, 7),
                              "gnorm": round(gnorm, 6)}), flush=True)
        except Exception as e:  # noqa: BLE001 - survey tool: report, continue
            results[name] = {"error": repr(e)[:500]}
            print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                  flush=True)

    try:
        m, s = int8_infer_numbers()
        results["int8_infer"] = {"loss": m, "gnorm": s}  # (mean, std) slots
        print(json.dumps({"variant": "int8_infer", "out_mean": round(m, 7),
                          "out_std": round(s, 6)}), flush=True)
    except Exception as e:  # noqa: BLE001 - survey tool: report, continue
        results["int8_infer"] = {"error": repr(e)[:500]}
        print(json.dumps({"variant": "int8_infer", "error": repr(e)[:300]}),
              flush=True)

    if mode == "ref":
        with open(REF_PATH, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {REF_PATH}")
        if any("error" in r for r in results.values()):
            print("REF_HAS_ERRORS: fix the failing variants and regenerate",
                  file=sys.stderr)
            return 1
        return 0

    with open(REF_PATH) as f:
        ref = json.load(f)
    bad = []
    # both directions: a VARIANTS entry dropped without regenerating the
    # ref would otherwise shrink coverage silently under a green OK line
    for orphan in set(ref) - set(results):
        bad.append((orphan, "missing-from-check",
                    "variant in chip_sanity_ref.json but no longer probed; "
                    "update VARIANTS or regenerate the ref"))
    for name, got in results.items():
        want = ref.get(name)
        if want is None:
            bad.append((name, "missing-from-ref",
                        "regenerate tools/chip_sanity_ref.json on CPU"))
            continue
        if "error" in got or "error" in want:
            bad.append((name, "error", got.get("error") or want.get("error")))
            continue
        for key in ("loss", "gnorm"):
            if abs(got[key] - want[key]) > RTOL * max(1.0, abs(want[key])):
                bad.append((name, key, got[key], want[key]))
    if bad:
        print("CHIP_SANITY_FAIL", json.dumps(bad), flush=True)
        return 1
    print("CHIP_SANITY_OK: all kernel routes match the CPU reference",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
