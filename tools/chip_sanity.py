"""On-chip numerics gate for the Pallas training kernels.

The test suite proves interpret-mode Pallas == XLA on CPU; the gap it
cannot cover is the real Mosaic compiler (see ops/flash_attention.py's
reused-scratch miscompile lore). This tool closes it end-to-end with a
two-tier comparison of the same f32 MIM train step (fwd + flash-attention
custom-VJP bwd + clip + AdamW):

* tight (RTOL): every Pallas kernel route vs the kernel-free "xla"
  control RUN ON THE SAME CHIP — the comparison that isolates a Mosaic
  miscompile from backend numerics. Measured agreement is ~3e-6.
* loose (XBACKEND_RTOL): the chip "xla" control vs the committed CPU
  reference — TPU-vs-CPU f32 differs by ~2.5e-3 on this step's gnorm even
  at precision=highest (hardware erf/rsqrt approximations, reduction
  reassociation); that envelope is a backend property and is gated as
  such rather than being allowed to mask (or fake) a kernel bug.

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
# the Mosaic miscompiles this gate exists to catch. "highest" reaches the
# dots INSIDE Pallas kernels too (verified r4: the fused-MLP kernel's f32
# output matches CPU interpret exactly under it, and drifts 0.5% without).
# The residual ~2.5e-3 chip-vs-CPU step delta that remains is erf/rsqrt/
# reduction-order — hence the two-tier gate above.
jax.config.update("jax_default_matmul_precision", "highest")

REF_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "chip_sanity_ref.json")

# every training kernel route; (MLP_REMAT, LN_QKV, ATTN_SAVE_P, XLA_ATTN).
# "xla" is the kernel-free control: the same step with the attention run
# through the materialized XLA path instead of the Pallas custom VJP — on
# the chip it is the same-backend reference every Pallas route is gated
# against (see RTOL below).
VARIANTS = [
    ("xla", None, None, False, True),
    ("baseline", None, None, False, False),
    ("gelu", "gelu", None, False, False),
    ("gelu+ln", "gelu+ln", None, False, False),
    ("kernel", "kernel", None, False, False),
    ("lnqkv", None, "kernel", False, False),
    ("kernel+lnqkv", "kernel", "kernel", False, False),
    ("savep", None, None, True, False),
    ("kernel+lnqkv+savep", "kernel", "kernel", True, False),
]

# Two-tier gate (r4 redesign, measured on chip):
#
# * RTOL gates every Pallas route against the SAME-BACKEND "xla" control —
#   the comparison that actually isolates a Mosaic miscompile. Measured
#   agreement: 3e-6 relative on gnorm, so 2e-4 is ~60x headroom while
#   still far below any real miscompile (a wrong block would be >1e-2).
# * XBACKEND_RTOL gates the chip "xla" control against the committed CPU
#   reference. Even at precision=highest the TPU XLA backend differs from
#   CPU f32 by ~2.5e-3 on the step's gnorm (measured r4: erf/rsqrt are
#   hardware polynomial approximations and reductions reassociate); that
#   delta is a backend property, NOT a kernel bug — localized by running
#   the kernel-free step on chip and seeing the same drifted value
#   (4.37519 vs CPU 4.38627). The loose tier still catches gross backend
#   insanity (wrong conv lowering, precision config ignored: the DEFAULT-
#   precision run drifts 4e-3+ on loss where highest sits at 1e-4).
RTOL = 2e-4
XBACKEND_RTOL = 8e-3


def step_numbers(mlp_remat, ln_qkv, save_p=False, xla_attn=False):
    from vit_ocm_wmsegmentation_tpu.models import simmim
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
    from vit_ocm_wmsegmentation_tpu.ops import attention as att
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa
    from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step
    from vit_ocm_wmsegmentation_tpu.train.optim import build_optimizer
    from vit_ocm_wmsegmentation_tpu.utils.config import default_config
    saved = (vit_mod.MLP_REMAT, vit_mod.LN_QKV, vit_mod.FUSED_MLP_INTERPRET,
             fa.SAVE_P, att.mha_auto)
    vit_mod.MLP_REMAT, vit_mod.LN_QKV = mlp_remat, ln_qkv
    fa.SAVE_P = save_p
    if xla_attn:
        # kernel-free control: materialized XLA attention (compiles fast
        # at n=145, unlike the chunked scan's autodiff graph). The train
        # path keeps the stream unpadded, so n_valid is always None here.
        def _materialized(x, params, num_heads, *, n_valid=None,
                          prefer_folded=False, train=False):
            assert n_valid is None
            return att.mha(x, params, num_heads)

        att.mha_auto = _materialized
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
         fa.SAVE_P, att.mha_auto) = saved


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
    for name, mlp_remat, ln_qkv, save_p, xla_attn in VARIANTS:
        try:
            loss, gnorm = step_numbers(mlp_remat, ln_qkv, save_p, xla_attn)
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
    # tier 1 (cross-backend, loose): the chip's kernel-free "xla" control
    # vs the committed CPU reference
    control = results.get("xla", {})
    if "error" in control or "loss" not in control:
        bad.append(("xla", "error", control.get("error", "missing")))
        control = None
    else:
        for key in ("loss", "gnorm"):
            want = ref["xla"][key]
            if abs(control[key] - want) > XBACKEND_RTOL * max(1.0, abs(want)):
                bad.append(("xla", key, control[key], want))
    # tier 2 (same-backend, tight): every Pallas route vs the chip control
    for name, got in results.items():
        if name in ("xla", "int8_infer"):
            continue
        if name not in ref:
            bad.append((name, "missing-from-ref",
                        "regenerate tools/chip_sanity_ref.json on CPU"))
            continue
        if "error" in got:
            bad.append((name, "error", got["error"]))
            continue
        if control is None:
            continue  # already failing; per-variant compare is meaningless
        for key in ("loss", "gnorm"):
            if abs(got[key] - control[key]) > RTOL * max(1.0, abs(control[key])):
                bad.append((name, key, got[key], control[key]))
    # int8 inference stays a direct cross-backend check: integer dots are
    # bit-exact; only the f32 scale arithmetic can differ
    got = results.get("int8_infer", {})
    want = ref.get("int8_infer")
    if "error" in got or want is None:
        bad.append(("int8_infer", "error", got.get("error", "missing-ref")))
    else:
        for key in ("loss", "gnorm"):
            if abs(got[key] - want[key]) > RTOL * max(1.0, abs(want[key])):
                bad.append(("int8_infer", key, got[key], want[key]))
    if bad:
        print("CHIP_SANITY_FAIL", json.dumps(bad), flush=True)
        return 1
    print("CHIP_SANITY_OK: kernel routes match the on-chip XLA control; "
          "control within the cross-backend envelope of the CPU reference",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
