"""Trained-weights accuracy A/B for the int8 inference mode (ops/quant.py).

Random-init attention is near-flat, so Otsu-thresholded masks flip many
boundary pixels under any numeric perturbation — the regime that matters
is the peaked, trained one (same argument as VERDICT r2's trained-weights
parity ask). This tool restores the locally MIM-pretrained checkpoint,
splices it into vit_small exactly like tools/parity_trained.py (the
reference strict=False ritual), and runs the labeled eval twice — full
precision and --quant int8 — reporting the six final metrics side by side
plus the mask-level Dice between the two modes.

  JAX_PLATFORMS=cpu python tools/quant_accuracy.py \
      --checkpoint output/mim_trained/vit_small/trained_224_Experimental_Run/ckpt_epoch_1499 \
      [--image_size 224] [--method ours]

Backend-independent: the quant math is the same on CPU and TPU (modulo
float association), so the CPU verdict carries; the on-chip Dice gate in
tools/probe_int8.py re-checks at the 1152^2 headline scale.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_trained import make_synthetic_labeled  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mim_image_size", type=int, default=224)
    ap.add_argument("--dataset", default="")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--method", default="ours")
    args = ap.parse_args()

    import torch

    import jax.numpy as jnp

    from vit_ocm_wmsegmentation_tpu import evaluation
    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.data import build_eval_samples
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig, set_infer_quant
    from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt

    restored = ckpt.restore_checkpoint_raw(args.checkpoint)
    cfg4 = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                     pretrain_img_size=args.mim_image_size)
    enc = {k: v for k, v in restored["params"].items()
           if k not in ("mask_token", "decoder")}
    sd4 = ckpt.vit_params_to_torch(enc, cfg4)
    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                              for k, v in sd4.items()}}, f.name)
        pth = f.name
    from vit_ocm_wmsegmentation_tpu.cli import load_model

    params, cfg12, _ = load_model("vit_small", 8, pth, "teacher")
    os.unlink(pth)
    print(f"restored {args.checkpoint} (epoch {restored.get('epoch')})",
          flush=True)

    dataset = args.dataset or make_synthetic_labeled(
        tempfile.mkdtemp(prefix="quant_eval_"))
    samples = build_eval_samples(dataset, args.image_size, crop=1)

    results = {}
    for mode in ("none", "int8"):
        set_infer_quant(mode)
        meters = {}
        evaluation.validate(params, cfg12, samples, method=args.method,
                            crop=1, meters_out=meters)
        results[mode] = {k: round(meters[k].avg, 6)
                         for k in ("loss", "acc", "f1", "precision",
                                   "recall", "jaccard")}
        print(f"{mode}: {json.dumps(results[mode])}", flush=True)

    # mask-level agreement between the two modes on the same images
    imgs = jnp.stack([jnp.asarray(s.gray) for s in samples])
    set_infer_quant("none")
    m32, _ = pl.segment_single(params, cfg12, imgs, method=args.method)
    set_infer_quant("int8")
    m8, _ = pl.segment_single(params, cfg12, imgs, method=args.method)
    set_infer_quant("none")
    a, b = np.asarray(m32) > 0, np.asarray(m8) > 0
    dice = 2 * np.logical_and(a, b).sum() / max(a.sum() + b.sum(), 1)

    worst = max(abs(results["none"][k] - results["int8"][k])
                for k in results["none"])
    print(json.dumps({
        "int8_vs_f32_mask_dice": round(float(dice), 5),
        "max_abs_metric_delta": round(worst, 6),
        "metrics": results,
        "checkpoint_epoch": int(np.asarray(restored.get("epoch"))),
    }), flush=True)


if __name__ == "__main__":
    main()
