"""Trained-weights end-to-end parity (VERDICT r2 "Next round" #5).

Takes a locally MIM-pretrained checkpoint (our mim.py, orbax), replays the
reference's trained-eval ritual — the depth-4 SimMIM encoder is loaded into
the depth-12 vit_small with strict=False semantics, blocks 4-11 keeping
their random init (reference model.py:91-109, eval.py:67-94) — and runs the
labeled eval through BOTH stacks with identical full weights:

* this framework's evaluation.validate (TPU/CPU, fused pipeline),
* the reference's executed eval.py::validate (torch CPU, via
  tools/ref_validate.py).

Reports all six final meter averages side by side. Unlike the random-init
parity runs, the attention maps here are peaked/trained — the numerically
harsher regime VERDICT r2 asked to see demonstrated.

Usage:
  python tools/parity_trained.py --checkpoint output/mim_trained/ckpt_epoch_N \
      [--dataset <labeled dir>] [--image_size 384] [--method ours]
A synthetic labeled set is generated when --dataset is omitted.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_synthetic_labeled(root: str, n: int = 3, size: int = 1024):
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    rng = np.random.default_rng(17)
    for i in range(n):
        base = rng.normal(115, 38, (size, size))
        y0, x0 = int(size * 0.15) + 37 * i, int(size * 0.1) + 21 * i
        hh, ww = int(size * 0.55), int(size * 0.6)
        base[y0 : y0 + hh, x0 : x0 + ww] += 62
        img = np.clip(base, 0, 255).astype(np.uint8)
        lab = np.zeros((size, size), np.uint8)
        lab[y0 : y0 + hh, x0 : x0 + ww] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"im{i}.png"))
        Image.fromarray(lab).save(os.path.join(root, "labels", f"im{i}.png"))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="orbax ckpt_epoch_N dir from mim.py")
    ap.add_argument("--mim_image_size", type=int, default=224)
    ap.add_argument("--dataset", default="")
    ap.add_argument("--image_size", type=int, default=384)
    ap.add_argument("--method", default="ours")
    ap.add_argument("--crop", type=int, default=1)
    ap.add_argument("--infer_mlp", default="auto",
                    help="models/vit.set_infer_mlp mode for OUR stack: "
                         "'none' isolates the stack-exactness bound (stock "
                         "XLA, exact erf); 'auto' measures the shipped "
                         "route's envelope (r5: the lnout kernel's Eigen "
                         "erf flips Otsu-boundary pixels at peaked "
                         "attention)")
    args = ap.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from vit_ocm_wmsegmentation_tpu import evaluation
    from vit_ocm_wmsegmentation_tpu.data import build_eval_samples
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
    from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt
    import ref_validate

    vit.set_infer_mlp(args.infer_mlp)

    # ---- restore the trained MIM encoder (depth-4, reference geometry) ----
    # restore_checkpoint_raw restores to host numpy, so a TPU-written
    # checkpoint opens in a CPU-only process (relay-outage-proof)
    restored = ckpt.restore_checkpoint_raw(args.checkpoint)
    mim_params = restored["params"]
    cfg4 = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                     pretrain_img_size=args.mim_image_size)
    enc = {k: v for k, v in mim_params.items() if k not in ("mask_token", "decoder")}
    print(f"restored {args.checkpoint} (epoch {restored.get('epoch')})", flush=True)

    # ---- the reference load ritual: {"model": sd} -> vit_small strict=False
    sd4 = ckpt.vit_params_to_torch(enc, cfg4)
    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd4.items()}},
                   f.name)
        pth = f.name

    from vit_ocm_wmsegmentation_tpu.cli import load_model

    params, cfg12, src = load_model("vit_small", 8, pth, "teacher")
    assert src == pth

    # identical FULL weights into the reference torch model (trained blocks
    # 0-3 + the same random tail both stacks see)
    ref_eval, ref_vits = ref_validate.import_reference_eval()
    model = ref_vits.vit_small(patch_size=8, num_classes=0)
    full_sd = {k: torch.from_numpy(np.asarray(v))
               for k, v in ckpt.vit_params_to_torch(params, cfg12).items()}
    missing, unexpected = model.load_state_dict(full_sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    model.eval()

    dataset = args.dataset or make_synthetic_labeled(tempfile.mkdtemp(prefix="trained_eval_"))

    # ---- reference executed validate ----
    ref_args = ref_validate.make_args(dataset, image_size=args.image_size,
                                      method=args.method, crop=args.crop)
    want = ref_validate.run_reference_validate(model, ref_args)
    print("reference validate():", json.dumps(want), flush=True)

    # ---- ours ----
    samples = build_eval_samples(dataset, args.image_size, crop=args.crop)
    meters = {}
    evaluation.validate(params, cfg12, samples, method=args.method, crop=args.crop,
                        meters_out=meters)
    got = {"loss": meters["loss"].avg, "dice": 1 - meters["loss"].avg,
           "acc": meters["acc"].avg, "f1": meters["f1"].avg,
           "precision": meters["precision"].avg, "recall": meters["recall"].avg,
           "jaccard": meters["jaccard"].avg, "n": meters["loss"].count}
    print("ours validate():     ", json.dumps({k: round(v, 6) for k, v in got.items()}), flush=True)

    keys = ("loss", "dice", "acc", "f1", "precision", "recall", "jaccard")
    worst = max(abs(got[k] - want[k]) for k in keys)
    print(json.dumps({
        "trained_weights_metric_parity": {k: [round(got[k], 6), round(want[k], 6)] for k in keys},
        "max_abs_meter_delta": round(worst, 8),
        # orbax restores bare scalars as 0-d ndarrays — not JSON-serializable
        "checkpoint_epoch": int(np.asarray(restored.get("epoch", -1))),
    }), flush=True)
    os.unlink(pth)


if __name__ == "__main__":
    main()
