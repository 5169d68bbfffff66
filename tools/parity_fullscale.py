"""Full-scale mosaic parity vs the reference's OWN code (VERDICT r1 weak #6).

Runs the complete sw_processing.py flow at the headline scale (ViT-S/8,
1152^2 mosaic, 49 overlapping 384^2 tiles, window 384 / stride 128) using the
reference's executable sources at /root/reference:

* dino/vision_transformer.py  — the real torch ViT (fed weights exported by
  train/checkpoint.vit_params_to_torch),
* utils.compute_attention      — the real CLS-row extraction,
* sw_processing.sliding_window / concat_crops / threshold — the real tiling,
  blended stitching, and multiplicative-Otsu code (sw_processing.py:37-163),
* cv2 for the /8 + x8 INTER_LINEAR smoothing (sw_processing.py:252-257 —
  inline in the reference's __main__, transliterated here; cv2 is the same
  binary the reference calls).

Then computes this framework's fused segment_mosaic (bf16 + f32) on the TPU
and reports pixel agreement + Dice between the masks. The only expected
difference is the documented delta: the reference thresholds the re-stitched
uint8 image, we threshold the original mosaic (PARITY.md).

Usage: python tools/parity_fullscale.py   (~15 min: 49 torch CPU forwards)
"""

import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference/Self-supervised_segmentation"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, REF)


def _stub_modules():
    import cv2

    sk = types.ModuleType("skimage")
    filters = types.ModuleType("skimage.filters")
    # only used for the reference's th2 output (not compared here)
    filters.threshold_otsu = lambda img: cv2.threshold(
        np.asarray(img, np.uint8), 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)[0]
    filters.threshold_yen = None
    morphology = types.ModuleType("skimage.morphology")
    morphology.remove_small_objects = morphology.binary_closing = morphology.disk = None
    measure = types.ModuleType("skimage.measure")
    measure.label = measure.regionprops = None
    color = types.ModuleType("skimage.color")
    color.label2rgb = None
    for name, m in (("filters", filters), ("morphology", morphology),
                    ("measure", measure), ("color", color)):
        setattr(sk, name, m)
        sys.modules[f"skimage.{name}"] = m
    sk.filters = filters
    sys.modules["skimage"] = sk

    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class _ToTensor:
        def __call__(self, pic):
            a = np.asarray(pic, np.uint8)
            if a.ndim == 2:
                a = a[:, :, None]
            return torch.from_numpy(a.transpose(2, 0, 1).astype(np.float32) / 255.0)

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    transforms.ToTensor = _ToTensor
    transforms.Compose = _Compose
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms

    import matplotlib

    matplotlib.use("Agg")


def main():
    _stub_modules()
    import cv2
    import torch
    from PIL import Image

    import dino.vision_transformer as ref_vits
    import sw_processing as ref_sw
    from utils import compute_attention as ref_compute_attention

    import jax
    import jax.numpy as jnp

    from vit_ocm_wmsegmentation_tpu import pipeline as pl
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.ops.metrics import dice_loss
    from vit_ocm_wmsegmentation_tpu.train.checkpoint import vit_params_to_torch

    cfg = vit.VIT_SMALL(patch_size=8)
    if len(sys.argv) > 1 and sys.argv[1].startswith("--checkpoint"):
        # trained-weights mode (VERDICT r2 #5): load a local MIM checkpoint
        # through the reference's strict=False ritual (depth-4 encoder into
        # depth-12 vit_small, model.py:91-109) so BOTH stacks see identical
        # trained blocks 0-3 + the same random tail
        import tempfile

        import torch as _t

        from vit_ocm_wmsegmentation_tpu.cli import load_model
        from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
        from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt_mod
        import orbax.checkpoint as ocp

        ck = sys.argv[1].split("=", 1)[1] if "=" in sys.argv[1] else sys.argv[2]
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ck))
        cfg4 = ViTConfig(patch_size=8, embed_dim=384, depth=4, num_heads=3,
                         pretrain_img_size=224)
        enc = {k: v for k, v in restored["params"].items()
               if k not in ("mask_token", "decoder")}
        sd4 = ckpt_mod.vit_params_to_torch(enc, cfg4)
        with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
            _t.save({"model": {k: _t.from_numpy(np.asarray(v)) for k, v in sd4.items()}}, f.name)
            params, cfg, _src = load_model("vit_small", 8, f.name, "teacher")
        print(f"trained-weights mode: {ck} (epoch {restored.get('epoch')})", flush=True)
    else:
        params = vit.init(cfg, jax.random.PRNGKey(0))
    model = ref_vits.vit_small(patch_size=8, num_classes=0)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in vit_params_to_torch(params, cfg).items()},
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    model.eval()

    # synthetic OCM-like mosaic, 1152^2 (same generator family as bench.py)
    rng = np.random.default_rng(0)
    base = rng.normal(110, 35, (1152, 1152))
    base[200:800, 150:950] += 65
    base[500:1100, 600:1100] += 40
    img_u8 = np.clip(base, 0, 255).astype(np.uint8)
    pil = Image.fromarray(img_u8).convert("RGB")

    # ---- reference chain (sw_processing.py:215-266), reference code ----
    t0 = time.time()
    tiles = ref_sw.sliding_window(pil, 128, 384)
    assert len(tiles) == 49, len(tiles)
    im = Image.fromarray(ref_sw.concat_crops(tiles, 128, 384)).convert("RGB")
    average_crops = []
    for j, crop in enumerate(tiles):
        # crop: (384, 384, 3) uint8 ndarray; ToTensor semantics (HWC/255 -> CHW)
        xt = torch.from_numpy(crop.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
        with torch.no_grad():
            _, attentions, _ = model.get_intermediate_feat(xt, n=1)
        att, _nh = ref_compute_attention(attentions, 0, 48, 48, 8)
        avg = np.mean(att, axis=0)
        avg = (avg - avg.min()) / (avg.max() - avg.min()) * 255.0
        avg = cv2.resize(avg, (avg.shape[1] // 8, avg.shape[0] // 8))
        # shape[0] for BOTH dsize components transliterates the reference's
        # square-only inline chain (sw_processing.py:252-257: resizes to
        # (img.shape[-1], img.shape[-1])) — do not "fix"; tiles are square
        avg = cv2.resize(avg, (avg.shape[0] * 8, avg.shape[0] * 8), interpolation=cv2.INTER_LINEAR)
        average_crops.append(avg)
        print(f"tile {j + 1}/49 done ({time.time() - t0:.0f}s)", flush=True)
    stitched_attn = ref_sw.concat_crops(average_crops, 128, 384)
    want_mask, _, _ = ref_sw.threshold(im.convert("L"), stitched_attn, save=False)
    ref_secs = time.time() - t0
    print(f"reference chain: {ref_secs:.0f}s", flush=True)

    # Recompute the reference's blended uint8 + Otsu threshold so the
    # residual disagreement can be measured against the threshold bins
    # (error budget, VERDICT r3 next #5). Same math as sw_processing.py's
    # threshold() (utils-free transliteration of its 5 live lines).
    attn_mm = (stitched_attn - stitched_attn.min()) / max(
        float(stitched_attn.max() - stitched_attn.min()), 1e-12)
    result_ref = (np.asarray(im.convert("L")) * attn_mm / attn_mm.max()).astype(np.uint8)
    ret, th_chk = cv2.threshold(result_ref, 0, 255,
                                cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert np.array_equal(th_chk, want_mask), "blend recompute diverged"
    ref_fg = want_mask > 0

    def _dice(a, b):
        inter = float(np.logical_and(a, b).sum())
        return 2 * inter / max(float(a.sum() + b.sum()), 1.0)

    # the reference mask's own sensitivity to a one-bin threshold move —
    # the scale against which any cross-stack residual must be judged
    jitter = {f"ref_dice_at_thr{d:+d}": round(_dice(ref_fg, result_ref > ret + d), 6)
              for d in (-1, 1)}
    print(json.dumps({"otsu_threshold": float(ret), **jitter}), flush=True)

    # ---- ours: one fused graph on the TPU ----
    # exact=True thresholds the reference's re-stitched uint8 image
    # bit-exactly (ops.stitch.restitch_u8) — the remaining disagreement is
    # then pure accumulation-order noise, not the documented stitch delta
    img_j = jnp.asarray(img_u8)
    for dtype, tag, exact in ((jnp.float32, "f32", False), (jnp.bfloat16, "bf16", False),
                              (jnp.float32, "f32_exact_stitch", True),
                              (jnp.bfloat16, "bf16_exact_stitch", True)):
        t0 = time.time()
        mask, attn = pl.segment_mosaic(params, cfg, img_j, window=384, stride=128,
                                       dtype=dtype, exact_stitch=exact)
        mask = np.asarray(mask)
        attn = np.asarray(attn)
        agree = float((mask == want_mask).mean())
        dice = _dice(mask > 0, ref_fg)
        attn_err = float(np.abs(attn - stitched_attn).max())
        # error budget: how far from the Otsu threshold do the disagreeing
        # pixels sit on the REFERENCE's own blended image? Pixels within
        # ±N bins flip under a blend perturbation of N/255 — the measured
        # cross-stack attention noise is ~4.3/255 at the boundary, so the
        # claim "threshold-boundary sensitivity, not hardware precision"
        # predicts the residual concentrates at small N.
        dis = mask != want_mask
        n_dis = int(dis.sum())
        budget = {}
        if n_dis:
            dist = np.abs(result_ref.astype(np.int32) - int(round(float(ret))))
            budget = {f"frac_disagree_within_{n}_bins":
                      round(float((dist[dis] <= n).mean()), 4)
                      for n in (1, 2, 4, 8)}
        print(json.dumps({
            "compute": tag,
            "mask_pixel_agreement_vs_reference_code": round(agree, 6),
            "dice_vs_reference_code": round(dice, 6),
            "stitched_attention_max_abs_err": round(attn_err, 5),
            "disagreeing_px": n_dis,
            **budget,
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
