"""Parity against the reference's OWN executable code (VERDICT r1 item 4).

Unlike torch_oracle.py (a transliteration), these tests import and run the
actual reference sources mounted at /root/reference:

* dino/vision_transformer.py — the real DINO ViT (torch, CPU), fed weights
  exported by train/checkpoint.vit_params_to_torch;
* utils.py compute_attention/threshold — the real eval post-processing
  (cv2-backed), with the few skimage-only imports stubbed (skimage is not
  installed here and those names are unused on this path).

The fast test runs the full ViT-S geometry (embed 384, depth 12, heads 6,
patch 8) at 96^2; the 384^2 test is the paper's headline eval scale
end-to-end through the real threshold() (eval.py:135-177) — formerly
@slow, promoted into the default suite (VERDICT r2 item 8).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.ops import threshold as th
from vit_ocm_wmsegmentation_tpu.pipeline import attention_map_rgb, to_model_input
from vit_ocm_wmsegmentation_tpu.train.checkpoint import (
    vit_params_from_torch,
    vit_params_to_torch,
)

REF = "/root/reference/Self-supervised_segmentation"


def _import_reference():
    """Import the reference's dino.vision_transformer and utils modules.

    utils.py imports skimage/sklearn/matplotlib at module level; skimage is
    not installed in this image, so stub exactly the names it imports (they
    are only used by code paths these tests do not execute).

    The REF path entry is removed again after the imports: left in place it
    would shadow this repo's same-named CLI modules (mim, eval,
    sw_processing, croping, utils, ...) for any test that imports them
    LATER in the session — a test-order dependency. The already-imported
    reference modules stay cached in sys.modules under 'utils'/'dino',
    names nothing in this repo imports bare."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        for sub, names in {
            "filters": ["threshold_yen", "threshold_otsu"],
            "morphology": ["remove_small_objects", "binary_closing", "disk"],
            "measure": ["label", "regionprops"],
            "color": ["label2rgb"],
        }.items():
            m = types.ModuleType(f"skimage.{sub}")
            for name in names:
                setattr(m, name, None)
            setattr(sk, sub, m)
            sys.modules[f"skimage.{sub}"] = m
        sk.segmentation = types.ModuleType("skimage.segmentation")
        sys.modules["skimage"] = sk
    import matplotlib

    matplotlib.use("Agg")
    try:
        import dino.vision_transformer as ref_vits  # noqa: the reference module
        import utils as ref_utils
    finally:
        while REF in sys.path:
            sys.path.remove(REF)

    assert ref_vits.__file__.startswith(REF) and ref_utils.__file__.startswith(REF)
    return ref_vits, ref_utils


CFG = vit.VIT_SMALL(patch_size=8)  # embed 384, depth 12, heads 6


@pytest.fixture(scope="module")
def pair():
    """(our params, reference torch model carrying the same weights)."""
    ref_vits, _ = _import_reference()
    params = vit.init(CFG, __import__("jax").random.PRNGKey(7))
    sd = {k: torch.from_numpy(v) for k, v in vit_params_to_torch(params, CFG).items()}
    model = ref_vits.vit_small(patch_size=8, num_classes=0)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    model.eval()
    return params, model


def _roundtrip_guard(params):
    """Export->import roundtrip is the identity (converter sanity)."""
    back = vit_params_from_torch(
        {k: torch.from_numpy(v) for k, v in vit_params_to_torch(params, CFG).items()}, CFG
    )
    a = jnp.concatenate([x.ravel() for x in __import__("jax").tree.leaves(params)])
    b = jnp.concatenate([x.ravel() for x in __import__("jax").tree.leaves(back)])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_reference_vit_small_matches_ours_96(pair):
    """get_intermediate_feat (feat/attn/qkv) equality vs the real reference
    ViT-S/8 (dino/vision_transformer.py:225-237) at 96^2 (12x12+1 tokens)."""
    params, model = pair
    _roundtrip_guard(params)
    rng = np.random.default_rng(11)
    x = rng.random((1, 96, 96, 3), dtype=np.float32)
    with torch.no_grad():
        tf, ta, tq = model.get_intermediate_feat(torch.from_numpy(x.transpose(0, 3, 1, 2)), n=1)
    feats, attns, qkvs = vit.get_intermediate_feat(params, CFG, jnp.asarray(x), n=1)
    np.testing.assert_allclose(np.asarray(feats[0]), tf[0].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(attns[0]), ta[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qkvs[0]), tq[0].numpy(), atol=2e-4)
    # the real get_last_selfattention too (vision_transformer.py:239-246)
    with torch.no_grad():
        tlast = model.get_last_selfattention(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(attns[0]), tlast.numpy(), atol=2e-5)


def test_reference_end_to_end_384_ours_mask(pair):
    """The paper's headline path at full scale, oracled by reference code:
    real ViT forward (get_intermediate_feat) -> real compute_attention
    (utils.py:229-235) -> cv2 /8 + x8 INTER_LINEAR smoothing (eval.py:169-171)
    -> real threshold() (utils.py:62-115). Masks must match ours exactly up
    to uint8-quantization knife-edges (<=0.1% of pixels)."""
    import cv2

    _, ref_utils = _import_reference()
    params, model = pair

    rng = np.random.default_rng(13)
    base = rng.normal(120, 40, (384, 384))
    base[90:290, 60:330] += 60
    img_u8 = np.clip(base, 0, 255).astype(np.uint8)
    x = np.repeat((img_u8 / 255.0).astype(np.float32)[None, :, :, None], 3, axis=-1)

    # --- reference chain (eval.py:135-177), executed reference code ---
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        _, attentions, _ = model.get_intermediate_feat(xt, n=1)
    att_np, _nh = ref_utils.compute_attention(attentions, 0, 48, 48, 8)
    avg = np.mean(att_np, axis=0)
    down = cv2.resize(avg, (avg.shape[1] // 8, avg.shape[0] // 8))
    smoothed = cv2.resize(down, (384, 384), interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    pil_img = Image.fromarray(img_u8).convert("L")
    want_mask, _, _ = ref_utils.threshold(pil_img, smoothed, save=False)

    # --- ours, one fused graph ---
    attn = attention_map_rgb(params, CFG, jnp.asarray(x))[0]
    got_mask, _, _ = th.threshold_ours(jnp.asarray(img_u8), attn)

    np.testing.assert_allclose(np.asarray(attn), smoothed, atol=3e-5)
    diff = (np.asarray(got_mask) != want_mask).mean()
    assert diff <= 1e-3, f"mask mismatch fraction {diff}"
