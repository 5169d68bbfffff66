"""Evaluation harness: method dispatch, metric aggregation, crop path."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import evaluation
from vit_ocm_wmsegmentation_tpu.data import build_eval_samples
from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

CFG = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalset")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = np.full((64, 64), 50, np.uint8)
        img[16:48, 16:48] = 200
        img = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
        lab = np.zeros((64, 64), np.uint8)
        lab[16:48, 16:48] = 255
        Image.fromarray(img).convert("RGB").save(root / "images" / f"{i}.png")
        Image.fromarray(lab).save(root / "labels" / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def params():
    return vit.init(CFG, jax.random.PRNGKey(0))


def test_build_eval_samples(dataset):
    samples = build_eval_samples(dataset, 32)
    assert len(samples) == 2
    s = samples[0]
    assert s.image.shape == (32, 32, 3) and s.image.dtype == np.float32
    assert s.gray.shape == (32, 32) and s.gray.dtype == np.uint8
    assert s.label.max() <= 1.0 and s.label.min() >= 0.0


@pytest.mark.parametrize("method", ["ours", "otsu", "heatmap_threshold", "k-means_ours"])
def test_validate_methods(dataset, params, method):
    # the k-means pixel-triplet reshape needs H*W % 3 == 0 (like 384^2)
    size = 48 if "k-means" in method else 32
    samples = build_eval_samples(dataset, size)
    acc, f1, loss = evaluation.validate(params, CFG, samples, method=method)
    assert 0.0 <= acc <= 1.0 and 0.0 <= f1 <= 1.0 and 0.0 <= loss <= 1.0


def test_batched_u8_wire_matches_per_image(dataset, params):
    """Grayscale sources set gray_exact, and the uint8-wire batched step must
    be bit-identical to the per-image f32 path (to_model_input(gray) ==
    image when the source is grayscale)."""
    samples = build_eval_samples(dataset, 32)
    assert all(s.gray_exact for s in samples)
    ref = evaluation.validate(params, CFG, samples, method="ours")  # per-image
    got = evaluation.validate(params, CFG, samples, method="ours", batch_size=2)
    for a, b in zip(got, ref):
        assert abs(a - b) < 1e-6, (got, ref)


def test_batched_rgb_wire_on_color_sources(tmp_path, params):
    """Color sources must take the f32 RGB wire (gray_exact False) and agree
    with the per-image path."""
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i}.png")
        lab = np.zeros((32, 32), np.uint8)
        lab[8:24, 8:24] = 255
        Image.fromarray(lab).save(tmp_path / "labels" / f"{i}.png")
    samples = build_eval_samples(str(tmp_path), 32)
    assert not any(s.gray_exact for s in samples)
    ref = evaluation.validate(params, CFG, samples, method="ours")
    got = evaluation.validate(params, CFG, samples, method="ours", batch_size=2)
    for a, b in zip(got, ref):
        assert abs(a - b) < 1e-6, (got, ref)


def test_validate_bf16_tracks_fp32(dataset, params):
    """eval.py --bf16 1: bf16 ViT compute with f32 attention hand-off must
    give metrics within bf16 rounding of the fp32 path, batched and
    per-image alike."""
    samples = build_eval_samples(dataset, 32)
    ref = evaluation.validate(params, CFG, samples, method="ours")
    for bs in (1, 2):
        got = evaluation.validate(params, CFG, samples, method="ours",
                                  batch_size=bs, dtype=jnp.bfloat16)
        for a, b in zip(got, ref):
            assert abs(a - b) < 0.05, (got, ref)


def test_validate_otsu_segments_synthetic_square(dataset, params):
    """On a clean bright-square image, plain Otsu on the image must nail the
    label regardless of model weights."""
    samples = build_eval_samples(dataset, 64)
    acc, f1, loss = evaluation.validate(params, CFG, samples, method="otsu")
    assert acc > 0.95 and f1 > 0.9


def test_validate_crop4(dataset, params):
    samples = build_eval_samples(dataset, 32, crop=4)
    acc, f1, loss = evaluation.validate(params, CFG, samples, method="ours", crop=4)
    assert 0.0 <= acc <= 1.0


def test_validate_feature_clustering(dataset, params):
    samples = build_eval_samples(dataset, 32)[:1]
    acc, f1, loss = evaluation.validate(params, CFG, samples, method="k-means_feature_clustering")
    assert 0.0 <= acc <= 1.0


def test_validate_chan_vese(dataset, params):
    samples = build_eval_samples(dataset, 32)[:1]
    acc, f1, loss = evaluation.validate(params, CFG, samples, method="chan-vese")
    assert 0.0 <= acc <= 1.0


def test_validate_batched_kmeans_matches(dataset, params):
    samples = build_eval_samples(dataset, 48)
    a1 = evaluation.validate(params, CFG, samples, method="k-means_ours")
    a2 = evaluation.validate(params, CFG, samples, method="k-means_ours", batch_size=2)
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_crop4_attention_matches_sequential_reference(dataset, params):
    """crop=4 path == the reference's per-crop loop (eval.py:145-171):
    per-quadrant attention, nearest x8, concat, /8 then x8 smoothing."""
    import cv2

    from vit_ocm_wmsegmentation_tpu.evaluation import _image_attention
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod

    sample = build_eval_samples(dataset, 64, crop=4)[0]
    got, _ = _image_attention(params, CFG, sample, crop=4, median_size=1)

    h = w = 64
    maps = []
    for i in range(2):
        for j in range(2):
            crop = sample.crop_image[i * 32 : (i + 1) * 32, j * 32 : (j + 1) * 32]
            _, attns, _ = vit_mod.get_intermediate_feat(params, CFG, jnp.asarray(crop)[None], n=1)
            a = np.asarray(attns[0][0, :, 0, 1:]).reshape(CFG.num_heads, 4, 4).mean(axis=0)
            maps.append(np.repeat(np.repeat(a, 8, 0), 8, 1))  # nearest x8
    recon = np.block([[maps[0], maps[1]], [maps[2], maps[3]]]).astype(np.float32)
    down = cv2.resize(recon, (recon.shape[1] // 8, recon.shape[0] // 8))
    want = cv2.resize(down, (w, h), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_crop_source_matches_reference_pil_flow(dataset):
    """crop>1 preprocessing == AIP_Croped_Labeled_Dataset exactly
    (data.py:97-122): grid crops cut from the PIL-DEFAULT (bicubic) resize
    of the source, and the thresholding gray is the re-assembled bicubic
    image converted to L. PIL itself is the oracle here."""
    samples = build_eval_samples(dataset, 48, crop=4)
    for sample in samples:
        img = Image.open(sample.path).convert("RGB")
        to_be_croped = img.copy().resize((48, 48))  # PIL default filter
        ref_crops = []
        w = h = 48 // 2
        for i in range(2):
            for j in range(2):
                x = to_be_croped.crop((j * w, i * h, (j + 1) * w, (i + 1) * h))
                # croped_transform: NEAREST resize to the same size (identity) + ToTensor
                ref_crops.append(np.asarray(x, np.float32) / 255.0)
        ours = sample.crop_image.reshape(2, 24, 2, 24, 3).transpose(0, 2, 1, 3, 4).reshape(4, 24, 24, 3)
        for a, b in zip(ours, ref_crops):
            np.testing.assert_array_equal(a, b)
        # eval.py:160-167: img = concat_crops(crops CHANNEL 0), replicated to
        # RGB, then convert('L') — L of an R-replicated image IS the R plane
        np.testing.assert_array_equal(
            sample.crop_gray, np.asarray(to_be_croped)[..., 0])


def test_crop_gray_is_channel0_for_color_sources(tmp_path):
    """For a color source the reference's crop>1 gray (channel 0 replicated,
    eval.py:161-166) differs from PIL luma; pin the channel-0 semantics."""
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "images" / "c.png")
    Image.fromarray(np.zeros((48, 48), np.uint8)).save(tmp_path / "labels" / "c.png")
    sample = build_eval_samples(str(tmp_path), 48, crop=4)[0]
    resized = Image.open(tmp_path / "images" / "c.png").convert("RGB").resize((48, 48))
    np.testing.assert_array_equal(sample.crop_gray, np.asarray(resized)[..., 0])
    assert not np.array_equal(sample.crop_gray, np.asarray(resized.convert("L")))
