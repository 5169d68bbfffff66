"""Supervised trainer: loops, plateau scheduler, PGT pseudo-labels, probing."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.models import probing, unet, vit
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.train import supervised as sup

CFG = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = np.full((64, 64), 60, np.uint8)
        img[16:48, 16:48] = 200
        img = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
        lab = np.zeros((64, 64), np.uint8)
        lab[16:48, 16:48] = 255
        Image.fromarray(img).convert("RGB").save(root / "images" / f"{i}.png")
        Image.fromarray(lab).save(root / "labels" / f"{i}.png")
    return str(root)


def test_segloader_device_resident_matches_host(seg_dataset):
    """The HBM-resident SegLoader path must yield bit-identical batches to
    the per-batch host decode (the /255 normalization commutes with the
    uint8 gather)."""
    from glob import glob

    imgs = sorted(glob(seg_dataset + "/images/*"))
    labs = sorted(glob(seg_dataset + "/labels/*"))
    host = sup.SegLoader(imgs, labs, 32, 2, shuffle=True, device_resident=False)
    dev = sup.SegLoader(imgs, labs, 32, 2, shuffle=True, device_resident=True)
    for (hx, hy), (dx, dy) in zip(host.epoch(3), dev.epoch(3)):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))
    # unlabeled (PGT) mode
    host_u = sup.SegLoader(imgs, None, 32, 2, device_resident=False)
    dev_u = sup.SegLoader(imgs, None, 32, 2, device_resident=True)
    for hx, dx in zip(host_u.epoch(0), dev_u.epoch(0)):
        np.testing.assert_array_equal(hx, np.asarray(dx))


def test_segloader_empty_split_yields_nothing():
    """Regression: a dataset smaller than the reference's hard-coded splits
    (finetune.py train 0:50 / val 50:70) produces EMPTY val/test loaders;
    device_resident epoch() used to crash unpacking the never-built device
    stack instead of yielding nothing (train_supervised's empty-val fallback
    never got the chance to run)."""
    for dev in (True, False):
        loader = sup.SegLoader([], [], 32, 2, device_resident=dev)
        assert len(loader) == 0
        assert list(loader.epoch(0)) == []


def test_train_supervised_empty_train_split_errors(tmp_path):
    """An empty TRAIN set must raise, not train 0 batches into nan losses
    and save a garbage checkpoint (seen with a mistyped --image_path)."""
    import pytest

    loader = sup.SegLoader([], [], 32, 2)
    with pytest.raises(ValueError, match="train split is empty"):
        sup.train_supervised(lambda p, s, x, train: (x, s), {}, {}, loader,
                             loader, epochs=1, lr=1e-3,
                             checkpoint_path=str(tmp_path / "ckpt"))


def test_plateau_scheduler():
    s = sup.ReduceLROnPlateau(1e-3, patience=2, factor=0.1)
    for v in [1.0, 0.9, 0.95, 0.96]:  # 2 bad epochs -> no drop yet
        lr = s.step(v)
    assert lr == 1e-3
    lr = s.step(0.97)  # 3rd bad epoch > patience
    assert lr == pytest.approx(1e-4)


def test_pil_l_conversion_matches_pil():
    rng = np.random.default_rng(1)
    arr = rng.random((8, 8, 3)).astype(np.float32)
    got = np.asarray(sup._pil_l_from_float(jnp.asarray(arr)))
    u8 = (arr * 255).astype(np.uint8)
    want = np.asarray(Image.fromarray(u8, "RGB").convert("L"))
    np.testing.assert_array_equal(got, want)


def test_teacher_pseudo_labels_match_reference_chain(seg_dataset):
    """Fused PGT teacher == per-image attention->smooth->threshold chain."""
    from vit_ocm_wmsegmentation_tpu.ops.resize import smooth_attention
    from vit_ocm_wmsegmentation_tpu.ops.threshold import threshold_ours
    from vit_ocm_wmsegmentation_tpu.pipeline import head_average_attention

    teacher = vit.init(CFG, jax.random.PRNGKey(0))
    x = jnp.asarray(np.stack([sup.load_image_cv2(f"{seg_dataset}/images/{i}.png", 32) for i in range(2)]))
    y = sup.teacher_pseudo_labels(teacher, CFG, x)
    assert y.shape == (2, 32, 32, 1)
    for i in range(2):
        gray = sup._pil_l_from_float(x[i])
        avg = head_average_attention(teacher, CFG, x[i][None])[0]
        attn = smooth_attention(avg, 8, (32, 32))
        want = threshold_ours(gray, attn)[0].astype(jnp.float32) / 255.0
        np.testing.assert_array_equal(np.asarray(y[i, ..., 0]), np.asarray(want))


def test_split_reference_slices():
    imgs = [f"i{i}" for i in range(100)]
    labs = [f"l{i}" for i in range(100)]
    (tr, try_), (va, _), (te, _) = sup.split_reference(imgs, labs, "finetune")
    assert len(tr) == 50 and len(va) == 20 and len(te) == 30
    (tr, _), (va, _), (te, _) = sup.split_reference(imgs, labs, "unet")
    assert len(tr) == 25 and len(va) == 5 and len(te) == 70
    (tr, _), _, _ = sup.split_reference(imgs, labs, "finetune", ratio=0.5)
    assert len(tr) == 25


def test_train_supervised_probing_loss_decreases(seg_dataset, tmp_path):
    """The finetune.py path with a small ViT: loss must fall over epochs."""
    params = probing.init(CFG, jax.random.PRNGKey(0), layer_num=2)
    state = params.pop("state")

    def apply_fn(p, s, x, train):
        return probing.apply(dict(p, state=s), CFG, x, layer_num=2, train=train)

    imgs = sorted(__import__("glob").glob(seg_dataset + "/images/*"))
    labs = sorted(__import__("glob").glob(seg_dataset + "/labels/*"))
    train_loader = sup.SegLoader(imgs[:4], labs[:4], 32, 2, shuffle=True)
    valid_loader = sup.SegLoader(imgs[4:], labs[4:], 32, 2)
    params, state, tl, vl = sup.train_supervised(
        apply_fn, params, state, train_loader, valid_loader,
        epochs=4, lr=1e-3, checkpoint_path=str(tmp_path / "ft"), logger=lambda *_: None,
    )
    assert tl[-1] < tl[0]
    assert np.isfinite(vl).all()


def test_test_supervised_outputs_triptychs(seg_dataset, tmp_path):
    params, state = unet.init(jax.random.PRNGKey(0))

    def apply_fn(p, s, x, train):
        return unet.apply(p, s, x, train=train)

    imgs = sorted(__import__("glob").glob(seg_dataset + "/images/*"))[:2]
    labs = sorted(__import__("glob").glob(seg_dataset + "/labels/*"))[:2]
    avg, loss = sup.test_supervised(apply_fn, params, state, imgs, labs, 32,
                                    str(tmp_path / "res"), logger=lambda *_: None)
    assert len(avg) == 6 and np.isfinite(avg).all()
    import os

    outs = os.listdir(tmp_path / "res")
    assert len(outs) == 2
    im = np.asarray(Image.open(tmp_path / "res" / outs[0]))
    assert im.shape == (32, 32 * 3 + 20, 3)  # image | GT | pred with separators


def test_teacher_pseudo_labels_rand_heads(seg_dataset):
    """rand mode: random head subsets give valid masks that (generically)
    differ from the all-heads average."""
    import jax

    teacher = vit.init(CFG, jax.random.PRNGKey(3))
    x = jnp.asarray(np.stack([sup.load_image_cv2(f"{seg_dataset}/images/{i}.png", 32) for i in range(2)]))
    y_all = sup.teacher_pseudo_labels(teacher, CFG, x)
    y_rand = sup.teacher_pseudo_labels(teacher, CFG, x, jax.random.PRNGKey(0))
    assert y_rand.shape == y_all.shape
    assert set(np.unique(np.asarray(y_rand))) <= {0.0, 1.0}
    y_rand2 = sup.teacher_pseudo_labels(teacher, CFG, x, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(y_rand), np.asarray(y_rand2)) or not np.array_equal(
        np.asarray(y_rand), np.asarray(y_all)
    )
