"""Allen experiment: classifier training learns; ROI generator logic with fakes."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vit_ocm_wmsegmentation_tpu.models import swin
from vit_ocm_wmsegmentation_tpu.train.classifier import hf_linear_schedule, train_classifier

from Allen_Structure_ROIs_dataset.allen_dataset_generator_script import (
    RoiDatasetGenerator,
    is_overlapping,
    mask_walk_coords,
)


# ---------------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------------


def test_hf_linear_schedule():
    fn = hf_linear_schedule(1e-3, total_steps=100, warmup_ratio=0.1)
    assert float(fn(0)) == 0.0
    assert float(fn(10)) == pytest.approx(1e-3)
    assert float(fn(55)) == pytest.approx(1e-3 * 45 / 90)
    assert float(fn(100)) == pytest.approx(0.0)


def test_classifier_learns_synthetic_classes():
    """Tiny Swin must separate bright vs dark images within a few epochs."""
    cfg = swin.SwinConfig(img_size=16, patch_size=4, embed_dim=16, depths=(2,),
                          num_heads=(2,), window=4, num_classes=2)
    params = swin.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def batches(train):
        def gen(epoch):
            for _ in range(10):
                y = rng.integers(0, 2, 8).astype(np.int32)
                base = np.where(y[:, None, None, None] == 1, 0.8, 0.2)
                x = (base + rng.normal(0, 0.05, (8, 16, 16, 3))).astype(np.float32)
                yield x, y

        return gen

    def apply_fn(p, x):
        return swin.apply(p, cfg, x)

    best, history = train_classifier(apply_fn, params, batches(True), batches(False),
                                     epochs=3, lr=1e-2, grad_accum=1, steps_per_epoch=10,
                                     logger=lambda *_: None)
    assert history[-1]["eval_accuracy"] > 0.9


def test_classifier_learns_with_amp():
    """--amp (bf16 compute / f32 master, the MIM AMP rule) must still learn
    the synthetic classes, and the returned master params must stay f32."""
    cfg = swin.SwinConfig(img_size=16, patch_size=4, embed_dim=16, depths=(2,),
                          num_heads=(2,), window=4, num_classes=2)
    params = swin.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def batches(train):
        def gen(epoch):
            for _ in range(10):
                y = rng.integers(0, 2, 8).astype(np.int32)
                base = np.where(y[:, None, None, None] == 1, 0.8, 0.2)
                x = (base + rng.normal(0, 0.05, (8, 16, 16, 3))).astype(np.float32)
                yield x, y

        return gen

    def apply_fn(p, x):
        return swin.apply(p, cfg, x)

    best, history = train_classifier(apply_fn, params, batches(True), batches(False),
                                     epochs=3, lr=1e-2, grad_accum=1, steps_per_epoch=10,
                                     logger=lambda *_: None, amp=True)
    assert history[-1]["eval_accuracy"] > 0.9
    import jax.numpy as jnp

    assert all(a.dtype != jnp.bfloat16 for a in jax.tree.leaves(best))


# ---------------------------------------------------------------------------
# ROI generator
# ---------------------------------------------------------------------------


def test_mask_walk_coords_geometry():
    coords = list(mask_walk_coords((8, 100, 100), resolution=25, width=334, height=334, z_step=4))
    # w = h = int(334*2/25) = 26 -> 3 grid steps per axis; depth//4 = 2 z-slices
    assert len(coords) == 2 * 3 * 3
    (k, i, j), ref = coords[0]
    assert (k, i, j) == (0, 0, 0)
    assert ref == {"x": 0, "y": -167.0, "z": -167.0}
    (k2, _, _), ref2 = coords[-1]
    assert k2 == 4 and ref2["x"] == 100  # z index 1 -> 25um * 4 sections


def test_is_overlapping_threshold():
    rows = [{"section_image_id": 7, "x_sec": 1000, "y_sec": 2000}]
    assert is_overlapping(rows, 7, 1050, 2050)
    assert not is_overlapping(rows, 7, 1150, 2000)  # x beyond 100
    assert not is_overlapping(rows, 8, 1000, 2000)  # different image


class _FakeImageApi:
    def __init__(self):
        self.calls = []

    def download_section_image(self, section_image_id, path, **kw):
        self.calls.append((section_image_id, path, kw))
        with open(path, "wb") as f:
            f.write(b"jpg")


class _FakeSyncApi:
    def get_reference_to_image(self, x, y, z, section_data_set_ids, reference_space_id):
        # two datasets snap to the same section point -> one must be deduped
        body = {"section_data_set_id": 1, "section_image_id": 42, "x": 500, "y": 600}
        return [{"image_sync": dict(body)}, {"image_sync": dict(body, section_data_set_id=2, x=530)}]


def test_generator_dedups_and_writes_manifest(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    gen = RoiDatasetGenerator(image_api=_FakeImageApi(), sync_api=_FakeSyncApi(),
                              path=str(tmp_path), images_per_structure=5)
    remaining = gen.fetch_reference_point(0, 0, 0, [1, 2], "MOB", 507, remaining=5)
    assert remaining == 4  # second response row deduplicated (<100 px apart)
    assert len(gen.rows) == 1
    assert gen.rows[0]["structure_acronym"] == "MOB"
    assert os.path.exists(tmp_path / "ROIs_description.csv")
    assert len(gen.image_api.calls) == 1


def test_generator_respects_structure_budget(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    mask = np.ones((8, 100, 100))
    gen = RoiDatasetGenerator(image_api=_FakeImageApi(), sync_api=_FakeSyncApi(),
                              path=str(tmp_path), images_per_structure=1)
    gen.rois_for_structure(mask, [1], "DG", 726)
    assert len(gen.rows) == 1  # budget of 1 stops further downloads
