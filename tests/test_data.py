"""Data pipeline: transforms, loaders, prefetching."""

import numpy as np
import pytest
from PIL import Image

from vit_ocm_wmsegmentation_tpu.data import datasets as D
from vit_ocm_wmsegmentation_tpu.data.prefetch import prefetch


@pytest.fixture()
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.jpg")
    return tmp_path


def test_center_crop_mod8():
    x = np.zeros((37, 43, 3))
    assert D.center_crop_mod8(x).shape == (32, 40, 3)


def test_random_resized_crop_matches_torchvision_params(img_dir):
    """Distribution check: crops stay within scale/ratio bounds."""
    img = Image.open(str(img_dir / "0.jpg"))
    rng = np.random.default_rng(1)
    for _ in range(10):
        out = D.random_resized_crop(img, rng, out_size=32)
        assert out.size == (32, 32)


def test_simmim_transform_shapes(img_dir):
    t = D.SimMIMTransform(img_size=32, mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
    rng = np.random.default_rng(2)
    arr, mask = t(Image.open(str(img_dir / "1.jpg")), rng)
    assert arr.shape == (32, 32, 3) and arr.dtype == np.float32 and arr.max() <= 1.0
    assert mask.shape == (4, 4) and mask.sum() == 8


def test_loader_determinism_and_drop_last(img_dir):
    t = D.SimMIMTransform(img_size=16, mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
    loader = D.Loader(D.list_images(str(img_dir)), t, batch_size=2, seed=0)
    assert len(loader) == 2  # 5 images, drop_last
    a = [x.sum() for x, _ in loader.epoch(0)]
    b = [x.sum() for x, _ in loader.epoch(0)]
    c = [x.sum() for x, _ in loader.epoch(1)]
    np.testing.assert_allclose(a, b)
    assert not np.allclose(a, c)


def test_prefetch_preserves_order_and_items(img_dir):
    items = [(np.full((2, 2), i), i) for i in range(7)]
    out = list(prefetch(iter(items), depth=3))
    assert [i for _, i in out] == list(range(7))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        for _ in it:
            pass


def test_prefetch_slow_consumer_still_gets_sentinel():
    """The end-of-iteration sentinel must arrive even when the producer
    finishes while the bounded queue is FULL (a slow consumer): a
    put_nowait there silently dropped it and the consumer's next() blocked
    forever (caught as a hang in test_sw_processing_stream_mode)."""
    import time

    it = prefetch(iter([1, 2, 3]), depth=1)
    time.sleep(0.5)  # producer exhausts the source against a full queue
    assert list(it) == [1, 2, 3]  # terminates (no deadlock) with all items


def test_prefetch_abandoned_consumer_releases_producer():
    """A consumer that breaks out early must not strand the producer thread
    blocked on the bounded queue (r3 review finding: each abandoned epoch
    leaked a thread pinning depth+1 device-placed batches)."""
    import time

    it = prefetch(iter([(np.full((2, 2), i), i) for i in range(100)]), depth=2)
    assert next(it)[1] == 0  # producer is live and blocked on the full queue
    thread = it._thread
    it.close()
    thread.join(timeout=5)
    assert not thread.is_alive(), "producer thread still blocked after close()"
    # closed iterator terminates instead of blocking forever
    with pytest.raises(StopIteration):
        next(it)


def test_loader_skips_unreadable_files(img_dir, capsys):
    bad = img_dir / "zz_bad.jpg"
    bad.write_bytes(b"not an image")
    t = D.SimMIMTransform(img_size=16, mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
    loader = D.Loader(D.list_images(str(img_dir)), t, batch_size=2, seed=0)
    batches = list(loader.epoch(0))
    total = sum(x.shape[0] for x, _ in batches)
    assert total == 4  # 5 good images, drop_last with batch 2
    assert "Error reading image" in capsys.readouterr().out
