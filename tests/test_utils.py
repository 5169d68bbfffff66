"""Utils: profiling timers, wandb shim, CLI output helpers."""

import os
import time

import numpy as np
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.cli import save_threshold_outputs
from vit_ocm_wmsegmentation_tpu.utils.profiling import StepTimer, annotate, device_memory_stats
from vit_ocm_wmsegmentation_tpu.utils.wandb_shim import get_wandb


def test_step_timer():
    t = StepTimer()
    t.start()
    for _ in range(3):
        time.sleep(0.01)
        t.step(items=4)
    assert t.steps == 3 and t.items == 12
    assert 0 < t.steps_per_sec < 1000
    assert t.items_per_sec == t.steps_per_sec * 4


def test_annotate_context():
    with annotate("test-span"):
        pass  # must not raise


def test_device_memory_stats_dict():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_wandb_shim_noop():
    wandb, enabled = get_wandb(False)
    assert not enabled
    wandb.init(project="x")  # all no-ops
    wandb.log({"a": 1})
    wandb.Image(np.zeros((2, 2)))


def test_wandb_shim_writes_offline_panels(tmp_path):
    """With wandb requested but not installed, the shim persists scalars to
    JSONL and wandb.Image panels as PNGs — observability parity with the
    reference's W&B image logging (mim.py:200-220, eval.py:258-282)."""
    import json

    from PIL import Image

    wandb, enabled = get_wandb(True, output_dir=str(tmp_path))
    assert enabled  # file-backed: callers log the full panel set
    wandb.init(project="x")
    wandb.log(
        {"loss": 0.5,
         "Masks": [wandb.Image(np.random.rand(8, 8), caption="Input"),
                   wandb.Image(np.zeros((8, 8)), caption="Mask")]},
        step=3,
    )
    rec = json.loads((tmp_path / "wandb_offline.jsonl").read_text().strip())
    assert rec == {"step": 3, "loss": 0.5}
    pngs = sorted(p.name for p in (tmp_path / "wandb_images" / "step3").iterdir())
    assert pngs == ["Masks_Input.png", "Masks_Mask.png"]
    assert Image.open(tmp_path / "wandb_images" / "step3" / "Masks_Input.png").size == (8, 8)
    wandb.finish()


def test_wandb_shim_image_dtype_semantics():
    """wandb.Image parity: uint8 passes through (no contrast stretch), floats
    in [0,1] scale by 255, constant panels keep their shade (a fully-masked
    all-255 'Mask' panel must not be written as black)."""
    from vit_ocm_wmsegmentation_tpu.utils.wandb_shim import _to_u8

    u8 = np.array([[100, 140], [0, 255]], dtype=np.uint8)
    assert np.array_equal(_to_u8(u8), u8)  # no min-max stretch
    assert np.array_equal(_to_u8(np.full((4, 4), 255, np.uint8)),
                          np.full((4, 4), 255, np.uint8))
    f01 = np.array([[0.0, 0.5], [1.0, 0.25]], dtype=np.float32)
    assert np.array_equal(_to_u8(f01), np.array([[0, 127], [255, 63]], np.uint8))
    assert np.array_equal(_to_u8(np.full((2, 2), 300.0)), np.full((2, 2), 255, np.uint8))


def test_imsave_fast_matches_matplotlib_viridis(tmp_path):
    """The streaming writer's device-side quantization + LUT gather must
    reproduce plt.imsave's default-colormap PNG pixel-for-pixel."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from PIL import Image

    from vit_ocm_wmsegmentation_tpu.cli import imsave_fast

    rng = np.random.default_rng(7)
    arr = rng.random((16, 16)).astype(np.float32) * 3.0 - 1.0
    plt.imsave(str(tmp_path / "mpl.png"), arr, format="png")
    norm = (arr - arr.min()) / (arr.max() - arr.min())
    idx = np.clip(np.floor(norm * 256.0), 0, 255).astype(np.uint8)
    imsave_fast(str(tmp_path / "fast.png"), idx)
    a = np.asarray(Image.open(tmp_path / "mpl.png").convert("RGB"))
    b = np.asarray(Image.open(tmp_path / "fast.png").convert("RGB"))
    np.testing.assert_array_equal(a, b)


def test_save_threshold_outputs_writes_artifact_set(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    attn = rng.random((32, 32)).astype(np.float32)
    th, th2, th3 = save_threshold_outputs(str(tmp_path), img, attn)
    for f in ("result.png", "OTSU_th_average.png", "OTSU_th_original.png",
              "weighted_iamge_attention.png", "heatmap_otsu_attention.png", "temp.png"):
        assert os.path.exists(tmp_path / f), f
    assert set(np.unique(th)) <= {0, 255}
    # named subdirectory variant (threshold(..., name=...), utils.py:96-104)
    save_threshold_outputs(str(tmp_path), img, attn, name="sub")
    assert os.path.exists(tmp_path / "sub" / "OTSU_th_average.png")
