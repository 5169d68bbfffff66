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
    wandb.finish()


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
