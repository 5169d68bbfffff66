"""Entry-point smoke: every CLI imports, parses --help, and errors cleanly.

Guards against import-time breakage of the public scripts (the reference's
only 'interface contract' is these argparse surfaces)."""

import subprocess
import sys
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
CLIS = [
    "analyse_attention.py",
    "eval.py",
    "mim.py",
    "sw_processing.py",
    "finetune.py",
    "PGT.py",
    "unet.py",
    "croping.py",
    "sweep.py",
    os.path.join("Allen_data_Backbone", "train.py"),
    os.path.join("Allen_Structure_ROIs_dataset", "allen_dataset_generator_script.py"),
]


@pytest.mark.parametrize("script", CLIS)
def test_cli_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), "--help"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower() or "usage" in r.stderr.lower()


def test_mim_crop_eval_wiring(tmp_path, monkeypatch):
    """Regression: mim.py with --crop 4 + eval_dataset_path must build eval
    samples with the crop grid (crop>1 validate needs sample.crop_image);
    round 2 briefly built them crop-less and crashed on the first epoch's
    eval. Runs mim.main() in-process with a tiny monkeypatched model."""
    import numpy as np
    from PIL import Image

    import mim
    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(8):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"im{i}.png")
    for sub in ("images", "labels"):
        (tmp_path / "eval" / sub).mkdir(parents=True)
    for i in range(2):
        Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
            tmp_path / "eval" / "images" / f"e{i}.png")
        Image.fromarray(((rng.random((32, 32)) > 0.5) * 255).astype(np.uint8)).save(
            tmp_path / "eval" / "labels" / f"e{i}.png")

    monkeypatch.setattr(simmim_mod, "mim_vit_config", lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img))
    monkeypatch.setattr(sys, "argv", [
        "mim.py", "--image_path", str(img_dir), "--image_size", "32",
        "--batch_size", "8", "--epochs", "1", "--warmup_epochs", "0",
        "--eval_dataset_path", str(tmp_path / "eval"), "--crop", "4",
        "--output", str(tmp_path / "out"), "--output_dir", str(tmp_path / "out")])
    mim.main()  # crashes with AssertionError on unfixed wiring


def test_sw_processing_stream_mode(tmp_path, monkeypatch):
    """Directory input streams every mosaic through the pipelined
    decode|compute|write stages and writes one artifact set per image."""
    import numpy as np
    from PIL import Image

    import sw_processing
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = vit.init(cfg, __import__("jax").random.PRNGKey(0))
    monkeypatch.setattr(sw_processing, "load_model",
                        lambda *a, **k: (params, cfg, "random"))

    rng = np.random.default_rng(3)
    src = tmp_path / "mosaics"
    src.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((64, 64)) * 255).astype(np.uint8)).save(src / f"m{i}.png")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "sw_processing.py", "--image_path", str(src), "--image_size", "96",
        "--window_size", "48", "--stride", "16", "--output_dir", str(out)])
    sw_processing.main()
    for i in range(3):
        for f in ("attention_map_sw.jpg", "otsu_sw_heatmap.jpg", "otsu_sw.jpg"):
            assert (out / f"m{i}" / f).exists()


def test_sweep_dry_run():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "sweep.py"), os.path.join(ROOT, "eval.yaml"), "--dry_run"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "4 runs over eval.py" in r.stdout
