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


def test_cli_env_cpu_request_honored():
    """Regression: an explicit JAX_PLATFORMS=cpu in a fresh subprocess must
    win over the TPU-relay sitecustomize (which calls
    jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
    clobbering the env var). Without the package-level re-assert
    (vit_ocm_wmsegmentation_tpu/__init__.py) every CLI subprocess first
    initializes the axon backend — a ~25-min blocking hang whenever the
    relay is unreachable. The 60 s timeout is the assertion: CPU-only
    startup takes <2 s."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import vit_ocm_wmsegmentation_tpu, jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=60, env=env, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().splitlines()[-1] == "cpu"


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

    # --save mask writes only the mask artifact
    outm = tmp_path / "maskonly"
    monkeypatch.setattr(sys, "argv", [
        "sw_processing.py", "--image_path", str(src), "--image_size", "96",
        "--window_size", "48", "--stride", "16", "--output_dir", str(outm),
        "--save", "mask", "--writers", "2"])
    sw_processing.main()
    for i in range(3):
        assert sorted(p.name for p in (outm / f"m{i}").iterdir()) == ["otsu_sw.jpg"]

    # single-image branch (plt.imsave writer) produces the same artifact set
    out1 = tmp_path / "single"
    monkeypatch.setattr(sys, "argv", [
        "sw_processing.py", "--image_path", str(src / "m0.png"), "--image_size", "96",
        "--window_size", "48", "--stride", "16", "--output_dir", str(out1)])
    sw_processing.main()
    for f in ("attention_map_sw.jpg", "otsu_sw_heatmap.jpg", "otsu_sw.jpg"):
        assert (out1 / f).exists()


def test_sw_processing_auto_mesh_matches_single_chip(tmp_path, monkeypatch):
    """The serving CLI is multi-chip by default (VERDICT r4 next #4): on the
    conftest's 8-virtual-device backend the default run shards the tile axis
    across the mesh (like mim.py), and its masks must be IDENTICAL to a
    --mesh 0 single-chip run — for both the fused and the streamed route,
    driven through the directory/stream mode."""
    import numpy as np
    from PIL import Image

    import jax
    import sw_processing
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

    assert len(jax.devices()) > 1  # conftest virtual mesh — the point
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    monkeypatch.setattr(sw_processing, "load_model",
                        lambda *a, **k: (params, cfg, "random"))

    rng = np.random.default_rng(7)
    src = tmp_path / "mosaics"
    src.mkdir()
    for i in range(2):
        Image.fromarray((rng.random((96, 96)) * 255).astype(np.uint8)).save(src / f"m{i}.png")

    outs = {}
    for name, extra in (("mesh", []), ("single", ["--mesh", "0"]),
                        ("mesh_streamed", ["--streamed", "1"]),
                        ("single_streamed", ["--streamed", "1", "--mesh", "0"])):
        out = tmp_path / name
        monkeypatch.setattr(sys, "argv", [
            "sw_processing.py", "--image_path", str(src), "--image_size", "96",
            "--window_size", "48", "--stride", "16", "--output_dir", str(out),
            "--save", "mask", "--writers", "1"] + extra)
        sw_processing.main()
        outs[name] = [np.asarray(Image.open(out / f"m{i}" / "otsu_sw.jpg").convert("L"))
                      for i in range(2)]
    for pair in (("mesh", "single"), ("mesh_streamed", "single_streamed")):
        for a, b in zip(outs[pair[0]], outs[pair[1]]):
            np.testing.assert_array_equal(a, b)


def test_sw_processing_streamed_flag(tmp_path, monkeypatch):
    """--streamed 1 routes the mosaic through segment_mosaic_streamed (the
    bounded-memory gigapixel path, r4 CLI exposure) and must write the same
    mask the in-graph path writes; --streamed auto stays in-graph at small
    sizes."""
    import numpy as np
    from PIL import Image

    import sw_processing
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = vit.init(cfg, __import__("jax").random.PRNGKey(0))
    monkeypatch.setattr(sw_processing, "load_model",
                        lambda *a, **k: (params, cfg, "random"))

    rng = np.random.default_rng(11)
    img = tmp_path / "m.png"
    Image.fromarray((rng.random((96, 96)) * 255).astype(np.uint8)).save(img)

    outs = {}
    for name, flag in (("fused", "auto"), ("streamed", "1")):
        out = tmp_path / name
        monkeypatch.setattr(sys, "argv", [
            "sw_processing.py", "--image_path", str(img), "--image_size", "96",
            "--window_size", "48", "--stride", "16", "--output_dir", str(out),
            "--streamed", flag])
        sw_processing.main()
        outs[name] = np.asarray(Image.open(out / "otsu_sw.jpg").convert("L"))
    # jpg quantization aside, the two masks must agree (identical numbers
    # upstream of the writer; tests/test_pipeline.py pins exact equality at
    # the array level)
    agree = (outs["fused"] == outs["streamed"]).mean()
    assert agree > 0.999, f"streamed CLI mask diverged: agreement {agree}"


def test_sw_processing_quant_int8_flag(tmp_path, monkeypatch):
    """--quant int8 drives the full CLI through the dynamic-W8A8 inference
    path (ops/quant.py) and still writes the artifact set; the module-global
    mode is restored afterwards so other tests see full precision."""
    import numpy as np
    from PIL import Image

    import sw_processing
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig, set_infer_quant
    from vit_ocm_wmsegmentation_tpu.ops import quant

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = vit.init(cfg, __import__("jax").random.PRNGKey(0))
    monkeypatch.setattr(sw_processing, "load_model",
                        lambda *a, **k: (params, cfg, "random"))

    rng = np.random.default_rng(7)
    img = tmp_path / "m.png"
    Image.fromarray((rng.random((64, 64)) * 255).astype(np.uint8)).save(img)
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "sw_processing.py", "--image_path", str(img), "--image_size", "96",
        "--window_size", "48", "--stride", "16", "--output_dir", str(out),
        "--quant", "int8"])
    try:
        sw_processing.main()
        assert quant.MODE == "int8"  # the flag actually reached the op layer
    finally:
        set_infer_quant("auto")
    for f in ("attention_map_sw.jpg", "otsu_sw_heatmap.jpg", "otsu_sw.jpg"):
        assert (out / f).exists()


def test_sweep_false_bool_arm_sends_empty_string():
    """The entry scripts keep the reference's type=bool flags where
    bool('False') is True; a false grid arm must go over as '' or both
    sweep arms silently run with the flag enabled."""
    import sweep

    cmd = sweep.build_cmd("mim.py", {"early_stopping": False, "mask_ratio": 0.5})
    i = cmd.index("--early_stopping")
    assert cmd[i + 1] == ""
    assert cmd[cmd.index("--mask_ratio") + 1] == "0.5"


def test_str2bool_and_finetune_flag(monkeypatch):
    """--finetune False must actually freeze the encoder (new flag, so it
    uses str2bool, unlike the parity-replicated type=bool flags)."""
    import finetune
    from vit_ocm_wmsegmentation_tpu.cli import str2bool

    assert str2bool("False") is False and str2bool("") is False
    assert str2bool("True") is True and str2bool("1") is True
    monkeypatch.setattr(sys, "argv", ["finetune.py", "--image_path", "d",
                                      "--finetune", "False", "--image_size", "256"])
    args = finetune.parse_args()
    assert args.finetune is False
    assert args.H == 256  # --image_size wires through when --H is omitted


def test_croping_reference_semantics(tmp_path, monkeypatch):
    """ceil + min-clamped boxes: a 500x500 image at crop 384 yields 4 crops
    (partial edge bands KEPT), named <name>_<i>_<j>.jpg like the reference
    (croping.py:21-36)."""
    import numpy as np
    from PIL import Image

    import croping

    src = tmp_path / "in"
    src.mkdir()
    Image.fromarray(np.zeros((500, 500, 3), np.uint8)).save(src / "im.png")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", ["croping.py", "--image_path", str(src),
                                      "--output_dir", str(out),
                                      "--crop_size", "384"])
    croping.main()
    names = sorted(p.name for p in out.iterdir())
    assert names == ["im_0_0.jpg", "im_0_1.jpg", "im_1_0.jpg", "im_1_1.jpg"]
    assert Image.open(out / "im_1_1.jpg").size == (116, 116)
    assert Image.open(out / "im_0_0.jpg").size == (384, 384)


def test_croping_feeds_analyse_attention_dir_mode(tmp_path, monkeypatch):
    """Integration: the tiler's .jpg outputs must be visible to
    analyse_attention's directory glob (*.jpg) — the round-1 tiler wrote
    .png crops that its own sibling tool then ignored."""
    import numpy as np
    from PIL import Image

    import analyse_attention as aa
    import croping
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig

    src = tmp_path / "src"
    src.mkdir()
    Image.fromarray((np.random.default_rng(1).random((100, 100)) * 255)
                    .astype(np.uint8)).convert("RGB").save(src / "big.png")
    crops = tmp_path / "crops"
    monkeypatch.setattr(sys, "argv", ["croping.py", "--image_path", str(src),
                                      "--output_dir", str(crops), "--crop_size", "64"])
    croping.main()
    assert sorted(p.name for p in crops.iterdir()) == [
        "big_0_0.jpg", "big_0_1.jpg", "big_1_0.jpg", "big_1_1.jpg"]

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = vit.init(cfg, __import__("jax").random.PRNGKey(0))
    monkeypatch.setattr(aa, "load_model", lambda *a, **k: (params, cfg, "random"))
    out = tmp_path / "attn"
    monkeypatch.setattr(sys, "argv", ["analyse_attention.py", "--image_path", str(crops),
                                      "--output_dir", str(out) + "/", "--image_size", "64"])
    aa.main()
    done = sorted(p.name for p in out.iterdir())
    assert done == ["big_0_0", "big_0_1", "big_1_0", "big_1_1"]
    assert (out / "big_0_0" / "attn-average.png").exists()


def test_sweep_dry_run():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "sweep.py"), os.path.join(ROOT, "eval.yaml"), "--dry_run"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "4 runs over eval.py" in r.stdout
