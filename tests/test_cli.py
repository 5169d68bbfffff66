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


def test_sweep_dry_run():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "sweep.py"), os.path.join(ROOT, "eval.yaml"), "--dry_run"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "4 runs over eval.py" in r.stdout
