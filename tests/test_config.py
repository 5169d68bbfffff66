"""Config tree: defaults, --opts merge, YAML, argparse mapping, freezing."""

import argparse

import pytest
import yaml

from vit_ocm_wmsegmentation_tpu.utils.config import CfgNode, default_config, get_config


def test_defaults_mirror_reference_keys():
    cfg = default_config()
    assert cfg.DATA.IMG_SIZE == 224
    assert cfg.TRAIN.BASE_LR == 5e-4
    assert cfg.TRAIN.CLIP_GRAD == 5.0
    assert cfg.TRAIN.LR_SCHEDULER.MULTISTEPS == [25, 30, 40]
    assert cfg.SAVE_FREQ == 5
    assert cfg.MODEL.CHECKPOINT_KEY == "teacher"


def test_merge_from_list_literals():
    cfg = default_config()
    cfg.merge_from_list(["TRAIN.EPOCHS", "50", "DATA.MASK_RATIO", "0.4", "TAG", "exp1"])
    assert cfg.TRAIN.EPOCHS == 50 and cfg.DATA.MASK_RATIO == 0.4 and cfg.TAG == "exp1"
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_merge_from_file(tmp_path):
    p = tmp_path / "o.yaml"
    p.write_text(yaml.safe_dump({"TRAIN": {"EPOCHS": 7}, "TAG": "fromfile"}))
    cfg = default_config()
    cfg.merge_from_file(str(p))
    assert cfg.TRAIN.EPOCHS == 7 and cfg.TAG == "fromfile"
    assert cfg.TRAIN.BASE_LR == 5e-4  # untouched siblings survive


def test_freeze_blocks_writes():
    cfg = default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TAG = "x"
    cfg.defrost()
    cfg.TAG = "y"
    assert cfg.TAG == "y"


def test_get_config_argparse_mapping(tmp_path):
    args = argparse.Namespace(
        opts=None, arch="vit_small", patch_size=8, batch_size=4, epochs=3,
        image_size=96, mask_patch_size=16, mask_ratio=0.5, tag="T",
        output=str(tmp_path), output_dir=str(tmp_path), image_path="",
        pretrained_weights="", checkpoint_key="teacher", warmup_epochs=1,
        num_workers=1, wandb=False, loss_operation="max", crop=1,
        median_filter=1, roi_masking=False, early_stopping=False,
        eval_dataset_path="",
    )
    cfg = get_config(args)
    assert cfg.DATA.BATCH_SIZE == 4 and cfg.TRAIN.EPOCHS == 3
    assert cfg.DATA.IMG_SIZE == 96 and cfg.DATA.MASK_PATCH_SIZE == 16
    # output dir templating: <output>/<model>/<TAG>_<size>_Experimental_Run
    assert cfg.OUTPUT.endswith("vit_small/T_96_Experimental_Run")
    # falsy-override fix: batch_size etc. map, empty strings don't clobber
    assert cfg.PRETRAINED_WEIGHTS == ""


def test_opts_override_argparse_defaults(tmp_path):
    """--opts must beat the argparse DEFAULTS of mapped flags (r3 review
    finding): previously the _ARG_MAP loop ran after merge_from_list, so
    `--opts TRAIN.EPOCHS 100` silently reverted to the --epochs default and
    falsy defaults (WANDB/roi_masking/early_stopping False) clobbered any
    True set via opts. Opts now merge LAST (yacs convention)."""
    args = argparse.Namespace(
        opts=["TRAIN.EPOCHS", "100", "WANDB", "True", "roi_masking", "True",
              "early_stopping", "True"],
        arch="vit_small", patch_size=8, batch_size=4, epochs=3,
        image_size=96, mask_patch_size=16, mask_ratio=0.5, tag="T",
        output=str(tmp_path), output_dir=str(tmp_path), image_path="",
        pretrained_weights="", checkpoint_key="teacher", warmup_epochs=1,
        num_workers=1, wandb=False, loss_operation="max", crop=1,
        median_filter=1, roi_masking=False, early_stopping=False,
        eval_dataset_path="",
    )
    cfg = get_config(args)
    assert cfg.TRAIN.EPOCHS == 100
    assert cfg.WANDB is True
    assert cfg.roi_masking is True
    assert cfg.early_stopping is True
    # flags still map when opts don't name the key
    assert cfg.DATA.BATCH_SIZE == 4


def test_dump_roundtrip():
    cfg = default_config()
    loaded = CfgNode(yaml.safe_load(cfg.dump()))
    assert loaded.TRAIN.OPTIMIZER.NAME == "adamw"
