"""Swin classifier parity vs a transformers torch oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.models import swin


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import SwinConfig as HFConfig, SwinForImageClassification

    hf_cfg = HFConfig(
        image_size=32,
        patch_size=4,
        embed_dim=24,
        depths=[2, 2],
        num_heads=[2, 4],
        window_size=4,
        num_labels=3,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    model = SwinForImageClassification(hf_cfg).eval()
    cfg = swin.SwinConfig(img_size=32, patch_size=4, embed_dim=24, depths=(2, 2),
                          num_heads=(2, 4), window=4, num_classes=3)
    params = swin.params_from_hf(model.state_dict(), cfg)
    return model, cfg, params


def test_swin_logits_match_hf(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(swin.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_shifted_window_mask_structure():
    """The shifted-window additive mask blocks exactly the cross-region
    pairs: each window row has 0 on same-region pairs, -100 elsewhere."""
    mask = swin.shifted_window_mask(res=8, w=4, shift=2)
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    assert (mask[0] == 0).all()  # top-left window is homogeneous
    assert (mask[-1] != 0).any()  # bottom-right window mixes 4 regions
    assert (np.diagonal(mask, axis1=1, axis2=2) == 0).all()


def test_swin_init_and_forward_shapes():
    cfg = swin.SwinConfig(img_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                          num_heads=(2, 2), window=4, num_classes=5)
    params = swin.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3), dtype=np.float32))
    logits = swin.apply(params, cfg, x)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_relative_position_index_properties():
    idx = swin.relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() == 7 * 7 - 1 and idx.min() == 0
    assert (np.diag(idx) == idx[0, 0]).all()  # self-offsets share one bias


def test_full_swin_tiny_structure_matches_hf():
    """All 4 stages + 3 patch-merges of the real swin-tiny topology (small
    image keeps the CPU compile tractable; HF shrinks windows to the stage
    resolution exactly like our min(window, res))."""
    from transformers import SwinConfig as HFConfig, SwinForImageClassification

    # window 4 at 128^2 keeps window <= resolution at every stage (this
    # transformers version cannot run window > stage resolution); all 4
    # stages, 3 patch-merges and the shifted-window paths are exercised
    hf_cfg = HFConfig(image_size=128, patch_size=4, embed_dim=24, depths=[2, 2, 6, 2],
                      num_heads=[3, 6, 12, 24], window_size=4, num_labels=4,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                      drop_path_rate=0.0)
    torch.manual_seed(1)
    model = SwinForImageClassification(hf_cfg).eval()
    cfg = swin.SwinConfig(img_size=128, patch_size=4, embed_dim=24, depths=(2, 2, 6, 2),
                          num_heads=(3, 6, 12, 24), window=4, num_classes=4)
    params = swin.params_from_hf(model.state_dict(), cfg)
    x = np.random.default_rng(2).random((1, 128, 128, 3), dtype=np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(swin.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5)
