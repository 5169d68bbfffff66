"""ViT backbone parity vs a torch oracle (fp32 tolerance, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.ops import attention as att
from vit_ocm_wmsegmentation_tpu.train.checkpoint import vit_params_from_torch, clean_torch_state_dict

from torch_oracle import make_vit_state_dict, get_intermediate_feat as torch_feat

CFG = vit.ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2, pretrain_img_size=32)


@pytest.fixture(scope="module")
def sd():
    gen = torch.Generator().manual_seed(0)
    return make_vit_state_dict(gen, patch=8, dim=32, depth=3, heads=2, pretrain_img=32)


@pytest.fixture(scope="module")
def params(sd):
    return vit_params_from_torch(sd, CFG)


def _rand_img(shape, seed=1):
    rng = np.random.default_rng(seed)
    return rng.random(shape, dtype=np.float32)


@pytest.mark.parametrize("img_size", [32, 48])
def test_get_intermediate_feat_matches_torch(sd, params, img_size):
    """feats/attns/qkvs of the last block match the reference semantics,
    including bicubic pos-embed interpolation at non-pretrain sizes."""
    x = _rand_img((2, img_size, img_size, 3))
    feats, attns, qkvs = vit.get_intermediate_feat(params, CFG, jnp.asarray(x), n=1)
    tf, ta, tq = torch_feat(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), depth=3, heads=2, patch=8, n=1)
    np.testing.assert_allclose(np.asarray(feats[0]), tf[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attns[0]), ta[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qkvs[0]), tq[0].numpy(), atol=2e-5)


def test_get_intermediate_feat_multi_block(sd, params):
    x = _rand_img((1, 32, 32, 3), seed=3)
    feats, attns, _ = vit.get_intermediate_feat(params, CFG, jnp.asarray(x), n=2)
    tf, ta, _ = torch_feat(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), depth=3, heads=2, patch=8, n=2)
    assert feats.shape[0] == 2
    for i in range(2):
        np.testing.assert_allclose(np.asarray(feats[i]), tf[i].numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(attns[i]), ta[i].numpy(), atol=2e-5)


def test_cls_attention_grid_equals_materialized(params):
    """The O(N) CLS-row fast path equals row 0 of the full attention matrix."""
    x = jnp.asarray(_rand_img((2, 48, 48, 3), seed=5))
    _, attns, _ = vit.get_intermediate_feat(params, CFG, x, n=1)
    grid = vit.cls_attention_grid(params, CFG, x)
    want = np.asarray(attns[0][:, :, 0, 1:]).reshape(2, 2, 6, 6)
    np.testing.assert_allclose(np.asarray(grid), want, atol=1e-6)


def test_query_attention_rows(params):
    x = jnp.asarray(_rand_img((1, 32, 32, 3), seed=6))
    _, attns, _ = vit.get_intermediate_feat(params, CFG, x, n=1)
    rows = vit.query_attention_rows(params, CFG, x, jnp.array([0, 3, 7]))
    np.testing.assert_allclose(np.asarray(rows), np.asarray(attns[0][:, :, [0, 3, 7], :]), atol=1e-6)


def test_last_block_key_features(params):
    x = jnp.asarray(_rand_img((1, 48, 48, 3), seed=7))
    _, _, qkvs = vit.get_intermediate_feat(params, CFG, x, n=1)
    k = np.asarray(qkvs[0][1])  # (B, h, N, d)
    n = k.shape[2]
    k_flat = k.transpose(0, 2, 1, 3).reshape(1, n, -1)[:, 1:, :]
    got = np.asarray(vit.last_block_key_features(params, CFG, x)).reshape(1, -1, CFG.embed_dim)
    np.testing.assert_allclose(got, k_flat, atol=1e-6)


def test_mha_fused_matches_materialized(params):
    bp = vit.block_params(params, 0)
    x = jnp.asarray(_rand_img((2, 37, 32), seed=8))  # odd N exercises padding
    full = att.mha(x, bp["attn"], CFG.num_heads)
    fused = att.mha_fused(x, bp["attn"], CFG.num_heads, q_chunk=16)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full), atol=2e-5)


def test_forward_features_jits(params):
    x = jnp.asarray(_rand_img((1, 32, 32, 3)))
    f = jax.jit(lambda p, x: vit.forward_features(p, CFG, x))
    out = f(params, x)
    assert out.shape == (1, 17, 32)
    out2 = vit.forward_features(params, CFG, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_pos_embed_interp_matches_torch(sd, params):
    """Bicubic A=-0.75 with the reference's +0.1 scale fudge, vs torch."""
    import torch.nn.functional as F

    pos = sd["pos_embed"][:, 1:]
    g, dim = 4, 32
    for out_g in (6, 9):
        scale = (out_g + 0.1) / g
        want = F.interpolate(
            pos.reshape(1, g, g, dim).permute(0, 3, 1, 2), scale_factor=(scale, scale), mode="bicubic"
        )
        want = want.permute(0, 2, 3, 1).reshape(1, -1, dim).numpy()
        got = vit.interpolate_pos_embed(params, CFG, (out_g, out_g))[:, 1:]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_clean_state_dict_ritual():
    inner = {"module.backbone.cls_token": torch.zeros(1)}
    sd = {"teacher": inner, "optimizer": {}}
    out = clean_torch_state_dict(sd, "teacher")
    assert list(out) == ["cls_token"]
    # trained-checkpoint variant: {"model": {...}}
    out2 = clean_torch_state_dict({"model": {"blocks.0.x": 1}}, "teacher")
    assert "blocks.0.x" in out2


def test_init_shapes():
    params = vit.init(CFG, jax.random.PRNGKey(0))
    assert params["pos_embed"].shape == (1, 17, 32)
    assert params["blocks"]["attn"]["wqkv"].shape == (3, 32, 96)
    x = jnp.asarray(_rand_img((1, 32, 32, 3)))
    assert vit.forward_cls(params, CFG, x).shape == (1, 32)


def test_load_reference_format_trained_checkpoint(tmp_path, sd):
    """The reference's save_checkpoint writes {model, optimizer, epoch, ...}
    (utils.py:375-385); eval.py loads state_dict['model'] after prefix
    stripping. The converter must handle that file format end-to-end."""
    from vit_ocm_wmsegmentation_tpu.train.checkpoint import load_torch_checkpoint

    payload = {
        "model": {"module." + k: v for k, v in sd.items()},
        "optimizer": {"state": {}},
        "lr_scheduler": {},
        "max_accuracy": 0.5,
        "epoch": 7,
        "config": {"TAG": "x"},
    }
    path = tmp_path / "ckpt_epoch_7.pth"
    torch.save(payload, str(path))
    params = load_torch_checkpoint(str(path), CFG, checkpoint_key="teacher")
    direct = vit_params_from_torch(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_conversion_round_trip(sd, params):
    """params -> torch state_dict -> params is the identity; the exported
    dict matches the original torch tensors."""
    from vit_ocm_wmsegmentation_tpu.train.checkpoint import vit_params_to_torch

    exported = vit_params_to_torch(params, CFG)
    for k, v in exported.items():
        np.testing.assert_allclose(v, sd[k].numpy(), atol=1e-7, err_msg=k)
    back = vit_params_from_torch(exported, CFG, checkpoint_key=None)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_get_intermediate_layers_matches_feats(params):
    """get_intermediate_layers (:248-256) returns the same normed tokens as
    get_intermediate_feat's feats."""
    x = jnp.asarray(_rand_img((1, 32, 32, 3), seed=9))
    layers = vit.get_intermediate_layers(params, CFG, x, n=2)
    feats, _, _ = vit.get_intermediate_feat(params, CFG, x, n=2)
    np.testing.assert_allclose(np.asarray(layers), np.asarray(feats), atol=1e-6)


def test_partial_checkpoint_load_strict_false_semantics():
    """A depth-4 MIM encoder checkpoint loaded into the depth-12 eval model
    fills blocks 0-3 and keeps the fresh init for 4-11 — the reference's own
    trained-eval flow (model.py:91-109 trains depth 4; eval.py:76 loads with
    strict=False). Without fresh_params the missing block raises."""
    import numpy as np
    import pytest as _pytest

    from vit_ocm_wmsegmentation_tpu.train.checkpoint import (
        vit_params_from_torch,
        vit_params_to_torch,
    )

    cfg4 = vit.ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2,
                         pretrain_img_size=32)
    cfg12 = vit.ViTConfig(patch_size=8, embed_dim=32, depth=12, num_heads=2,
                          pretrain_img_size=32)
    trained = vit.init(cfg4, jax.random.PRNGKey(1))
    sd = vit_params_to_torch(trained, cfg4)
    fresh = vit.init(cfg12, jax.random.PRNGKey(2))

    merged = vit_params_from_torch(sd, cfg12, fresh_params=fresh)
    for g, leaf in (("attn", "wqkv"), ("mlp", "w1"), ("norm1", "scale")):
        got = np.asarray(merged["blocks"][g][leaf])
        np.testing.assert_allclose(got[:4], np.asarray(trained["blocks"][g][leaf]), atol=1e-7)
        np.testing.assert_allclose(got[4:], np.asarray(fresh["blocks"][g][leaf][4:]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(merged["patch_embed"]["kernel"]),
                               np.asarray(trained["patch_embed"]["kernel"]), atol=1e-7)

    with _pytest.raises(KeyError):
        vit_params_from_torch(sd, cfg12)

    # strict=False covers the NON-block keys too: an encoder export missing
    # pos_embed and the final norm keeps the fresh values for those, fills
    # everything else from the checkpoint (and still raises without
    # fresh_params)
    sd_trim = {k: v for k, v in sd.items()
               if k not in ("pos_embed", "norm.weight", "norm.bias")}
    merged2 = vit_params_from_torch(sd_trim, cfg12, fresh_params=fresh)
    np.testing.assert_allclose(np.asarray(merged2["pos_embed"]),
                               np.asarray(fresh["pos_embed"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(merged2["norm"]["scale"]),
                               np.asarray(fresh["norm"]["scale"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(merged2["cls_token"]),
                               np.asarray(trained["cls_token"]), atol=1e-7)
    with _pytest.raises(KeyError):
        vit_params_from_torch(sd_trim, cfg4)
