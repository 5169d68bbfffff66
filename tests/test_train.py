"""Training stack: schedules vs timm formulas, optimizer masking, MIM loop."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.data import MaskGenerator, build_simmim_loader
from vit_ocm_wmsegmentation_tpu.models import simmim
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.train import optim, schedule
from vit_ocm_wmsegmentation_tpu.train.mim_trainer import make_train_step, train_mim
from vit_ocm_wmsegmentation_tpu.utils.config import default_config

CFG = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def test_cosine_schedule_values():
    fn = schedule.cosine_lr(base_lr=1e-3, min_lr=1e-5, warmup_lr=1e-7, warmup_steps=10, total_steps=100)
    assert float(fn(0)) == pytest.approx(1e-7)
    # linear warmup
    assert float(fn(5)) == pytest.approx(1e-7 + 5 * (1e-3 - 1e-7) / 10)
    # timm warmup_prefix=False: cosine uses the raw t
    t = 50
    want = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * t / 100))
    assert float(fn(t)) == pytest.approx(want, rel=1e-6)


def test_multistep_schedule_values():
    fn = schedule.multistep_lr(1e-3, 1e-7, warmup_steps=0, milestones=[10, 20], gamma=0.1)
    assert float(fn(5)) == pytest.approx(1e-3)
    assert float(fn(10)) == pytest.approx(1e-4)
    assert float(fn(25)) == pytest.approx(1e-5)


def test_linear_and_step_schedules():
    lin = schedule.linear_lr(1e-3, 1e-7, warmup_steps=0, total_steps=100)
    assert float(lin(100)) == pytest.approx(1e-3 * 0.01, rel=1e-5)
    st = schedule.step_lr(1e-3, 1e-7, warmup_steps=0, decay_steps=30, decay_rate=0.1)
    assert float(st(65)) == pytest.approx(1e-5)


def test_build_schedule_from_config():
    cfg = default_config()
    fn = schedule.build_schedule(cfg, n_iter_per_epoch=10)
    assert float(fn(0)) == pytest.approx(cfg.TRAIN.WARMUP_LR)


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------


def test_decay_mask_exempts_1d_params():
    params = simmim.init(CFG, jax.random.PRNGKey(0))
    mask = optim.decay_mask(params)
    assert mask["blocks"]["attn"]["wqkv"] is True or bool(mask["blocks"]["attn"]["wqkv"])
    assert not mask["norm"]["scale"]
    assert not mask["patch_embed"]["bias"]
    assert mask["pos_embed"]  # (1,N,D): reference gives pos_embed decay


# ---------------------------------------------------------------------------
# MIM training
# ---------------------------------------------------------------------------


def _tiny_cfg(tmp_path):
    cfg = default_config()
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.MASK_PATCH_SIZE = 8
    cfg.DATA.MASK_RATIO = 0.5
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.WARMUP_EPOCHS = 1
    cfg.TRAIN.BASE_LR = 1e-3
    cfg.SAVE_FREQ = 10  # skip checkpoint IO in the loop test
    cfg.PRINT_FREQ = 1
    cfg.OUTPUT = str(tmp_path)
    return cfg


def test_train_step_reduces_loss():
    cfg = _tiny_cfg("/tmp")
    vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    tx = optim.build_optimizer(cfg, params, lambda t: 1e-3)
    opt_state = tx.init(params)
    step = make_train_step(vit_cfg, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((4, 4, 4)) > 0.5).astype(np.int32))
    losses = []
    for _ in range(8):
        params, opt_state, loss, gnorm = step(params, opt_state, x, mask)
        losses.append(float(loss))
        assert float(gnorm) >= 0
    assert losses[-1] < losses[0]


def test_amp_step_matches_fp32_and_keeps_f32_state():
    """amp=True (AMP_OPT_LEVEL, config.py:176): bf16 forward/backward must
    (a) keep master params, grads and opt state float32, (b) produce a step
    numerically close to the fp32 step (bf16 has ~3 decimal digits), and
    (c) train: loss decreases over a few steps."""
    cfg = _tiny_cfg("/tmp")
    vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params0 = simmim.init(vit_cfg, jax.random.PRNGKey(0))
    tx = optim.build_optimizer(cfg, params0, lambda t: 1e-3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((4, 4, 4)) > 0.5).astype(np.int32))

    fresh = lambda: jax.tree.map(jnp.copy, params0)
    step32 = make_train_step(vit_cfg, tx)
    step16 = make_train_step(vit_cfg, tx, amp=True)

    p32 = fresh()
    p32, _, loss32, _ = step32(p32, tx.init(p32), x, mask)
    p16 = fresh()
    st16 = tx.init(p16)
    p16, st16, loss16, gnorm16 = step16(p16, st16, x, mask)

    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(p16))
    assert all(a.dtype != jnp.bfloat16 for a in jax.tree.leaves(st16))
    assert abs(float(loss16) - float(loss32)) < 0.02 * max(abs(float(loss32)), 1e-6)
    # one AdamW step moves each param by ~lr; bf16 grad noise perturbs the
    # direction but not the scale
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)

    losses = [float(loss16)]
    for _ in range(7):
        p16, st16, loss, _ = step16(p16, st16, x, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_mlp_remat_variants_match_stock_gradients():
    """The training-path MLP remat modes (models/vit.py::MLP_REMAT) change
    only WHERE gelu/LN are evaluated (recomputed inside the backward
    matmuls), never the math: loss and every gradient leaf must match the
    stock autodiff graph to f32 rounding."""
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod

    params = simmim.init(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    def lossf(p):
        return simmim.mim_loss(p, CFG, x, mask, train=True)[0]

    saved = vit_mod.MLP_REMAT
    outs = {}
    try:
        for mode in (None, "gelu", "gelu+ln"):
            vit_mod.MLP_REMAT = mode
            outs[mode] = jax.value_and_grad(lossf)(params)
    finally:
        vit_mod.MLP_REMAT = saved

    l0, g0 = outs[None]
    for mode in ("gelu", "gelu+ln"):
        l, g = outs[mode]
        assert float(l) == pytest.approx(float(l0), abs=1e-7)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_gradient_accumulation_matches_big_batch():
    """ACCUMULATION_STEPS=4 over four batch-2 micro-steps == one batch-8 step
    (final params equal). Holds because the MIM loss is a masked mean and the
    per-sample mask count is constant (MaskGenerator's ratio-ceil), so the
    mean of micro-batch gradients equals the big-batch gradient; clipping
    applies to the averaged gradient in both cases.

    Replaces the reference's accumulation branch (mim.py:157-171) — which
    never worked: it calls clip_grad_norm_(optimizer, ...) on the optimizer
    object instead of the parameters (documented delta, PARITY.md)."""
    vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=32)
    params0 = simmim.init(vit_cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
    # equal mask count per sample: 8 of 16 patches
    m = np.zeros((8, 16), np.int32)
    for i in range(8):
        m[i, rng.permutation(16)[:8]] = 1
    mask = jnp.asarray(m.reshape(8, 4, 4))

    fresh = lambda: jax.tree.map(jnp.copy, params0)  # steps donate buffers

    cfg_big = default_config()
    cfg_big.TRAIN.ACCUMULATION_STEPS = 0
    tx_big = optim.build_optimizer(cfg_big, params0, lambda t: 1e-3)
    step_big = make_train_step(vit_cfg, tx_big)
    p = fresh()
    p_big, *_ = step_big(p, tx_big.init(p), x, mask)

    cfg_acc = default_config()
    cfg_acc.TRAIN.ACCUMULATION_STEPS = 4
    tx_acc = optim.build_optimizer(cfg_acc, params0, lambda t: 1e-3)
    step_acc = make_train_step(vit_cfg, tx_acc)
    p_acc = fresh()
    st = tx_acc.init(p_acc)
    for i in range(4):
        before = np.asarray(p_acc["cls_token"])  # host copy (donation-safe)
        p_acc, st, _, _ = step_acc(p_acc, st, x[2 * i : 2 * i + 2], mask[2 * i : 2 * i + 2])
        if i < 3:  # params must not move before the k-th micro-step
            np.testing.assert_array_equal(np.asarray(p_acc["cls_token"]), before)

    for a, b in zip(jax.tree.leaves(p_big), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_gradient_accumulation_schedule_advances_in_raw_iterations():
    """The lr schedule's horizon is in RAW iterations (build_schedule), and
    the reference steps its scheduler with the raw index at each update tick
    (mim.py:168-171: step_update(epoch*num_steps+idx)). Under
    optax.MultiSteps the inner count ticks once per k raw steps, so
    build_optimizer must evaluate the schedule at t*k + k-1 — otherwise the
    lr decays k-times too slowly (r3 review finding). Discriminator: a
    schedule that is 0 at raw step 0 and nonzero from raw step 1; with k=2
    the first update happens at raw idx 1 and must move the params."""
    vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        pretrain_img_size=32)
    params0 = simmim.init(vit_cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    sched = lambda t: jnp.where(t >= 1, 1e-3, 0.0)
    cfg = default_config()
    cfg.TRAIN.ACCUMULATION_STEPS = 2
    tx = optim.build_optimizer(cfg, params0, sched)
    step = make_train_step(vit_cfg, tx)
    p = jax.tree.map(jnp.copy, params0)
    st = tx.init(p)
    p, st, _, _ = step(p, st, x, mask)
    p, st, _, _ = step(p, st, x, mask)  # update tick: raw idx 1, lr 1e-3
    moved = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(p),
                                jax.tree.leaves(params0)))
    assert moved > 1e-6, "first accumulation update applied schedule(0)=0"


def test_train_mim_end_to_end(tmp_path):
    # synthetic image folder
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    # cfg.TRAIN.MLP_REMAT / LN_QKV must flow through train_mim into the
    # models.vit module routes (set_train_kernel_modes)
    cfg.TRAIN.MLP_REMAT = "gelu+ln"
    cfg.TRAIN.LN_QKV = "none"
    # shrink the model via monkeypatching the MIM config (full ViT-S is too
    # slow for a CPU unit test)
    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod
    import vit_ocm_wmsegmentation_tpu.models.vit as vit_mod

    orig = simmim_mod.mim_vit_config
    saved_routes = (vit_mod.MLP_REMAT, vit_mod.LN_QKV)
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    try:
        loader = build_simmim_loader(str(img_dir), batch_size=2, img_size=32,
                                     mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
        params, history = train_mim(cfg, loader, eval_fn=None)
        assert (vit_mod.MLP_REMAT, vit_mod.LN_QKV) == ("gelu+ln", None)
    finally:
        simmim_mod.mim_vit_config = orig
        vit_mod.MLP_REMAT, vit_mod.LN_QKV = saved_routes
    assert len(history) == 2
    assert np.isfinite(history).all()
    # checkpoint written at final epoch
    assert any(d.startswith("ckpt_epoch_") for d in os.listdir(cfg.OUTPUT))


def test_train_mim_bare_vit_pretrained_weights(tmp_path):
    """A bare ViT checkpoint (DINO-style, no encoder./decoder. prefixes) must
    init the encoder while KEEPING the fresh mask_token/decoder — replacing
    the whole tree crashes the first step with KeyError('mask_token')."""
    import torch

    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
    from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt_mod

    src = vit_mod.init(CFG, jax.random.PRNGKey(7))
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                ckpt_mod.vit_params_to_torch(src, CFG).items()}, tmp_path / "vit.pth")

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"im{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    cfg.defrost()
    cfg.PRETRAINED_WEIGHTS = str(tmp_path / "vit.pth")
    cfg.freeze()
    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod

    orig = simmim_mod.mim_vit_config
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img)
    # spy on the load so the test can assert the checkpoint REALLY
    # initialized the encoder (a silent fallthrough to the reference-style
    # random-init fallback used to keep this test green — r3 review finding)
    loaded = {}
    orig_load = ckpt_mod.load_mim_or_vit_checkpoint

    def spy_load(*a, **k):
        out = orig_load(*a, **k)
        loaded["params"] = jax.tree.map(np.asarray, out)
        return out

    ckpt_mod.load_mim_or_vit_checkpoint = spy_load
    try:
        loader = build_simmim_loader(str(img_dir), batch_size=2, img_size=32,
                                     mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
        params, history = train_mim(cfg, loader, eval_fn=None)
    finally:
        simmim_mod.mim_vit_config = orig
        ckpt_mod.load_mim_or_vit_checkpoint = orig_load
    assert np.isfinite(history).all()
    # the encoder weights at load time equal the saved bare-ViT tree (exact
    # load, not a random re-init), while the fresh mask_token/decoder remain
    assert "params" in loaded, "PRETRAINED_WEIGHTS never reached the loader"
    np.testing.assert_allclose(
        loaded["params"]["blocks"]["attn"]["wqkv"],
        np.asarray(src["blocks"]["attn"]["wqkv"]), atol=1e-6)
    np.testing.assert_allclose(loaded["params"]["cls_token"],
                               np.asarray(src["cls_token"]), atol=1e-6)
    assert "decoder" in params and "mask_token" in params


def test_interpolate_pos_embed_uses_table_size():
    """Reference derives the source grid from the pos table's own length
    (vision_transformer.py:177): a table pretrained at another resolution
    than cfg.pretrain_img_size must interpolate, not broadcast-crash."""
    from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod

    params = vit_mod.init(CFG, jax.random.PRNGKey(0))  # table grid 4 (32/8)
    big = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=48)  # pos_grid 6 != table grid
    pos = vit_mod.interpolate_pos_embed(params, big, (6, 6))
    assert pos.shape == (1, 37, 32) and bool(jnp.isfinite(pos).all())
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    feats = vit_mod.forward_features(params, big, x)
    assert feats.shape[1] == 37


def test_reduce_lr_on_plateau_threshold():
    """torch semantics: improvement needs metric < best*(1-1e-4); a loss
    creeping down by 1e-6/epoch must still trigger the decay."""
    from vit_ocm_wmsegmentation_tpu.train.supervised import ReduceLROnPlateau

    sched = ReduceLROnPlateau(1.0, patience=5, factor=0.1)
    lr = sched.step(1.0)
    for i in range(6):  # 6 non-improving epochs (rel change ~1e-6)
        lr = sched.step(1.0 - (i + 1) * 1e-6)
    assert lr == pytest.approx(0.1)
    # a real improvement resets the counter
    sched2 = ReduceLROnPlateau(1.0, patience=2, factor=0.1)
    sched2.step(1.0)
    sched2.step(0.5)
    sched2.step(0.51)
    sched2.step(0.52)
    assert sched2.step(0.4) == pytest.approx(1.0)


def test_mask_generator_semantics():
    gen = MaskGenerator(input_size=32, mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
    rng = np.random.default_rng(2)
    m = gen(rng)
    assert m.shape == (4, 4)
    assert m.sum() == int(np.ceil(16 * 0.5))
    gen2 = MaskGenerator(input_size=32, mask_patch_size=16, model_patch_size=8, mask_ratio=0.6)
    m2 = gen2(rng)
    assert m2.shape == (4, 4)
    # coarse cells expand to 2x2 blocks
    assert np.array_equal(m2[0::2, 0::2], m2[1::2, 1::2])


def test_auto_resume_from_latest_checkpoint(tmp_path):
    """TRAIN.AUTO_RESUME restores params and continues at epoch+1."""
    from PIL import Image as PILImage

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        PILImage.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(img_dir / f"{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    cfg.SAVE_FREQ = 1
    cfg.TRAIN.EPOCHS = 1
    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod

    orig = simmim_mod.mim_vit_config
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    try:
        loader = build_simmim_loader(str(img_dir), batch_size=2, img_size=32,
                                     mask_patch_size=8, model_patch_size=8, mask_ratio=0.5)
        train_mim(cfg, loader)  # writes ckpt_epoch_0
        cfg.defrost()
        cfg.TRAIN.EPOCHS = 2
        _, history = train_mim(cfg, loader)  # must resume at epoch 1
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history) == 1  # only epoch 1 ran


def test_train_mim_pipeline_parallel_end_to_end(tmp_path):
    """cfg.TRAIN.PP_STAGES routes train_mim through the GPipe step
    (parallel/pp.py) on the 8-virtual-device ('data','pipe') mesh: the loop
    trains, the checkpoint on disk is stage-agnostic (plain stacked-depth
    blocks), and the returned params are plain layout."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(8):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    cfg.SAVE_FREQ = 1
    cfg.TRAIN.PP_STAGES = 2         # depth-2 tiny model -> 1 block/stage
    cfg.TRAIN.PP_MICROBATCHES = 2   # batch 8 -> microbatch 4 = data axis 4

    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod

    orig = simmim_mod.mim_vit_config
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    try:
        loader = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                     mask_patch_size=8, model_patch_size=8,
                                     mask_ratio=0.5)
        params, history = train_mim(cfg, loader, eval_fn=None)
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history) == 2 and np.isfinite(history).all()
    # returned params are plain stacked-depth layout
    assert params["blocks"]["attn"]["wqkv"].ndim == 3  # (depth, D, 3D)
    assert params["blocks"]["attn"]["wqkv"].shape[0] == 2
    # the on-disk checkpoint stores stage-agnostic params plus the
    # stage-shaped optimizer state tagged with its stage count
    from vit_ocm_wmsegmentation_tpu.train import checkpoint as ckpt_mod

    latest = ckpt_mod.latest_checkpoint(cfg.OUTPUT)
    assert latest is not None
    raw = ckpt_mod.restore_checkpoint_raw(latest)
    assert int(raw["pp_stages"]) == 2 and "opt_state" in raw
    assert np.asarray(raw["params"]["blocks"]["attn"]["wqkv"]).shape[0] == 2

    # same-stage AUTO_RESUME continues (full optimizer state): one more epoch
    cfg.TRAIN.EPOCHS = 3
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    try:
        loader2 = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                      mask_patch_size=8, model_patch_size=8,
                                      mask_ratio=0.5)
        params2, history2 = train_mim(cfg, loader2, eval_fn=None)
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history2) == 1  # resumed at epoch 2 of 3
    assert params2["blocks"]["attn"]["wqkv"].shape[0] == 2


def test_train_mim_plain_dp_auto_resume(tmp_path):
    """Plain dp (FSDP off) on the 8-device mesh must AUTO_RESUME: the
    orbax-restored opt_state comes back committed to device 0, and the
    jitted mesh step used to raise 'incompatible devices' because the
    non-FSDP branch never re-placed it (r3 review finding)."""
    from vit_ocm_wmsegmentation_tpu.parallel import make_mesh

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(6)
    for i in range(8):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    cfg.SAVE_FREQ = 1

    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod

    orig = simmim_mod.mim_vit_config
    tiny = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    simmim_mod.mim_vit_config = tiny
    try:
        loader = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                     mask_patch_size=8, model_patch_size=8,
                                     mask_ratio=0.5)
        _, history = train_mim(cfg, loader, eval_fn=None, mesh=make_mesh())
        assert len(history) == 2 and np.isfinite(history).all()

        cfg.TRAIN.EPOCHS = 3
        loader2 = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                      mask_patch_size=8, model_patch_size=8,
                                      mask_ratio=0.5)
        _, history2 = train_mim(cfg, loader2, eval_fn=None, mesh=make_mesh())
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history2) == 1 and np.isfinite(history2).all()


def test_train_mim_fsdp_end_to_end(tmp_path):
    """cfg.TRAIN.FSDP routes train_mim through the ZeRO-3 step on the
    8-virtual-device dp mesh: the loop trains with params + Adam moments
    actually 1/8-sharded, the orbax checkpoint round-trips the sharded
    state, and AUTO_RESUME continues with the full optimizer state."""
    from vit_ocm_wmsegmentation_tpu.parallel import make_mesh

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(8):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    cfg = _tiny_cfg(tmp_path)
    cfg.SAVE_FREQ = 1
    cfg.TRAIN.FSDP = True
    # production min_shard (4096 el/device) is sized for ViT-S leaves; the
    # tiny test model needs a smaller floor to shard anything at all
    cfg.TRAIN.FSDP_MIN_SHARD = 32

    import vit_ocm_wmsegmentation_tpu.models.simmim as simmim_mod

    orig = simmim_mod.mim_vit_config
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )

    def local_fraction(leaf):
        shard = leaf.addressable_shards[0].data
        return shard.size / leaf.size

    try:
        loader = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                     mask_patch_size=8, model_patch_size=8,
                                     mask_ratio=0.5)
        params, history = train_mim(cfg, loader, eval_fn=None,
                                    mesh=make_mesh())
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history) == 2 and np.isfinite(history).all()
    # the returned (live) params are genuinely ZeRO-sharded, not replicated
    assert local_fraction(params["blocks"]["attn"]["wqkv"]) == 1 / 8

    # resume: one more epoch, optimizer state restored from the sharded save
    cfg.TRAIN.EPOCHS = 3
    simmim_mod.mim_vit_config = lambda img, p=8: ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, pretrain_img_size=img
    )
    try:
        loader2 = build_simmim_loader(str(img_dir), batch_size=8, img_size=32,
                                      mask_patch_size=8, model_patch_size=8,
                                      mask_ratio=0.5)
        params2, history2 = train_mim(cfg, loader2, eval_fn=None,
                                      mesh=make_mesh())
    finally:
        simmim_mod.mim_vit_config = orig
    assert len(history2) == 1 and np.isfinite(history2).all()
    assert local_fraction(params2["blocks"]["attn"]["wqkv"]) == 1 / 8
