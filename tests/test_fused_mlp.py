"""Fused residual+LN+MLP Pallas kernel (ops/fused_mlp.py) vs the stock
XLA composition, in interpret mode on CPU (same technique as
tests/test_flash_attention.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import nn
from vit_ocm_wmsegmentation_tpu.models import simmim
from vit_ocm_wmsegmentation_tpu.models import vit as vit_mod
from vit_ocm_wmsegmentation_tpu.models.vit import ViTConfig
from vit_ocm_wmsegmentation_tpu.ops.fused_mlp import fused_mlp_block


def _mk(rng, R=100, D=64, H=256, dtype=np.float32):
    x = jnp.asarray(rng.normal(0, 1, (R, D)).astype(dtype))
    return (x,
            jnp.asarray(rng.normal(1, 0.1, D).astype(dtype)),
            jnp.asarray(rng.normal(0, 0.1, D).astype(dtype)),
            jnp.asarray(rng.normal(0, 0.05, (D, H)).astype(dtype)),
            jnp.asarray(rng.normal(0, 0.05, H).astype(dtype)),
            jnp.asarray(rng.normal(0, 0.05, (H, D)).astype(dtype)),
            jnp.asarray(rng.normal(0, 0.05, D).astype(dtype)))


def _ref(x, scale, bias, w1, b1, w2, b2):
    h = nn.layer_norm({"scale": scale, "bias": bias}, x, 1e-6)
    h = nn.linear({"kernel": w1, "bias": b1}, h)
    h = nn.gelu(h)
    return x + nn.linear({"kernel": w2, "bias": b2}, h)


def test_fused_mlp_forward_matches_xla():
    args = _mk(np.random.default_rng(0))
    out = fused_mlp_block(*args, 1e-6, 64, True)  # block 64 -> padding path
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(*args)),
                               atol=2e-6)


def test_fused_mlp_grads_match_xla():
    args = _mk(np.random.default_rng(1))
    gk = jax.grad(lambda a: jnp.sum(fused_mlp_block(*a, 1e-6, 64, True) ** 2))(args)
    gr = jax.grad(lambda a: jnp.sum(_ref(*a) ** 2))(args)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * scale)


def test_fused_mlp_bf16_grad_dtypes_and_closeness():
    """AMP path: bf16 primals -> bf16 cotangents, values within bf16 ULP of
    the stock bf16 graph (the kernel accumulates in f32 throughout)."""
    args = tuple(a.astype(jnp.bfloat16) for a in _mk(np.random.default_rng(2)))
    lk = lambda a: jnp.sum(fused_mlp_block(*a, 1e-6, 64, True).astype(jnp.float32) ** 2)
    lr = lambda a: jnp.sum(_ref(*a).astype(jnp.float32) ** 2)
    gk, gr = jax.grad(lk)(args), jax.grad(lr)(args)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        assert a.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.02 * scale)


def test_fused_mlp_save_gp_forward_and_grads_match_xla():
    """SAVE_GP route (backward consumes saved gelu/gelu' instead of
    recomputing from h1): forward identical to the h1 route and grads match
    the stock XLA composition at the same gates."""
    args = _mk(np.random.default_rng(4))
    out_h1 = fused_mlp_block(*args, 1e-6, 64, True, False)
    out_gp = fused_mlp_block(*args, 1e-6, 64, True, True)
    np.testing.assert_array_equal(np.asarray(out_h1), np.asarray(out_gp))

    gk = jax.grad(lambda a: jnp.sum(
        fused_mlp_block(*a, 1e-6, 64, True, True) ** 2))(args)
    gr = jax.grad(lambda a: jnp.sum(_ref(*a) ** 2))(args)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * scale)


def test_fused_mlp_save_gp_bf16_grads_close():
    """AMP shape of the SAVE_GP route: gp stored in the compute dtype
    (bf16) — the extra rounding must stay inside the same bf16-ULP gate as
    the h1-recompute route."""
    args = tuple(a.astype(jnp.bfloat16) for a in _mk(np.random.default_rng(5)))
    lk = lambda a: jnp.sum(
        fused_mlp_block(*a, 1e-6, 64, True, True).astype(jnp.float32) ** 2)
    lr = lambda a: jnp.sum(_ref(*a).astype(jnp.float32) ** 2)
    gk, gr = jax.grad(lk)(args), jax.grad(lr)(args)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        assert a.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.02 * scale)


def test_mim_step_kernel_gp_mode_matches_stock(monkeypatch):
    """MLP_REMAT='kernel' + SAVE_GP through the whole MIM loss: loss and
    grads match stock autodiff (mirrors the h1-route test above)."""
    from vit_ocm_wmsegmentation_tpu.ops import fused_mlp

    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=32)
    params = simmim.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    def lossf(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True)[0]

    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    l0, g0 = jax.value_and_grad(lossf)(params)
    monkeypatch.setattr(vit_mod, "MLP_REMAT", "kernel")
    monkeypatch.setattr(fused_mlp, "SAVE_GP", True)
    l1, g1 = jax.value_and_grad(lossf)(params)

    assert float(l1) == pytest.approx(float(l0), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale)


def test_set_train_kernel_modes_gp_choice(monkeypatch):
    """'kernel+gp'/'kernel+h1' select the fused block's backward residual
    (ops/fused_mlp.SAVE_GP); 'auto' restores the shipped default; a SAVE_GP
    flip alone clears jit caches (trace-time global)."""
    from vit_ocm_wmsegmentation_tpu.ops import fused_mlp

    monkeypatch.setattr(fused_mlp, "_SHIPPED_SAVE_GP", False)
    monkeypatch.setattr(fused_mlp, "SAVE_GP", False)
    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    monkeypatch.setattr(vit_mod, "LN_QKV", None)

    assert vit_mod.set_train_kernel_modes("kernel+gp", "auto")[0] == "kernel"
    assert fused_mlp.SAVE_GP is True
    assert vit_mod.set_train_kernel_modes("kernel+h1", "auto")[0] == "kernel"
    assert fused_mlp.SAVE_GP is False
    fused_mlp.SAVE_GP = True
    vit_mod.set_train_kernel_modes("auto", "auto")
    assert fused_mlp.SAVE_GP is False  # auto restores the shipped default

    traces = []

    @jax.jit
    def f(x):
        traces.append(fused_mlp.SAVE_GP)
        return x * (3.0 if fused_mlp.SAVE_GP else 2.0)

    x = jnp.ones((2,), jnp.float32)
    assert float(f(x)[0]) == 2.0 and len(traces) == 1
    vit_mod.set_train_kernel_modes("kernel+gp", "auto")
    assert float(f(x)[0]) == 3.0 and len(traces) == 2


def test_ln_linear_forward_and_grads_match_xla():
    from vit_ocm_wmsegmentation_tpu.ops.ln_linear import ln_linear

    rng = np.random.default_rng(3)
    R, D, K = 100, 64, 192
    x = jnp.asarray(rng.normal(0, 1, (R, D)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, D).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, D).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (D, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.05, K).astype(np.float32))

    def ref(x, scale, bias, w, b):
        h = nn.layer_norm({"scale": scale, "bias": bias}, x, 1e-6)
        return nn.linear({"kernel": w, "bias": b}, h)

    args = (x, scale, bias, w, b)
    out = ln_linear(*args, 1e-6, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(*args)), atol=2e-6)

    gk = jax.grad(lambda a: jnp.sum(ln_linear(*a, 1e-6, 64, True) ** 2))(args)
    gr = jax.grad(lambda a: jnp.sum(ref(*a) ** 2))(args)
    for a, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        s = float(jnp.max(jnp.abs(b_))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4 * s)


def test_set_train_kernel_modes_config_knob(monkeypatch):
    """cfg.TRAIN.MLP_REMAT / LN_QKV select the module routes; 'auto'
    RESTORES the shipped defaults (a previous run's explicit mode must not
    leak into the next config-driven run); bad values raise."""
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa

    monkeypatch.setattr(vit_mod, "_SHIPPED_MLP_REMAT", "gelu")
    monkeypatch.setattr(vit_mod, "_SHIPPED_LN_QKV", None)
    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    monkeypatch.setattr(vit_mod, "LN_QKV", "kernel")
    monkeypatch.setattr(fa, "SAVE_P", True)

    # auto = the shipped defaults, regardless of what the globals held
    assert vit_mod.set_train_kernel_modes("auto", "auto") == ("gelu", None, False)
    assert vit_mod.set_train_kernel_modes("kernel", "kernel", "on") == (
        "kernel", "kernel", True)
    assert vit_mod.set_train_kernel_modes("none", "none", "off") == (
        None, None, False)
    assert vit_mod.set_train_kernel_modes("gelu+ln", "auto") == ("gelu+ln", None, False)
    # a back-to-back auto run does not inherit the previous explicit mode
    vit_mod.set_train_kernel_modes("kernel", "kernel", "on")
    assert vit_mod.set_train_kernel_modes("auto", "auto", "auto") == (
        "gelu", None, False)
    with pytest.raises(ValueError):
        vit_mod.set_train_kernel_modes("bogus", "auto")
    with pytest.raises(ValueError):
        vit_mod.set_train_kernel_modes("auto", "gelu")
    with pytest.raises(ValueError):
        vit_mod.set_train_kernel_modes("auto", "auto", "yes")

    from vit_ocm_wmsegmentation_tpu.utils.config import default_config

    cfg = default_config()
    assert cfg.TRAIN.MLP_REMAT == "auto" and cfg.TRAIN.LN_QKV == "auto"
    assert cfg.TRAIN.ATTN_SAVE_P == "auto"


def test_set_train_kernel_modes_clears_jit_caches(monkeypatch):
    """An effective mode change must invalidate cached jit graphs (VERDICT
    r3 weak #5): the routes are read at TRACE time, so a graph cached under
    plain @jax.jit before the flip would silently keep serving the old
    route. A no-op set (same effective triple) must NOT clear — per-run
    make_train_step recompiles would otherwise get needlessly expensive."""
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa

    monkeypatch.setattr(vit_mod, "_SHIPPED_MLP_REMAT", None)
    monkeypatch.setattr(vit_mod, "_SHIPPED_LN_QKV", None)
    monkeypatch.setattr(fa, "_SHIPPED_SAVE_P", False)
    # register teardown restores for the live globals the function mutates
    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    monkeypatch.setattr(vit_mod, "LN_QKV", None)
    monkeypatch.setattr(fa, "SAVE_P", False)
    vit_mod.set_train_kernel_modes("auto", "auto", "auto")

    traces = []

    @jax.jit
    def f(x):
        # route-dependent graph, exactly like make_train_step's closure
        traces.append(vit_mod.MLP_REMAT)
        return x * (2.0 if vit_mod.MLP_REMAT is None else 3.0)

    x = jnp.ones((2,), jnp.float32)
    assert float(f(x)[0]) == 2.0 and len(traces) == 1
    # same effective triple: the cache survives, no retrace
    vit_mod.set_train_kernel_modes("auto", "auto", "auto")
    assert float(f(x)[0]) == 2.0 and len(traces) == 1
    # effective change: the stale graph must not keep serving
    vit_mod.set_train_kernel_modes("gelu", "auto", "auto")
    assert float(f(x)[0]) == 3.0 and len(traces) == 2


def test_mim_step_lnqkv_mode_matches_stock(monkeypatch):
    """LN_QKV='kernel' (LN1 fused into the qkv projection + flash attention
    in interpret mode) through the whole MIM loss: loss/grads match stock."""
    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=32)
    params = simmim.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    def lossf(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True)[0]

    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    l0, g0 = jax.value_and_grad(lossf)(params)
    monkeypatch.setattr(vit_mod, "LN_QKV", "kernel")
    l1, g1 = jax.value_and_grad(lossf)(params)

    assert float(l1) == pytest.approx(float(l0), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale)


def test_mim_step_savep_route_matches_stock(monkeypatch):
    """ATTN_SAVE_P through the whole MIM loss (the lnqkv interpret route is
    the CPU path that reaches flash_attention_trainable): loss and grads
    must match the stock autodiff graph."""
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa

    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=32)
    params = simmim.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    def lossf(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True)[0]

    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    l0, g0 = jax.value_and_grad(lossf)(params)
    monkeypatch.setattr(vit_mod, "LN_QKV", "kernel")
    monkeypatch.setattr(fa, "SAVE_P", True)
    l1, g1 = jax.value_and_grad(lossf)(params)

    assert float(l1) == pytest.approx(float(l0), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale)

    # under whole-block remat (the 384² recipe) the savep forward is
    # recomputed inside jax.checkpoint — P is produced and consumed within
    # the backward, and gradients must be unchanged
    def lossf_remat(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True, remat=True)[0]

    l2, g2 = jax.value_and_grad(lossf_remat)(params)
    assert float(l2) == pytest.approx(float(l1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mim_step_kernel_mode_matches_stock(monkeypatch):
    """MLP_REMAT='kernel' through the whole MIM loss (scan over blocks,
    custom VJP inside): loss and grads match stock autodiff."""
    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=32)
    params = simmim.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 4, 4)) > 0.5).astype(np.int32))

    def lossf(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True)[0]

    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    l0, g0 = jax.value_and_grad(lossf)(params)
    monkeypatch.setattr(vit_mod, "MLP_REMAT", "kernel")
    l1, g1 = jax.value_and_grad(lossf)(params)

    assert float(l1) == pytest.approx(float(l0), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * scale)

    # under whole-block remat (TRAIN.USE_CHECKPOINT / the 384² recipe) the
    # custom-VJP forward is recomputed inside the outer jax.checkpoint —
    # gradients must be unchanged
    def lossf_remat(p):
        return simmim.mim_loss(p, cfg, x, mask, train=True, remat=True)[0]

    l2, g2 = jax.value_and_grad(lossf_remat)(params)
    assert float(l2) == pytest.approx(float(l1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pick_block_r_dtype_rule():
    """f32 at BLOCK_R=512/256 overflows the v5e's 16 MB scoped-VMEM budget
    in the backward kernel (measured r4 via remote-compiler OOM); 128 fits.
    bf16 keeps the probe-measured-best 512. The dispatch sites
    (models/vit.py _mlp_kernel_call / _ln_qkv_attention) must route through
    this rule so the f32 training path compiles on chip."""
    from vit_ocm_wmsegmentation_tpu.ops.fused_mlp import (DEFAULT_BLOCK_R,
                                                          pick_block_r)

    assert pick_block_r(jnp.bfloat16) == DEFAULT_BLOCK_R == 512
    assert pick_block_r(jnp.float16) == 512
    assert pick_block_r(jnp.float32) == 128
    # the f32 block the rule picks stays numerically exact (interpret mode)
    args = _mk(np.random.default_rng(3))
    out = fused_mlp_block(*args, 1e-6, pick_block_r(jnp.float32), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(*args)),
                               atol=2e-6)


def test_infer_mlp_kernel_matches_stock_forward(monkeypatch):
    """INFER_MLP_KERNEL routes the inference block MLP through the fused
    Pallas forward (want=None, no residual outputs); the full inference
    forward_features must match the stock XLA path (r5; the on-chip A/B
    lives in tools/probe_infer_mlp.py, verdict in BENCH.md)."""
    from vit_ocm_wmsegmentation_tpu.models import vit

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                    pretrain_img_size=32)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))

    monkeypatch.setattr(vit_mod, "INFER_MLP_KERNEL", False)
    ref = vit.forward_features(params, cfg, x)
    monkeypatch.setattr(vit_mod, "INFER_MLP_KERNEL", True)
    # without the interpret escape hatch the CPU backend must fall back to
    # the stock path (the Pallas route is TPU-only)
    same = vit.forward_features(params, cfg, x)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(ref))
    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    out = vit.forward_features(params, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_lnout_matches_stock_composition():
    """fused_mlp_block_lnout's (out, z) vs stock: out as fused_mlp_block,
    z = layer_norm(out; next scale/bias)."""
    from vit_ocm_wmsegmentation_tpu.ops.fused_mlp import fused_mlp_block_lnout

    rng = np.random.default_rng(4)
    args = _mk(rng)
    s2 = jnp.asarray(rng.normal(1, 0.1, 64).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, 64).astype(np.float32))
    out, z = fused_mlp_block_lnout(*args, s2, b2, 1e-6, 64, True)
    ref_out = _ref(*args)
    ref_z = nn.layer_norm({"scale": s2, "bias": b2}, ref_out, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=2e-5)


def test_infer_mlp_lnout_route_matches_stock_forward(monkeypatch):
    """INFER_MLP_LNOUT threads each layer's kernel-emitted z into the next
    layer's attention; the full inference forward must match stock."""
    from vit_ocm_wmsegmentation_tpu.models import vit

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2,
                    pretrain_img_size=32)
    params = vit.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))

    ref = vit.forward_features(params, cfg, x)
    monkeypatch.setattr(vit_mod, "INFER_MLP_LNOUT", True)
    monkeypatch.setattr(vit_mod, "FUSED_MLP_INTERPRET", True)
    out = vit.forward_features(params, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # intermediate-range call (blocks [0, depth-1) then a manual block):
    # the route must not leak z past `hi`
    ref_il = vit.get_intermediate_layers(params, cfg, x, n=1)
    out_il = vit.get_intermediate_layers(params, cfg, x, n=1)
    np.testing.assert_allclose(np.asarray(out_il), np.asarray(ref_il),
                               atol=2e-5)


def test_set_infer_mlp_choices_and_cache_clear(monkeypatch):
    """set_infer_mlp validates choices, 'auto' restores the shipped
    default, and an effective-mode change clears jit caches (the knobs are
    read at trace time inside pipeline graphs cached under module-level
    @jax.jit — the r5 A/B initially measured lnout == stock because the
    first arm's cached segment_mosaic jaxpr served both arms)."""
    import pytest as _pytest

    monkeypatch.setattr(vit_mod, "INFER_MLP_KERNEL", False)
    monkeypatch.setattr(vit_mod, "INFER_MLP_LNOUT", False)

    with _pytest.raises(ValueError):
        vit_mod.set_infer_mlp("bogus")

    assert vit_mod.set_infer_mlp("kernel") == "kernel"
    assert vit_mod.INFER_MLP_KERNEL and not vit_mod.INFER_MLP_LNOUT
    assert vit_mod.set_infer_mlp("lnout") == "lnout"
    assert vit_mod.INFER_MLP_LNOUT and not vit_mod.INFER_MLP_KERNEL
    assert vit_mod.set_infer_mlp("none") == "none"
    assert not vit_mod.INFER_MLP_KERNEL and not vit_mod.INFER_MLP_LNOUT
    # auto restores the shipped defaults
    eff = vit_mod.set_infer_mlp("auto")
    assert vit_mod.INFER_MLP_KERNEL == vit_mod._SHIPPED_INFER_MLP_KERNEL
    assert vit_mod.INFER_MLP_LNOUT == vit_mod._SHIPPED_INFER_MLP_LNOUT
    assert eff == ("kernel" if vit_mod.INFER_MLP_KERNEL
                   else "lnout" if vit_mod.INFER_MLP_LNOUT else "none")

    # a mode change clears jit caches: an @jax.jit graph traced under the
    # old mode must retrace after the switch
    traces = []

    @jax.jit
    def f(x):
        traces.append(vit_mod.INFER_MLP_LNOUT)
        return x * (3.0 if vit_mod.INFER_MLP_LNOUT else 2.0)

    vit_mod.set_infer_mlp("none")
    x = jnp.ones((2,), jnp.float32)
    assert float(f(x)[0]) == 2.0 and len(traces) == 1
    vit_mod.set_infer_mlp("lnout")
    assert float(f(x)[0]) == 3.0 and len(traces) == 2
    vit_mod.set_infer_mlp("auto")


def test_infer_mlp_lnout_pure_dp_mesh_matches_single_device():
    """On a pure-dp kernel mesh the lnout route rides dp_island with
    n_out=2; the forward must equal the no-mesh lnout forward exactly
    (r5: multi-chip pure-dp masks match single-chip)."""
    from vit_ocm_wmsegmentation_tpu.models import vit
    from vit_ocm_wmsegmentation_tpu.parallel import mesh as pmesh

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2,
                    pretrain_img_size=32)
    params = vit.init(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    # batch 3: indivisible by the 2-device mesh -> exercises the pad path
    x = jnp.asarray(rng.random((3, 32, 32, 3), dtype=np.float32))

    saved = (vit_mod.INFER_MLP_LNOUT, vit_mod.FUSED_MLP_INTERPRET)
    vit_mod.INFER_MLP_LNOUT, vit_mod.FUSED_MLP_INTERPRET = True, True
    try:
        want = vit.forward_features(params, cfg, x)
        m = pmesh.make_mesh(data=2)
        with pmesh.kernel_mesh_scope(m):
            got = vit.forward_features(params, cfg, x)
        # the attention path reduces in a different order under shard_map;
        # feature-level equality is fp-noise-tolerant (masks, which
        # quantize, are asserted bit-equal by dryrun_multichip)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
    finally:
        vit_mod.INFER_MLP_LNOUT, vit_mod.FUSED_MLP_INTERPRET = saved
