"""Pallas flash attention kernel vs the materializing oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu.ops import attention as att
from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention, mha_flash


def _qkv(b, h, n, d, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 1, (b, h, n, d)).astype(dtype))
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [64, 130, 257])  # incl. non-multiples of 128
@pytest.mark.parametrize("d", [64, 128])  # ViT-S eval (d=64) and MIM (d=128) head dims
def test_flash_matches_materialized(n, d):
    q, k, v = _qkv(2, 3, n, d, seed=n)
    want = jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_bf16(seed=1):
    q, k, v = _qkv(1, 2, 192, 64, seed=seed)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)
    got = flash_attention(qb, kb, vb, block_q=128, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.02)


def test_mha_flash_matches_mha_fused():
    rng = np.random.default_rng(2)
    d = 32
    params = {
        "wqkv": jnp.asarray(rng.normal(0, 0.05, (d, 3 * d)).astype(np.float32)),
        "bqkv": jnp.asarray(rng.normal(0, 0.05, (3 * d,)).astype(np.float32)),
        "wo": jnp.asarray(rng.normal(0, 0.05, (d, d)).astype(np.float32)),
        "bo": jnp.asarray(rng.normal(0, 0.05, (d,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(0, 1, (2, 65, d)).astype(np.float32))
    want = att.mha_fused(x, params, 2)
    got = mha_flash(x, params, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _vjp_oracle(q, k, v, do):
    def f(q, k, v):
        return jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(do)


@pytest.mark.parametrize("n", [64, 130])
@pytest.mark.parametrize("d", [64, 128])  # MIM trains through d=128 heads
def test_flash_vjp_matches_xla(n, d):
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention_trainable

    q, k, v = _qkv(2, 2, n, d, seed=100 + n)
    do = jnp.asarray(np.random.default_rng(n).normal(0, 1, q.shape).astype(np.float32))
    want_dq, want_dk, want_dv = _vjp_oracle(q, k, v, do)
    _, vjp = jax.vjp(lambda q, k, v: flash_attention_trainable(q, k, v, 128, True), q, k, v)
    got_dq, got_dk, got_dv = vjp(do)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(want_dq), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(want_dk), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv), atol=3e-4)


def test_flash_auto_blockq_both_paths(monkeypatch):
    """block_q=0 (the default) picks one whole-N program when the score
    matrix fits the VMEM budget, and falls back to fixed 1216-row blocks
    when it doesn't; both must match the oracle. The fallback is forced by
    shrinking the budget rather than allocating a huge N."""
    import importlib

    # ops/__init__ re-exports a *function* named flash_attention that shadows
    # the submodule on attribute imports; resolve the module explicitly
    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")

    q, k, v = _qkv(1, 2, 150, 64, seed=9)
    want = jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)

    got_whole = flash_attention(q, k, v, block_q=0, interpret=True)
    np.testing.assert_allclose(np.asarray(got_whole), np.asarray(want), atol=2e-5)
    assert fa._pick_block_q(0, 150, 256) == 152  # round_up(150, 8), one program

    monkeypatch.setattr(fa, "_AUTO_VMEM_S_BYTES", 1024)  # force the blocked path
    assert fa._pick_block_q(0, 150, 256) == 256  # min(1216, np_)
    # call the unjitted internal: the jitted wrapper would replay its cached
    # trace (same shapes + statics) and never re-read the budget
    out, _, _ = fa._flash_fwd(q, k, v, 0, True, False)
    got_blocked = out[:, :150, :].reshape(q.shape)
    np.testing.assert_allclose(np.asarray(got_blocked), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("n", [64, 130])
@pytest.mark.parametrize("d", [64, 128])
def test_flash_vjp_savep_matches_xla(n, d):
    """save_p=True: the backward consumes the forward's saved P/inv instead
    of recomputing exp(s - lse) — gradients must still match the XLA
    oracle (f32: the P round-trip adds no rounding beyond the division)."""
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention_trainable

    q, k, v = _qkv(2, 2, n, d, seed=300 + n)
    do = jnp.asarray(np.random.default_rng(n + 1).normal(0, 1, q.shape).astype(np.float32))
    want_dq, want_dk, want_dv = _vjp_oracle(q, k, v, do)
    _, vjp = jax.vjp(
        lambda q, k, v: flash_attention_trainable(q, k, v, 128, True, True), q, k, v)
    got_dq, got_dk, got_dv = vjp(do)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(want_dq), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(want_dk), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv), atol=3e-4)


def test_flash_vjp_savep_bf16_matches_lse_route():
    """bf16 AMP: the saved-P route must stay within bf16 rounding of both
    the f32 oracle and the default lse-recompute route (they differ only
    by P's bf16 store)."""
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention_trainable

    q, k, v = _qkv(1, 2, 100, 64, seed=31)
    do = jnp.asarray(np.random.default_rng(32).normal(0, 1, q.shape).astype(np.float32))
    want = _vjp_oracle(q, k, v, do)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    _, vjp_sp = jax.vjp(
        lambda a, b, c: flash_attention_trainable(a, b, c, 0, True, True), qb, kb, vb)
    got_sp = vjp_sp(do.astype(jnp.bfloat16))
    _, vjp_lse = jax.vjp(
        lambda a, b, c: flash_attention_trainable(a, b, c, 0, True, False), qb, kb, vb)
    got_lse = vjp_lse(do.astype(jnp.bfloat16))
    for g, g2, w in zip(got_sp, got_lse, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g, dtype=np.float32), np.asarray(w), atol=0.15)
        np.testing.assert_allclose(np.asarray(g, dtype=np.float32),
                                   np.asarray(g2, dtype=np.float32), atol=0.1)


def test_flash_vjp_bf16():
    """The training path runs bf16 under AMP: the Pallas backward must stay
    within bf16 rounding of the f32 XLA oracle."""
    from vit_ocm_wmsegmentation_tpu.ops.flash_attention import flash_attention_trainable

    q, k, v = _qkv(1, 2, 100, 64, seed=11)
    do = jnp.asarray(np.random.default_rng(12).normal(0, 1, q.shape).astype(np.float32))
    want = _vjp_oracle(q, k, v, do)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    _, vjp = jax.vjp(lambda a, b, c: flash_attention_trainable(a, b, c, 0, True), qb, kb, vb)
    got = vjp(do.astype(jnp.bfloat16))
    for g, w in zip(got, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g, dtype=np.float32), np.asarray(w), atol=0.15)


def test_mha_flash_grad_matches_chunked():
    rng = np.random.default_rng(5)
    d = 32
    params = {
        "wqkv": jnp.asarray(rng.normal(0, 0.05, (d, 3 * d)).astype(np.float32)),
        "bqkv": jnp.asarray(rng.normal(0, 0.05, (3 * d,)).astype(np.float32)),
        "wo": jnp.asarray(rng.normal(0, 0.05, (d, d)).astype(np.float32)),
        "bo": jnp.asarray(rng.normal(0, 0.05, (d,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(0, 1, (2, 65, d)).astype(np.float32))
    g_chunk = jax.grad(lambda p: jnp.sum(jnp.square(att.mha_fused(x, p, 2))))(params)
    g_flash = jax.grad(lambda p: jnp.sum(jnp.square(mha_flash(x, p, 2, interpret=True))))(params)
    for a, b in zip(jax.tree.leaves(g_flash), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def _padded_scaled_qkv(qkv, h, n):
    """Pack an (B, n, 3hd) unscaled qkv tensor into the flat kernel's input
    contract: rows padded to padded_rows(n), q section pre-scaled."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    b, _, cols = qkv.shape
    dm = cols // 3
    scale = (dm // h) ** -0.5
    colscale = jnp.concatenate(
        [jnp.full((dm,), scale, jnp.float32), jnp.ones((2 * dm,), jnp.float32)])
    qkv = (qkv.astype(jnp.float32) * colscale).astype(qkv.dtype)
    return jnp.pad(qkv, ((0, 0), (0, fa.padded_rows(n) - n), (0, 0)))


def test_attention_qkv_matches_oracle():
    """The flat qkv-direct kernel (padded rows in, padded rows out, q
    pre-scaled, norm-bound softmax shift) == the materialized oracle."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    rng = np.random.default_rng(6)
    b, h, n, d = 2, 2, 150, 32
    qkv = jnp.asarray(rng.normal(0, 0.5, (b, n, 3 * h * d)).astype(np.float32))

    q, k, v = att.split_qkv(qkv, h)
    want = jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)
    want = want.transpose(0, 2, 1, 3).reshape(b, n, h * d)

    got = fa.attention_qkv(_padded_scaled_qkv(qkv, h, n), h, n, True)
    assert got.shape == (b, fa.padded_rows(n), h * d)
    np.testing.assert_allclose(np.asarray(got)[:, :n], np.asarray(want), atol=2e-5)


def test_attention_qkv_large_norm_safety():
    """The Cauchy-Schwarz softmax shift must stay finite (no exp overflow,
    no 0/0 rows) at activation norms far beyond the trained regime."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    rng = np.random.default_rng(7)
    b, h, n, d = 1, 2, 130, 32
    qkv = jnp.asarray(rng.normal(0, 12.0, (b, n, 3 * h * d)).astype(np.float32))
    out = fa.attention_qkv(_padded_scaled_qkv(qkv, h, n), h, n, True)
    assert bool(jnp.all(jnp.isfinite(out)))
    # rows are convex combinations of v rows -> bounded by max |v|
    assert float(jnp.max(jnp.abs(out[:, :n]))) <= float(jnp.max(jnp.abs(qkv))) + 1e-3


def test_attention_qkv_vjp_matches_xla():
    """Grad through attention_qkv (Pallas fwd with lse + Pallas bwd) ==
    grad through the materialized XLA attention, from the fused qkv tensor
    (pad + scale fold included in the differentiable chain)."""
    rng = np.random.default_rng(8)
    b, h, n, d = 2, 2, 70, 32
    qkv = jnp.asarray(rng.normal(0, 0.5, (b, n, 3 * h * d)).astype(np.float32))

    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")

    def ref(qkv):
        q, k, v = att.split_qkv(qkv, h)
        o = jnp.einsum("bhqk,bhkd->bhqd", att.attention_scores(q, k), v)
        return jnp.sum(jnp.square(o.transpose(0, 2, 1, 3).reshape(b, n, h * d)))

    def ours(qkv):
        out = fa.attention_qkv(_padded_scaled_qkv(qkv, h, n), h, n, True)
        return jnp.sum(jnp.square(out[:, :n]))

    g_ref = jax.grad(ref)(qkv)
    g_ours = jax.grad(ours)(qkv)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=3e-4)


def test_mha_flash_padded_stream_contract():
    """mha_flash with n_valid consumes and returns the padded stream, and
    the valid rows equal the unpadded drop-in mode / the XLA oracle."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    rng = np.random.default_rng(9)
    dmodel, h, n = 64, 2, 90
    params = {
        "wqkv": jnp.asarray(rng.normal(0, 0.05, (dmodel, 3 * dmodel)).astype(np.float32)),
        "bqkv": jnp.asarray(rng.normal(0, 0.05, (3 * dmodel,)).astype(np.float32)),
        "wo": jnp.asarray(rng.normal(0, 0.05, (dmodel, dmodel)).astype(np.float32)),
        "bo": jnp.asarray(rng.normal(0, 0.05, (dmodel,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(0, 1, (2, n, dmodel)).astype(np.float32))
    want = att.mha_fused(x, params, h)

    np_ = fa.padded_rows(n)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    got_pad = fa.mha_flash(xp, params, h, n_valid=n, interpret=True)
    assert got_pad.shape == (2, np_, dmodel)
    np.testing.assert_allclose(np.asarray(got_pad)[:, :n], np.asarray(want), atol=2e-5)

    got_drop = fa.mha_flash(x, params, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got_drop), np.asarray(want), atol=2e-5)


def test_scan_blocks_padded_stream_equivalence(monkeypatch):
    """vit._scan_blocks' pad-once/slice-once plumbing returns the same
    result as the unpadded path (mha semantics emulated so the test runs on
    the CPU backend)."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    vit_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.models.vit")
    att_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.attention")

    cfg = vit_mod.ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                            pretrain_img_size=32)
    params = vit_mod.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 17, 32)).astype(np.float32))

    want = vit_mod._scan_blocks(params, cfg, x, 0, cfg.depth)

    def fake_mha_flash(xx, p, heads, *, n_valid=None, prefer_folded=False, interpret=False, quant=False):
        if n_valid is not None and n_valid != xx.shape[1]:
            out = att_mod.mha_fused(xx[:, :n_valid], p, heads)
            return jnp.pad(out, ((0, 0), (0, xx.shape[1] - n_valid), (0, 0)))
        return att_mod.mha_fused(xx, p, heads)

    monkeypatch.setattr(fa, "mha_flash", fake_mha_flash)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # pin the shipped lnout MLP route off: this test fakes a "tpu" backend
    # on CPU, where a real (non-interpret) Pallas dispatch cannot lower
    monkeypatch.setattr(vit_mod, "INFER_MLP_LNOUT", False)
    got = vit_mod._scan_blocks(params, cfg, x, 0, cfg.depth)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_scan_blocks_train_routes_folded(monkeypatch):
    """train=True must keep the stream unpadded and ask mha_flash for the
    folded kernel (the padded-stream flat path taxes the dense bwd;
    chip-measured, see vit._scan_blocks docstring)."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    vit_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.models.vit")
    att_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.attention")

    cfg = vit_mod.ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                            pretrain_img_size=32)
    params = vit_mod.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 17, 32)).astype(np.float32))
    seen = []

    def fake_mha_flash(xx, p, heads, *, n_valid=None, prefer_folded=False, interpret=False, quant=False):
        seen.append((xx.shape[1], n_valid, prefer_folded))
        return att_mod.mha_fused(xx, p, heads)

    monkeypatch.setattr(fa, "mha_flash", fake_mha_flash)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # this test is about attention fold routing; pin the MLP route off so
    # the shipped MLP_REMAT="kernel" default doesn't dispatch a real (non-
    # interpret) Pallas call on the faked-"tpu" CPU backend
    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    vit_mod._scan_blocks(params, cfg, x, 0, cfg.depth, train=True)
    assert seen and all(rows == 17 and nv is None and folded
                        for rows, nv, folded in seen)


def test_scan_blocks_unrolled_matches_scan(monkeypatch):
    """UNROLL_INFER_BLOCKS=True (r4: unrolled inference block loop so XLA's
    layout assignment keeps the residual stream row-major around the Pallas
    call instead of relaying out at every scan iteration) must compute
    exactly what the lax.scan form computes — same per-block math, same
    order, only the loop construct changes."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    vit_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.models.vit")
    att_mod = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.attention")

    cfg = vit_mod.ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2,
                            pretrain_img_size=32)
    params = vit_mod.init(cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (2, 17, 32)).astype(np.float32))

    def fake_mha_flash(xx, p, heads, *, n_valid=None, prefer_folded=False,
                       interpret=False, quant=False):
        return att_mod.mha_fused(xx, p, heads)

    monkeypatch.setattr(fa, "mha_flash", fake_mha_flash)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(vit_mod, "MLP_REMAT", None)
    monkeypatch.setattr(vit_mod, "INFER_MLP_LNOUT", False)  # faked backend
    monkeypatch.setattr(vit_mod, "UNROLL_INFER_BLOCKS", False)
    want = vit_mod._scan_blocks(params, cfg, x, 0, cfg.depth)
    monkeypatch.setattr(vit_mod, "UNROLL_INFER_BLOCKS", True)
    got = vit_mod._scan_blocks(params, cfg, x, 0, cfg.depth)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)
