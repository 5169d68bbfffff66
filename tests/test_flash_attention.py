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
    out, _ = fa._flash_fwd(q, k, v, 0, True, False)
    got_blocked = out[:, :150, :].reshape(q.shape)
    np.testing.assert_allclose(np.asarray(got_blocked), np.asarray(want), atol=2e-5)


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


def test_attention_qkv_blocked_path(monkeypatch):
    """The qkv-direct kernel's multi-block path (bq < N via a shrunken VMEM
    budget) matches the oracle — q blocks then read row ranges of the padded
    qkv tensor and _qkv_pad_rows must provision enough rows."""
    import importlib

    fa = importlib.import_module("vit_ocm_wmsegmentation_tpu.ops.flash_attention")
    rng = np.random.default_rng(6)
    b, h, n, d = 2, 2, 150, 32
    qkv = jnp.asarray(rng.normal(0, 0.5, (b, n, 3 * h * d)).astype(np.float32))

    want = fa.attention_qkv(qkv, h, n, True)

    monkeypatch.setattr(fa, "_AUTO_VMEM_S_BYTES", 1024)
    got = fa.attention_qkv.__wrapped__(qkv, h, n, True)  # bypass the vjp cache
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_qkv_vjp_matches_xla():
    """Grad through attention_qkv (Pallas fwd with lse + Pallas bwd) ==
    grad through the materialized XLA attention, from the fused qkv tensor."""
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
        return jnp.sum(jnp.square(fa.attention_qkv(qkv, h, n, True)))

    g_ref = jax.grad(ref)(qkv)
    g_ours = jax.grad(ours)(qkv)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=3e-4)
