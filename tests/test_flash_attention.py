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
def test_flash_matches_materialized(n):
    q, k, v = _qkv(2, 3, n, 64, seed=n)
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
