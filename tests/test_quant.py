"""Dynamic int8 inference quantization (ops/quant.py).

Net-new serving feature (the reference runs f32 CUDA end to end); the
contract under test is accuracy: int8-projected inference must stay
Dice-parity with the full-precision pipeline, and the training paths must
be bit-identical with the mode on or off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_ocm_wmsegmentation_tpu import pipeline as pl
from vit_ocm_wmsegmentation_tpu.models import vit
from vit_ocm_wmsegmentation_tpu.ops import quant

CFG = vit.ViTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=2,
                    pretrain_img_size=32)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    # through set_infer_quant, not a raw MODE write: a mode change must
    # also clear the jit caches, or graphs traced under int8 keep serving
    vit.set_infer_quant("auto")


def test_int8_dot_error_bound():
    """Per-row/per-channel symmetric W8A8 on gaussian operands: each side
    quantizes with rms step ~(max/127)/sqrt(12) ≈ 0.7% of sigma (max≈3σ
    at these shapes), so the product's relative Frobenius error sits just
    above 1%. Pin <2% so a scaling bug (e.g. dropped per-row scale, which
    yields O(100%) error) can't hide."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(384, 1536)).astype(np.float32) * 0.05)
    got = quant.int8_dot(x, w)
    want = jnp.dot(x, w, preferred_element_type=jnp.float32)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 2e-2, rel


def test_int8_dot_zero_rows_and_columns_are_finite():
    """All-zero rows/channels must not divide by a zero scale."""
    x = jnp.zeros((4, 16))
    w = jnp.zeros((16, 8))
    assert bool(jnp.all(quant.int8_dot(x, w) == 0.0))


def test_set_infer_quant_choices_and_restore():
    with pytest.raises(ValueError):
        vit.set_infer_quant("int4")
    assert vit.set_infer_quant("int8") == "int8"
    assert quant.quant_enabled()
    assert vit.set_infer_quant("none") is None
    quant.MODE = "int8"
    assert vit.set_infer_quant("auto") == quant._SHIPPED_MODE


def _tiny_params():
    return vit.init(CFG, jax.random.PRNGKey(0))


def test_quant_changes_inference_but_not_training():
    """The int8 mode must actually rewire the inference dots (outputs
    differ from f32) while the training forward stays bit-identical —
    int8 round() has no useful gradient, so the train route must never
    consult the mode."""
    params = _tiny_params()
    x = jnp.asarray(np.random.default_rng(1).random((2, 48, 48, 3), np.float32))
    tok = vit.prepare_tokens(params, CFG, x)
    bp = vit.block_params(params, 0)

    vit.set_infer_quant("none")
    infer_f32 = vit._block_forward(bp, CFG, tok)
    train_f32 = vit._block_forward(bp, CFG, tok, train=True)
    vit.set_infer_quant("int8")
    infer_q = vit._block_forward(bp, CFG, tok)
    train_q = vit._block_forward(bp, CFG, tok, train=True)

    assert not bool(jnp.all(infer_q == infer_f32)), "int8 mode not wired"
    np.testing.assert_array_equal(np.asarray(train_q), np.asarray(train_f32))
    # and the quantized inference stays close
    np.testing.assert_allclose(np.asarray(infer_q), np.asarray(infer_f32),
                               atol=5e-2, rtol=0)


def test_quant_applies_on_folded_kernel_branch():
    """mha_flash's folded branch (prefer_folded / large-n dispatch) must
    quantize its projections exactly like the flat branch — a silent
    full-precision fallback would make --quant int8 a partial no-op at
    large sequence lengths (review finding, r3)."""
    from vit_ocm_wmsegmentation_tpu.ops import flash_attention_mod as fa

    rng = np.random.default_rng(5)
    b, n, dm, h = 2, 20, 32, 2
    x = jnp.asarray(rng.standard_normal((b, n, dm)).astype(np.float32))
    params = {
        "wqkv": jnp.asarray(0.1 * rng.standard_normal((dm, 3 * dm)).astype(np.float32)),
        "bqkv": jnp.asarray(0.1 * rng.standard_normal((3 * dm,)).astype(np.float32)),
        "wo": jnp.asarray(0.1 * rng.standard_normal((dm, dm)).astype(np.float32)),
        "bo": jnp.zeros((dm,), jnp.float32),
    }
    plain = fa.mha_flash(x, params, h, prefer_folded=True, interpret=True)
    q = fa.mha_flash(x, params, h, prefer_folded=True, interpret=True,
                     quant=True)
    assert not bool(jnp.all(q == plain)), "folded branch ignored quant"
    # and it agrees with the chunked XLA path under the same quantization
    from vit_ocm_wmsegmentation_tpu.ops.attention import mha_fused

    want = mha_fused(x, params, h, quant=True)
    np.testing.assert_allclose(np.asarray(q), np.asarray(want), atol=2e-5)


def test_quant_mask_dice_parity_tiny():
    """End-to-end gate at test scale, mirroring bench.py's bf16-vs-f32
    gate: the int8 'ours' mask must stay Dice > 0.99 against f32, and the
    attention maps must stay numerically close."""
    params = _tiny_params()
    img = jnp.asarray(
        (np.random.default_rng(2).random((2, 96, 96)) * 255).astype(np.uint8))

    vit.set_infer_quant("none")
    mask32, attn32 = pl.segment_single(params, CFG, img)
    vit.set_infer_quant("int8")
    mask8, attn8 = pl.segment_single(params, CFG, img)

    a32, a8 = np.asarray(attn32), np.asarray(attn8)
    span = a32.max() - a32.min() + 1e-12
    assert np.abs(a8 - a32).max() / span < 0.05

    m32 = np.asarray(mask32) > 0
    m8 = np.asarray(mask8) > 0
    dice = 2 * np.logical_and(m32, m8).sum() / max(m32.sum() + m8.sum(), 1)
    assert dice > 0.99, dice
