"""DINO-style Vision Transformer, pure-function / pytree edition.

Capability-parity with the reference backbone
(/root/reference/Self-supervised_segmentation/dino/vision_transformer.py):

* timm-style ViT with fused qkv, pre-norm blocks, exact-erf GELU, LayerNorm
  eps 1e-6, CLS token, learned positional embeddings with bicubic
  interpolation to arbitrary image sizes (:176-196), and the attention /
  qkv extraction entry points (:225-256).

TPU-first deviations from the torch design:

* patch embedding is a reshape + one MXU matmul instead of a conv (:127);
* block parameters are stacked along a leading depth axis and the
  non-extracted blocks run under ``lax.scan`` (one compiled block, L
  iterations — fast compiles, natural remat boundary);
* the inference path never materializes an (N, N) attention matrix: the
  last block reduces to a CLS-row softmax (ops/attention.py) because the
  downstream pipeline consumes only attn[:, :, 0, 1:] (utils.py:229-235);
* positional-embedding interpolation lowers to two small einsums built at
  trace time, so it fuses into the jitted graph instead of running per
  image on the host.

Weight layouts are chosen so `train/checkpoint.py` can map torch DINO
checkpoints 1:1 (kernels transposed to (in, out)).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .. import nn
from ..ops import attention as att
from ..ops.resize import bicubic_matrix


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    # image size the positional-embedding table is sized for (DINO pretrains
    # at 224; other sizes interpolate, vision_transformer.py:176)
    pretrain_img_size: int = 224

    @property
    def pos_grid(self) -> int:
        return self.pretrain_img_size // self.patch_size

    @property
    def num_pos_tokens(self) -> int:
        return self.pos_grid * self.pos_grid + 1

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


# Factory configs mirroring vit_tiny/small/base (vision_transformer.py:259-279)
VIT_TINY = partial(ViTConfig, embed_dim=192, depth=12, num_heads=3)
VIT_SMALL = partial(ViTConfig, embed_dim=384, depth=12, num_heads=6)
VIT_BASE = partial(ViTConfig, embed_dim=768, depth=12, num_heads=12)

ARCHS = {"vit_tiny": VIT_TINY, "vit_small": VIT_SMALL, "vit_base": VIT_BASE}


def init(cfg: ViTConfig, key, dtype=jnp.float32):
    """Random init matching the reference scheme: trunc-normal(0.02) for
    linear weights / pos-embed / cls-token, zeros for biases and LN bias."""
    d, L, mlp = cfg.embed_dim, cfg.depth, cfg.embed_dim * cfg.mlp_ratio
    pdim = cfg.patch_size * cfg.patch_size * 3
    keys = jax.random.split(key, 8)

    def tn(k, shape):
        return nn.trunc_normal(k, shape, std=0.02, dtype=dtype)

    bkeys = jax.random.split(keys[0], 4 * L).reshape((4, L) + keys[0].shape)
    blocks = {
        "norm1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "attn": {
            "wqkv": jax.vmap(lambda k: tn(k, (d, 3 * d)))(bkeys[0]),
            "wo": jax.vmap(lambda k: tn(k, (d, d)))(bkeys[1]),
            "bo": jnp.zeros((L, d), dtype),
        },
        "norm2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "mlp": {
            "w1": jax.vmap(lambda k: tn(k, (d, mlp)))(bkeys[2]),
            "b1": jnp.zeros((L, mlp), dtype),
            "w2": jax.vmap(lambda k: tn(k, (mlp, d)))(bkeys[3]),
            "b2": jnp.zeros((L, d), dtype),
        },
    }
    if cfg.qkv_bias:
        blocks["attn"]["bqkv"] = jnp.zeros((L, 3 * d), dtype)
    return {
        "patch_embed": {"kernel": tn(keys[1], (pdim, d)), "bias": jnp.zeros((d,), dtype)},
        "cls_token": tn(keys[2], (1, 1, d)),
        "pos_embed": tn(keys[3], (1, cfg.num_pos_tokens, d)),
        "blocks": blocks,
        "norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def block_params(params, i):
    """Slice block i out of the stacked block pytree."""
    return jax.tree.map(lambda a: a[i], params["blocks"])


def interpolate_pos_embed(params, cfg: ViTConfig, grid_hw):
    """Positional embeddings for a (gh, gw) patch grid, CLS row included.

    Replicates interpolate_pos_encoding (vision_transformer.py:176-196):
    bicubic with torch's A=-0.75 kernel and the reference's `+ 0.1` fudge on
    the scale factor. Static-shape: lowers to two einsums.
    """
    gh, gw = grid_hw
    pos = params["pos_embed"]
    # like the reference (N = pos_embed.shape[1] - 1, vision_transformer.py:177),
    # the source grid comes from the TABLE's actual size, not the config: a
    # checkpoint pretrained at a different resolution than cfg.pretrain_img_size
    # must still interpolate instead of broadcasting a mismatched table
    g = math.isqrt(pos.shape[1] - 1)
    if gh == g and gw == g:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    d = pos.shape[-1]
    grid = patch_pos.reshape(g, g, d)
    # reference computes scale = (w0 + 0.1) / sqrt(N) and floor(g*scale) == w0
    my = jnp.asarray(bicubic_matrix(g, gh, (gh + 0.1) / g), pos.dtype)
    mx = jnp.asarray(bicubic_matrix(g, gw, (gw + 0.1) / g), pos.dtype)
    out = jnp.einsum("oh,hwd->owd", my, grid)
    out = jnp.einsum("ow,hwd->hod", mx, out)
    return jnp.concatenate([cls_pos, out.reshape(1, gh * gw, d)], axis=1)


def prepare_tokens(params, cfg: ViTConfig, x, *, patch_hook=None):
    """(B,H,W,3) image -> (B, 1+gh*gw, D) tokens with CLS + pos embed.

    patch_hook(tok): optional transform of the (B, gh*gw, D) patch tokens
    BEFORE the CLS concat / pos-embed add — SimMIM's mask-token
    substitution plugs in here (models/simmim.embed_tokens) so the token
    preparation convention exists exactly once."""
    b, h, w, _ = x.shape
    patches = nn.patchify(x, cfg.patch_size)
    tok = jnp.dot(patches, params["patch_embed"]["kernel"], preferred_element_type=jnp.float32)
    tok = (tok + params["patch_embed"]["bias"].astype(jnp.float32)).astype(x.dtype)
    if patch_hook is not None:
        tok = patch_hook(tok)
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype), (b, 1, cfg.embed_dim))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = interpolate_pos_embed(params, cfg, (h // cfg.patch_size, w // cfg.patch_size))
    return tok + pos.astype(tok.dtype)


# Training-path MLP rematerialization mode (see _mlp_forward). Module-level
# so perf probes can flip it without re-plumbing configs; the shipped
# default is chosen by on-chip measurement (tools/probe_fused_mlp.py, r4):
# "kernel" (the Pallas fused residual+LN+MLP block custom VJP,
# ops/fused_mlp.py) measured 46.4 ms/iter vs 49.6 baseline on the MIM AMP
# step — the only variant that beat baseline (pure-XLA remat modes were
# 60-65 ms; savep 56.5; every lnqkv stack slower; block_r sweep
# 128/256/512 -> 48.0/47.5/46.4, so DEFAULT_BLOCK_R=512 stands). The probe's
# cross-variant first-step guard passed (loss drift 3e-6, gnorm 2e-4).
# _SHIPPED_* are what cfg "auto" restores; the mutable globals below are
# the live routes (tests/probes may set them directly for one experiment).
_SHIPPED_MLP_REMAT = "kernel"
MLP_REMAT = _SHIPPED_MLP_REMAT

# Tests only: run the fused MLP kernel in Pallas interpret mode on CPU so
# the "kernel" path is exercised without a TPU (see tests/test_fused_mlp.py).
FUSED_MLP_INTERPRET = False

# Inference-path block loop form (see _scan_blocks): True unrolls the
# 12-block loop so XLA's layout assignment keeps the residual stream
# row-major end to end instead of relaying out around the Pallas call at
# every layer (the lax.scan carry pins a token-minor layout). Shipped
# value chosen by on-chip A/B (tools/probe_scaling.py mosaic_1152_full_graph,
# r4 slope fit over n=1..16 iters): scan 115.76 ms/iter vs unrolled
# 109.28 ms/iter (11.46 -> 12.14 MP/s sustained), identical outputs
# (tests/test_flash_attention.py::test_unrolled_infer_blocks_match_scan).
UNROLL_INFER_BLOCKS = True

# Inference-path MLP dispatch: True routes each block's residual+LN2+MLP
# through the forward-only Pallas fused block (ops/fused_mlp.py, want=None
# — no residual outputs), keeping the (R, 1536) hidden in VMEM instead of
# round-tripping it through HBM. Motivation is the r5 per-op trace of the
# 1152² mosaic graph (tools/trace_ops.py mosaic): XLA's stock inference
# MLP compiles to one 3.46 ms/layer kOutput fusion — 34.7 ms (32 %) of
# the 109.3 ms mosaic — against a ~1.6 ms matmul floor at the measured
# 180 TF/s rate, the gap being the h1 HBM round-trip the kernel removes.
# Shipped False: the standalone block is 1.5 ms/layer faster than the
# stock composition (tools/probe_mlp_micro.py: kernel@512 2.73 ms vs
# stock-XLA 4.24, bare matmul-pair floor 1.59), but in-graph XLA's stock
# kOutput fusion also computes the NEXT layer's LN1 row stats as a free
# second output (r5 trace: the f32[49,2432] operand), and routing the
# MLP through this Pallas call re-materializes those stats as standalone
# passes costing ~2 ms/mosaic of the ~10 saved (clean interleaved A/B,
# tools/probe_infer_mlp.py --arms stock kernel lnout: 109.73 stock /
# 101.55 kernel / 99.53 lnout ms, BENCH.md r5). The lnout variant below
# also keeps those stats in VMEM by emitting the next layer's normalized
# input from inside the kernel; it is the shipped route, so this plain
# variant stays off.
_SHIPPED_INFER_MLP_KERNEL = False
INFER_MLP_KERNEL = _SHIPPED_INFER_MLP_KERNEL

# The follow-up: the fused-MLP kernel variant that ALSO emits the next
# layer's normalized input (ops/fused_mlp.fused_mlp_block_lnout) so the
# plain-kernel route's lost LN1 stats stay in VMEM — the unrolled
# inference loop threads z = LN_next(out) straight into the next qkv
# projection, so no standalone LN pass over the 91 MB residual stream
# remains (first layer excepted). Engages single-device AND on pure-dp
# kernel meshes (dp_island n_out=2, so multi-chip pure-dp masks match
# single-chip); tp>1 meshes take the partitionable stock route.
# Shipped TRUE by the r5 on-chip A/B (tools/probe_infer_mlp.py, arms
# interleaved with cache clearing — see set_infer_mlp for why that
# matters): 99.49 vs 109.71 ms/mosaic, x2 reproduced to 0.01 ms —
# 13.34 MP/s vs 12.10. Mask delta vs the stock route is Dice 0.9932
# (pixel agreement 99.4 %): the kernel's Eigen-rational erf differs from
# XLA's by ~1 ulp and min-max+Otsu amplifies that at threshold-boundary
# pixels — the same ±1-bin boundary-flip class as the documented
# cross-stack residual, SMALLER than the reference chain's own
# threshold-jitter envelope (Dice 0.9867 for thr±1, BENCH.md error
# budget). bench.py's bf16-vs-f32 Dice>0.99 gate and the executed-
# reference parity row were re-run green on the shipped route (BENCH.md
# r5).
_SHIPPED_INFER_MLP_LNOUT = True
INFER_MLP_LNOUT = _SHIPPED_INFER_MLP_LNOUT

# Training-path pre-attention norm: "kernel" fuses LN1 into the qkv
# projection (ops/ln_linear.py) so the LN backward reductions run between
# the projection's backward dots. None = stock layer_norm + dot. Measured
# (tools/probe_fused_mlp.py r4): every +lnqkv stack was SLOWER than its
# base (gelu 60.9->65.3, kernel 46.4->50.7 ms), so the route stays off —
# the standalone ln_linear dispatch costs more than the LN fusions it
# replaces at this shape.
_SHIPPED_LN_QKV = None
LN_QKV = _SHIPPED_LN_QKV

_MLP_REMAT_CHOICES = ("auto", "none", "gelu", "gelu+ln", "kernel",
                      "kernel+gp", "kernel+h1")
_LN_QKV_CHOICES = ("auto", "none", "kernel")
# the saved-P route's shipped default lives with its kernel:
# ops/flash_attention._SHIPPED_SAVE_P (single source of truth)
_ATTN_SAVE_P_CHOICES = ("auto", "on", "off")


def set_train_kernel_modes(mlp_remat="auto", ln_qkv="auto", attn_save_p="auto"):
    """Select the training-path kernel routes from config strings.

    Maps cfg.TRAIN.MLP_REMAT / cfg.TRAIN.LN_QKV onto the module globals:
    "auto" RESTORES the measured-best shipped default (so one process can
    run config-driven trainings back to back without a previous run's
    explicit mode leaking in), "none" disables the route, any other value
    names a mode explicitly ("gelu", "gelu+ln", "kernel" for the MLP
    branch; "kernel" for the pre-attention norm; "on"/"off" for the
    attention saved-P backward, cfg.TRAIN.ATTN_SAVE_P).
    Returns the effective (MLP_REMAT, LN_QKV, SAVE_P) triple so callers
    can log it.

    Changing any effective mode clears jax's jit caches, mirroring
    set_infer_quant: the modes are read at TRACE time, so a train graph
    cached under plain @jax.jit before the switch would silently keep
    serving the old route. Today's train steps are rebuilt per run via
    fresh make_train_step closures, but that invariant is one cached
    decorator away from breaking.
    """
    from ..ops import flash_attention_mod as fa
    from ..ops import fused_mlp

    global MLP_REMAT, LN_QKV
    prev = (MLP_REMAT, LN_QKV, fa.SAVE_P, fused_mlp.SAVE_GP)
    if mlp_remat not in _MLP_REMAT_CHOICES:
        raise ValueError(
            f"TRAIN.MLP_REMAT={mlp_remat!r} not in {_MLP_REMAT_CHOICES}")
    if ln_qkv not in _LN_QKV_CHOICES:
        raise ValueError(f"TRAIN.LN_QKV={ln_qkv!r} not in {_LN_QKV_CHOICES}")
    if attn_save_p not in _ATTN_SAVE_P_CHOICES:
        raise ValueError(
            f"TRAIN.ATTN_SAVE_P={attn_save_p!r} not in {_ATTN_SAVE_P_CHOICES}")
    if mlp_remat == "auto":
        MLP_REMAT = _SHIPPED_MLP_REMAT
        fused_mlp.SAVE_GP = fused_mlp._SHIPPED_SAVE_GP
    elif mlp_remat in ("kernel+gp", "kernel+h1"):
        # explicit backward-residual selection for the fused block
        # (ops/fused_mlp.SAVE_GP); bare "kernel" keeps the current setting
        # so probes that set the global directly stay in control
        MLP_REMAT = "kernel"
        fused_mlp.SAVE_GP = mlp_remat == "kernel+gp"
    else:
        MLP_REMAT = None if mlp_remat == "none" else mlp_remat
    if ln_qkv == "auto":
        LN_QKV = _SHIPPED_LN_QKV
    else:
        LN_QKV = None if ln_qkv == "none" else ln_qkv
    if attn_save_p == "auto":
        fa.SAVE_P = fa._SHIPPED_SAVE_P
    else:
        fa.SAVE_P = attn_save_p == "on"
    if (MLP_REMAT, LN_QKV, fa.SAVE_P, fused_mlp.SAVE_GP) != prev:
        jax.clear_caches()
    return MLP_REMAT, LN_QKV, fa.SAVE_P


_INFER_MLP_CHOICES = ("auto", "none", "kernel", "lnout")


def set_infer_mlp(mode="auto"):
    """Select the inference-path MLP dispatch (INFER_MLP_KERNEL /
    INFER_MLP_LNOUT above): "lnout" = cross-layer fused Pallas block,
    "kernel" = plain fused block, "none" = stock XLA, "auto" = the
    measured-best shipped default. Returns the effective mode.

    Changing the effective mode clears jax's jit caches — the knobs are
    read at TRACE time inside pipeline graphs cached under module-level
    @jax.jit (segment_mosaic etc.), so a same-process flip would
    otherwise keep serving the previously traced route. This is not
    hypothetical: the r5 on-chip A/B first measured lnout == stock to
    0.01 ms BECAUSE both arms hit the first arm's cached segment_mosaic
    jaxpr; with the caches cleared the real difference is ~10 ms/mosaic
    (BENCH.md r5).
    """
    global INFER_MLP_KERNEL, INFER_MLP_LNOUT
    if mode not in _INFER_MLP_CHOICES:
        raise ValueError(
            f"infer mlp mode {mode!r} not in {_INFER_MLP_CHOICES}")
    prev = (INFER_MLP_KERNEL, INFER_MLP_LNOUT)
    if mode == "auto":
        INFER_MLP_KERNEL = _SHIPPED_INFER_MLP_KERNEL
        INFER_MLP_LNOUT = _SHIPPED_INFER_MLP_LNOUT
    else:
        INFER_MLP_KERNEL = mode == "kernel"
        INFER_MLP_LNOUT = mode == "lnout"
    if (INFER_MLP_KERNEL, INFER_MLP_LNOUT) != prev:
        jax.clear_caches()
    return ("kernel" if INFER_MLP_KERNEL
            else "lnout" if INFER_MLP_LNOUT else "none")


_INFER_QUANT_CHOICES = ("auto", "none", "int8")


def set_infer_quant(mode="auto"):
    """Select the inference quantization mode (ops/quant.py).

    "int8" runs the projection / MLP matmuls of the INFERENCE paths
    (train=False — the mosaic/eval hot loops) as dynamic W8A8 int8 dots on
    the MXU's double-rate int8 path; the attention s/o dots and all
    training routes are untouched. "auto" restores the shipped default
    (full precision until the on-chip probe, tools/probe_int8.py, shows
    the rate win holds through this backend at Dice parity). Returns the
    effective mode.

    Changing the effective mode clears jax's jit caches: the mode is read
    at TRACE time inside graphs the pipeline caches under plain @jax.jit
    (segment_single / segment_mosaic), so a cached full-precision graph
    would silently keep serving after a switch to int8 — the A/B tools
    and tests flip modes within one process.
    """
    from ..ops import quant

    if mode not in _INFER_QUANT_CHOICES:
        raise ValueError(
            f"infer quant mode {mode!r} not in {_INFER_QUANT_CHOICES}")
    prev = quant.MODE
    if mode == "auto":
        quant.MODE = quant._SHIPPED_MODE
    else:
        quant.MODE = None if mode == "none" else mode
    if quant.MODE != prev:
        jax.clear_caches()
    return quant.MODE


def _ln_qkv_attention(bp, cfg: ViTConfig, x, *, interpret=False):
    """Attention branch with LN1 fused into the qkv projection (train path).

    Equivalent to mha_flash's folded route (ops/attention.mha_auto with
    prefer_folded=True) preceded by nn.layer_norm — same flash kernel, same
    out-projection — but the LN fwd+bwd lives inside the ln_linear custom
    VJP instead of standalone XLA fusions.
    """
    from ..ops.attention import split_qkv
    from ..ops.flash_attention import (SAVE_P, DEFAULT_BLOCK_Q,
                                       flash_attention_trainable)
    from ..ops.fused_mlp import pick_block_r
    from ..ops.ln_linear import ln_linear

    b, n, d = x.shape
    wqkv = bp["attn"]["wqkv"]
    bqkv = bp["attn"].get("bqkv")
    if bqkv is None:
        bqkv = jnp.zeros((wqkv.shape[1],), wqkv.dtype)
    qkv = ln_linear(x.reshape(b * n, d), bp["norm1"]["scale"],
                    bp["norm1"]["bias"], wqkv, bqkv, cfg.ln_eps,
                    pick_block_r(x.dtype), interpret).reshape(b, n, 3 * d)
    q, k, v = split_qkv(qkv, cfg.num_heads)
    out = flash_attention_trainable(q, k, v, DEFAULT_BLOCK_Q, interpret,
                                    SAVE_P)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    proj = jnp.dot(out, bp["attn"]["wo"], preferred_element_type=jnp.float32)
    proj = proj + bp["attn"]["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)


def _mlp_forward(bp, cfg: ViTConfig, x, *, remat_mode=None, quant=False):
    """LN2 -> w1 -> GELU -> w2 residual branch of a block.

    quant=True (inference only, ops/quant.py mode "int8") runs both
    matmuls as dynamic-int8 MXU dots; LN/GELU/bias stay float.

    remat_mode controls which intermediates the backward pass may keep:

    * None: stock autodiff. Saves ln2(x), h1, AND gelu(h1) per block — the
      saved gelu output has two backward consumers (dW2 and the dh1 chain),
      so XLA materializes standalone VPU-only erf/exp fusions that nothing
      overlaps; measured 7.7 ms of the 49.7 ms MIM step (BENCH.md).
    * "gelu": gelu(h1) is NOT saved; backward recomputes it from the saved
      h1, which XLA fuses into the dW2 matmul (operand fusion) and the
      dh1 = (dout @ W2^T) * gelu'(h1) product (output fusion) — the erf/exp
      recompute rides the MXU instead of serializing after it.
    * "gelu+ln": additionally drops ln2(x); backward recomputes the row
      stats from x. Trades two more row-reduction passes for one less
      (B, N, D) residual store+load.
    """
    h = nn.layer_norm(bp["norm2"], x, cfg.ln_eps)
    if remat_mode:
        h = checkpoint_name(h, "ln2_out")
    if quant:
        from ..ops.quant import int8_dot

        h = (int8_dot(h, bp["mlp"]["w1"])
             + bp["mlp"]["b1"].astype(jnp.float32)).astype(x.dtype)
        g = nn.gelu(h)
        return (int8_dot(g, bp["mlp"]["w2"])
                + bp["mlp"]["b2"].astype(jnp.float32)).astype(x.dtype)
    h = nn.linear({"kernel": bp["mlp"]["w1"], "bias": bp["mlp"]["b1"]}, h)
    g = nn.gelu(h)
    if remat_mode:
        g = checkpoint_name(g, "gelu_out")
    return nn.linear({"kernel": bp["mlp"]["w2"], "bias": bp["mlp"]["b2"]}, g)


_MLP_POLICIES = {
    "gelu": ("gelu_out",),
    "gelu+ln": ("gelu_out", "ln2_out"),
}


def _block_forward(bp, cfg: ViTConfig, x, *, impl="auto", n_valid=None,
                   prefer_folded=False, train=False):
    """One pre-norm transformer block (vision_transformer.py:94-114).

    impl: "auto" (Pallas flash on TPU, differentiable via the custom VJP in
    ops/flash_attention.py; XLA fallback elsewhere), "chunked"
    (streaming-softmax XLA path, differentiable), "materialize" (full
    attention matrix, used by the extraction paths).

    n_valid (impl="auto" only): x is a padded residual stream; the flash
    kernel masks the padded key columns, LN/MLP are row-local so the pad
    rows carry garbage-but-finite values that never touch valid rows.

    train=True applies the measured-best MLP remat mode (MLP_REMAT) so the
    backward pass recomputes the elementwise tail inside the matmuls.
    """
    from ..parallel.mesh import dp_island, kernel_mesh, pure_dp

    on_tpu = jax.default_backend() in ("tpu", "axon")
    mesh = kernel_mesh()
    # on a multi-device mesh the Pallas kernel routes engage only for
    # pure-dp (via a shard_map island — GSPMD can't partition the Mosaic
    # custom call); tp>1 falls back to the partitionable XLA paths, same
    # policy as mha_auto
    single = mesh is None or mesh.size == 1
    kernel_ok = single or pure_dp(mesh)
    if (train and impl == "auto" and n_valid is None and LN_QKV == "kernel"
            and kernel_ok and (on_tpu or FUSED_MLP_INTERPRET)):
        if pure_dp(mesh):
            y = dp_island(
                lambda xx, pp: _ln_qkv_attention(pp, cfg, xx,
                                                 interpret=not on_tpu),
                mesh, x, bp)
        else:
            y = _ln_qkv_attention(bp, cfg, x, interpret=not on_tpu)
    else:
        h = nn.layer_norm(bp["norm1"], x, cfg.ln_eps)
        if impl == "auto":
            y = att.mha_auto(h, bp["attn"], cfg.num_heads, n_valid=n_valid,
                             prefer_folded=prefer_folded, train=train)
        elif impl == "chunked":
            y = att.mha_fused(h, bp["attn"], cfg.num_heads)
        else:
            y = att.mha(h, bp["attn"], cfg.num_heads)
    x = x + y
    mode = MLP_REMAT if train else None
    if mode == "kernel":
        if kernel_ok and (on_tpu or FUSED_MLP_INTERPRET):
            from ..ops import fused_mlp
            from ..ops.fused_mlp import fused_mlp_block, pick_block_r

            b, n, d = x.shape
            save_gp = fused_mlp.SAVE_GP  # read at trace time (see SAVE_GP)

            def _mlp_kernel_call(xx, sc, bb, w1, b1, w2, b2):
                out = fused_mlp_block(xx.reshape(-1, d), sc, bb, w1, b1,
                                      w2, b2, cfg.ln_eps,
                                      pick_block_r(xx.dtype), not on_tpu,
                                      save_gp)
                return out.reshape(xx.shape)

            args = (x, bp["norm2"]["scale"], bp["norm2"]["bias"],
                    bp["mlp"]["w1"], bp["mlp"]["b1"],
                    bp["mlp"]["w2"], bp["mlp"]["b2"])
            if pure_dp(mesh):
                return dp_island(_mlp_kernel_call, mesh, *args)
            return _mlp_kernel_call(*args)
        # tp>1 mesh (or CPU without interpret): the partitionable XLA
        # remat path computes the same function
        mode = "gelu"
    if mode:
        mlp = jax.checkpoint(
            partial(_mlp_forward, bp, cfg, remat_mode=mode),
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                *_MLP_POLICIES[mode]),
        )
        return x + mlp(x)
    from ..ops.quant import quant_enabled

    use_quant = not train and quant_enabled()
    if (not train and not use_quant and INFER_MLP_KERNEL and kernel_ok
            and (on_tpu or FUSED_MLP_INTERPRET)):
        # forward-only fused residual+LN2+MLP Pallas block (see the
        # INFER_MLP_KERNEL definition above): same primal as the training
        # route's custom VJP, but want=None — no residual outputs to DCE
        from ..ops.fused_mlp import fused_mlp_block, pick_block_r

        d = x.shape[-1]

        def _mlp_infer_call(xx, sc, bb, w1, b1, w2, b2):
            out = fused_mlp_block(xx.reshape(-1, d), sc, bb, w1, b1, w2, b2,
                                  cfg.ln_eps, pick_block_r(xx.dtype),
                                  not on_tpu)
            return out.reshape(xx.shape)

        args = (x, bp["norm2"]["scale"], bp["norm2"]["bias"],
                bp["mlp"]["w1"], bp["mlp"]["b1"],
                bp["mlp"]["w2"], bp["mlp"]["b2"])
        if pure_dp(mesh):
            return dp_island(_mlp_infer_call, mesh, *args)
        return _mlp_infer_call(*args)
    return x + _mlp_forward(bp, cfg, x, quant=use_quant)


def _lnout_available():
    """INFER_MLP_LNOUT route gate: kernel-capable backend, and either no
    kernel mesh or a pure-dp one (the kernel rides a dp_island with
    n_out=2; tp>1 meshes keep the partitionable stock route, same policy
    as every other Pallas dispatch)."""
    from ..parallel.mesh import kernel_mesh, pure_dp

    on_tpu = jax.default_backend() in ("tpu", "axon")
    mesh = kernel_mesh()
    return ((on_tpu or FUSED_MLP_INTERPRET)
            and (mesh is None or mesh.size == 1 or pure_dp(mesh)))


def _block_forward_lnout(bp, next_norm1, cfg: ViTConfig, x, h_pre, *,
                         n_valid=None):
    """One inference block on the cross-layer-fused route (INFER_MLP_LNOUT).

    h_pre is this layer's normalized input as emitted by the PREVIOUS
    layer's fused MLP kernel (None for the first layer — computed here);
    when next_norm1 is given, returns (x, z) where z = LN(x)·s2 + b2 is
    the NEXT layer's normalized input, computed inside the kernel while
    the residual chunk is in VMEM (ops/fused_mlp.fused_mlp_block_lnout).
    Semantics are identical to _block_forward + the next layer's LN1.
    On a pure-dp kernel mesh both kernel calls ride a dp_island over the
    tile axis (n_out=2 for the (out, z) pair), so multi-chip pure-dp
    inference takes the same route — and produces the same masks — as
    single-chip.
    """
    from ..ops import fused_mlp as fm
    from ..parallel.mesh import dp_island, kernel_mesh, pure_dp

    on_tpu = jax.default_backend() in ("tpu", "axon")
    mesh = kernel_mesh()
    h = h_pre if h_pre is not None else nn.layer_norm(bp["norm1"], x,
                                                      cfg.ln_eps)
    y = att.mha_auto(h, bp["attn"], cfg.num_heads, n_valid=n_valid,
                     prefer_folded=False, train=False)
    x = x + y
    d = x.shape[-1]
    br = fm.pick_block_r(x.dtype)
    mlp_args = (bp["norm2"]["scale"], bp["norm2"]["bias"],
                bp["mlp"]["w1"], bp["mlp"]["b1"],
                bp["mlp"]["w2"], bp["mlp"]["b2"])
    if next_norm1 is None:
        def _last(xx, *a):
            out = fm.fused_mlp_block(xx.reshape(-1, d), *a, cfg.ln_eps,
                                     br, not on_tpu)
            return out.reshape(xx.shape)

        if pure_dp(mesh):
            return dp_island(_last, mesh, x, *mlp_args), None
        return _last(x, *mlp_args), None

    def _pair(xx, *a):
        o, z = fm.fused_mlp_block_lnout(xx.reshape(-1, d), *a, cfg.ln_eps,
                                        br, not on_tpu)
        return o.reshape(xx.shape), z.reshape(xx.shape)

    args = mlp_args + (next_norm1["scale"], next_norm1["bias"])
    if pure_dp(mesh):
        return dp_island(_pair, mesh, x, *args, n_out=2)
    return _pair(x, *args)


def _scan_blocks(params, cfg: ViTConfig, x, lo: int, hi: int, *, impl="auto",
                 remat=False, train=False):
    """Run blocks [lo, hi) under lax.scan over the stacked depth axis.

    On TPU with the flat flash kernel active, the token stream is padded to
    the kernel's row multiple ONCE here and sliced back after the scan, so
    no per-layer pad/slice/transpose touches HBM (ops/flash_attention.py
    "qkvflat" design). Contract unchanged: (B, N, D) in, (B, N, D) out.

    train=True (the MIM/finetune loss paths) keeps the UNPADDED stream and
    the folded multi-block kernel: measured on chip, padding the residual
    stream to the flat kernel's 128-row multiple costs +14% on every dense
    op in fwd AND bwd at 224² (n=785→896), more than the layout ops it
    saves — the flat kernel is an inference win (n=2305: 152.7→116.2
    ms/mosaic) and a training loss (52.7→63.1 ms/iter), so each path gets
    its own route.
    """
    if hi <= lo:
        return x
    from ..ops.flash_attention import padded_rows, qkvflat_fits

    n = x.shape[1]
    pad_stream = (
        impl == "auto"
        and not train
        and jax.default_backend() in ("tpu", "axon")
        and qkvflat_fits(n, cfg.num_heads, cfg.head_dim)
    )
    n_valid = None
    if pad_stream:
        np_ = padded_rows(n)
        if np_ != n:
            x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
        n_valid = n
    sliced = jax.tree.map(lambda a: a[lo:hi], params["blocks"])

    def body(carry, bp):
        return _block_forward(bp, cfg, carry, impl=impl, n_valid=n_valid,
                              prefer_folded=train, train=train), None

    if remat:
        body = jax.checkpoint(body)
    on_cpu_interp = (FUSED_MLP_INTERPRET
                     and jax.default_backend() not in ("tpu", "axon"))
    if (INFER_MLP_LNOUT and not train and not remat and impl == "auto"
            and (pad_stream or on_cpu_interp) and _lnout_available()):
        # cross-layer fused route (see INFER_MLP_LNOUT): each layer's MLP
        # kernel emits the next layer's normalized input; the last layer
        # in [lo, hi) emits none — callers running blocks past `hi`
        # manually (get_intermediate_*) do their own LN, unchanged.
        h_pre = None
        for i in range(hi - lo):
            bp_i = jax.tree.map(lambda a, i=i: a[i], sliced)
            nxt = (jax.tree.map(lambda a, i=i: a[i + 1],
                                sliced["norm1"])
                   if i + 1 < hi - lo else None)
            x, h_pre = _block_forward_lnout(bp_i, nxt, cfg, x, h_pre,
                                            n_valid=n_valid)
    elif UNROLL_INFER_BLOCKS and pad_stream and not remat:
        # Unrolled inference block loop (r4): the lax.scan carry forces XLA
        # to pick ONE layout for the residual stream across the loop
        # boundary, and it picks token-minor {1,2,0} — every layer then
        # pays a physical relayout of the (B, Np, D) stream around the
        # row-major Pallas custom call (trace_ops r4: a 183 MB {2,1,0}->
        # {1,2,0} fusion accounting for a large slice of the mosaic wall).
        # Unrolling lets the layout assignment flow row-major end to end.
        # Inference-only: the train path keeps the scan (bwd memory) and
        # remat composes with scan, not the unrolled form.
        for i in range(hi - lo):
            x, _ = body(x, jax.tree.map(lambda a, i=i: a[i], sliced))
    else:
        x, _ = jax.lax.scan(body, x, sliced)
    if pad_stream and x.shape[1] != n:
        x = x[:, :n]
    return x


def forward_features(params, cfg: ViTConfig, x, *, remat=False):
    """All blocks + final LayerNorm -> (B, N+1, D)  (forward_feats, :218-223)."""
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth, remat=remat)
    return nn.layer_norm(params["norm"], tok, cfg.ln_eps)


def forward_cls(params, cfg: ViTConfig, x):
    """CLS embedding (the reference's `forward`, :211-216)."""
    return forward_features(params, cfg, x)[:, 0]


def get_intermediate_layers(params, cfg: ViTConfig, x, n=1):
    """Normed token outputs of the last n blocks (:248-256), stacked (n, B, N+1, D)."""
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth - n)
    outs = []
    for i in range(cfg.depth - n, cfg.depth):
        tok = _block_forward(block_params(params, i), cfg, tok)
        outs.append(nn.layer_norm(params["norm"], tok, cfg.ln_eps))
    return jnp.stack(outs)


def get_intermediate_feat(params, cfg: ViTConfig, x, n=1):
    """Reference get_intermediate_feat (:225-237): for the last n blocks,
    return (feats, attns, qkvs) stacked on a leading n axis.

    feats: (n, B, N+1, D) post-norm; attns: (n, B, h, N+1, N+1) materialized
    probabilities; qkvs: (n, 3, B, h, N+1, head_dim).
    """
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth - n)
    feats, attns, qkvs = [], [], []
    for i in range(cfg.depth - n, cfg.depth):
        bp = block_params(params, i)
        h = nn.layer_norm(bp["norm1"], tok, cfg.ln_eps)
        y, attn, qkv = att.mha(h, bp["attn"], cfg.num_heads, return_attn=True)
        tok = tok + y
        h = nn.layer_norm(bp["norm2"], tok, cfg.ln_eps)
        h = nn.linear({"kernel": bp["mlp"]["w1"], "bias": bp["mlp"]["b1"]}, h)
        h = nn.gelu(h)
        tok = tok + nn.linear({"kernel": bp["mlp"]["w2"], "bias": bp["mlp"]["b2"]}, h)
        feats.append(nn.layer_norm(params["norm"], tok, cfg.ln_eps))
        attns.append(attn)
        qkvs.append(qkv)
    return jnp.stack(feats), jnp.stack(attns), jnp.stack(qkvs)


def get_last_selfattention(params, cfg: ViTConfig, x):
    """Materialized last-block attention (B, h, N+1, N+1)  (:239-246)."""
    _, attns, _ = get_intermediate_feat(params, cfg, x, n=1)
    return attns[0]


def cls_attention_grid(params, cfg: ViTConfig, x):
    """Hot inference path: last-block CLS-row attention as a patch grid.

    Returns (B, h, gh, gw): equivalent to compute_attention's
    attn[0, :, 0, 1:].reshape(h, gh, gw) (utils.py:229-233) for every
    image in the batch, but computed without materializing any attention
    matrix: blocks 0..L-2 run fused, the last block is one q-row.
    (For query indices other than CLS use :func:`query_attention_rows`.)
    """
    b, hgt, wdt, _ = x.shape
    gh, gw = hgt // cfg.patch_size, wdt // cfg.patch_size
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth - 1)
    bp = block_params(params, cfg.depth - 1)
    h = nn.layer_norm(bp["norm1"], tok, cfg.ln_eps)
    row = att.cls_row_attention(h, bp["attn"], cfg.num_heads)
    return row[:, :, 1:].reshape(b, cfg.num_heads, gh, gw)


def query_attention_rows(params, cfg: ViTConfig, x, queries):
    """Attention rows for a static list of query token indices.

    Supports the region-query / query-grid analysis modes
    (analyse_attention.py:183-247) without materializing N^2: computes
    softmax(q[queries] K^T) for the last block. queries: int array (Q,).
    Returns (B, h, Q, N+1).
    """
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth - 1)
    bp = block_params(params, cfg.depth - 1)
    h = nn.layer_norm(bp["norm1"], tok, cfg.ln_eps)
    d = cfg.embed_dim
    wqkv, bqkv = bp["attn"]["wqkv"], bp["attn"].get("bqkv")
    q = jnp.dot(h[:, queries, :], wqkv[:, :d], preferred_element_type=jnp.float32).astype(h.dtype)
    k = jnp.dot(h, wqkv[:, d : 2 * d], preferred_element_type=jnp.float32).astype(h.dtype)
    if bqkv is not None:
        q = q + bqkv[:d]
        k = k + bqkv[d : 2 * d]
    b, nq, _ = q.shape
    n = k.shape[1]
    hd = cfg.head_dim
    q = q.reshape(b, nq, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * hd**-0.5
    return jax.nn.softmax(logits, axis=-1).astype(h.dtype)


def last_block_key_features(params, cfg: ViTConfig, x):
    """Per-patch key vectors of the last block, (B, gh, gw, D).

    Feeds the k-means feature-clustering method (eval.py:186-202), which
    reshapes k to (B, N, D) and drops the CLS row.
    """
    b, hgt, wdt, _ = x.shape
    gh, gw = hgt // cfg.patch_size, wdt // cfg.patch_size
    tok = prepare_tokens(params, cfg, x)
    tok = _scan_blocks(params, cfg, tok, 0, cfg.depth - 1)
    bp = block_params(params, cfg.depth - 1)
    h = nn.layer_norm(bp["norm1"], tok, cfg.ln_eps)
    d = cfg.embed_dim
    k = jnp.dot(h, bp["attn"]["wqkv"][:, d : 2 * d], preferred_element_type=jnp.float32).astype(h.dtype)
    if "bqkv" in bp["attn"]:
        k = k + bp["attn"]["bqkv"][d : 2 * d]
    return k[:, 1:, :].reshape(b, gh, gw, d)
