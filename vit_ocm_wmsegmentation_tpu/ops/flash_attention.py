"""Pallas TPU fused attention kernel for the ViT block forward.

Why: at 384^2 tiles the token count is N=2305, and XLA's dot-softmax-dot
materializes (B, h, N, N) float32 logits in HBM (~2.8 GB per 512-row chunk
for the 49-tile mosaic batch) — the pipeline is HBM-bandwidth bound. This
kernel keeps everything in VMEM: each program loads one q block plus the
full K/V for its (batch, head) slice (N*d*2B ~ 0.3 MB each in bf16 — ViT
sequence lengths fit VMEM comfortably), computes the (block_q, N) softmax
in f32 on the fly, and writes only the (block_q, d) output. No N^2 HBM
traffic.

Performance design (v5e): with d=64 both dots run at half MXU utilization
(s-dot contraction depth 64, o-dot output width 64), so the remaining lever
is VPU traffic over the (block_q, N) f32 score matrix. Measured r1->r2:
each elementwise pass over `s` costs about as much as an MXU dot, so the
kernel minimizes passes:

* the 1/sqrt(d) scale is folded into q outside the kernel (O(N d), not O(N^2));
* padded-key masking is a (1, Np) bias row fused into the max/exp passes
  (no iota/compare pass);
* exp writes bf16 directly (halves write traffic; identical rounding to
  exp->f32->cast because the cast is value-rounding either way);
* the softmax denominator comes FREE from the o-dot: V is extended with a
  ones column to width 2d (64 -> 128 fills the MXU's output width — the
  o-dot takes the same cycles as the 64-wide one), so the row-sum pass
  disappears; the kernel divides the 64-wide o by column 64.
* row max is kept (one read pass) for overflow robustness.

Layout: q, k, v are (BH, N, d) with BH = batch*heads folded; d = head_dim
(64 for ViT-S). N is padded to a lane multiple; padded key columns get
bias -1e30, padded q rows are sliced off by the caller.

:func:`flash_attention` is the raw forward; :func:`flash_attention_trainable`
adds a Pallas backward (custom VJP, logsumexp residual recomputation) so both
inference and training use the kernel on TPU (ops/attention.mha_auto
dispatches; CPU falls back to the chunked XLA path).

Replaces the reference's cuBLAS/cuDNN attention
(/root/reference/Self-supervised_segmentation/dino/vision_transformer.py:78-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 0  # 0 = auto: one q block of round_up(N, 8) rows when the
# (bq, Np) f32 score matrix fits VMEM — minimal q-row padding (N=2305 pads
# 0.3% instead of 5.5% at 2432) and one program per (batch, head)
_AUTO_VMEM_S_BYTES = 40 * 1024 * 1024


def _pick_block_q(block_q: int, n: int, np_: int, *, save_p: bool = False,
                  itemsize: int = 4) -> int:
    if block_q:
        return min(block_q, np_)
    bq = _round_up(n, 8)
    # the auto pick budgets the (bq, Np) working set per program: the f32
    # scores alone on the lse route; on the savep route also the P block
    # (in fwd out / bwd in, `itemsize` bytes) and its f32 value — without
    # this a shape whose scores fit would exceed the 100 MB vmem limit
    # only when save_p is on. fwd and bwd call with identical arguments so
    # the saved P's block layout always matches.
    per_elem = 4 + (4 + 2 * itemsize if save_p else 0)
    if bq * np_ * per_elem <= _AUTO_VMEM_S_BYTES:
        return bq
    return min(1216, np_)


def _attn_fwd_kernel(q_ref, kt_ref, ve_ref, bias_ref, o_ref, aux_ref=None,
                     p_ref=None, *, d: int):
    # inputs stay in their storage dtype (bf16 on the hot path) — the MXU
    # takes bf16 operands at full rate and accumulates in f32; upcasting
    # first would force a ~4x slower f32 matmul. q arrives pre-scaled.
    q = q_ref[0]  # (bq, d)
    kt = kt_ref[0]  # (d, Np) — pre-transposed outside so the MXU consumes it
    # directly (saves a per-program VMEM transpose)
    ve = ve_ref[0]  # (Np, 2d): [v | ones | zeros]
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]  # bias: 0 on valid keys, -1e30 on padded columns
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(ve.dtype)  # single pass, bf16 write
    if p_ref is not None:  # savep residual: the backward reads P back
        p_ref[0] = p
    oe = jax.lax.dot_general(
        p, ve, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, 2d): [:, :d] = o*denom, [:, d] = denom
    denom = oe[:, d : d + 1]
    o_ref[0] = (oe[:, :d] / denom).astype(o_ref.dtype)
    if aux_ref is not None:  # training residual; the lane-1 write costs ~15%
        # lse-route: logsumexp; savep-route: 1/denom (P * inv == softmax)
        aux_ref[0] = 1.0 / denom if p_ref is not None else m + jnp.log(denom)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fold(x, b, h, n, d, pad_to):
    x = x.reshape(b * h, n, d)
    return jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))


def _flash_fwd(q, k, v, block_q: int, interpret: bool, want_lse: bool,
               want_p: bool = False):
    """Returns (out (BH, Npq, d), aux (BH, Npq, 1) f32 or None,
    p (BH, Npq, Np) or None).

    aux exists only on the training paths: logsumexp on the lse route,
    1/denom when want_p (its (bq, 1) block occupies one lane of the
    (8, 128) VMEM tile, a pathologically padded write that costs ~15% of
    the kernel — inference skips it). want_p additionally writes the
    unnormalized P so the backward runs transcendental-free.
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    bq = _pick_block_q(block_q, n, np_, save_p=want_p, itemsize=q.dtype.itemsize)
    nq = pl.cdiv(n, bq)
    np_q = nq * bq

    qf = _fold((q.astype(jnp.float32) * scale).astype(q.dtype), b, h, n, d, np_q)
    ktf = jnp.swapaxes(_fold(k, b, h, n, d, np_), 1, 2)  # (BH, d, Np)
    vf = _fold(v, b, h, n, d, np_)
    ones = jnp.concatenate(
        [jnp.ones((b * h, np_, 1), vf.dtype), jnp.zeros((b * h, np_, d - 1), vf.dtype)], axis=-1
    )
    vef = jnp.concatenate([vf, ones], axis=-1)  # (BH, Np, 2d)
    bias = jnp.where(jnp.arange(np_) < n, 0.0, -1e30).astype(jnp.float32)[None, :]

    out_specs = [pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype)]
    if want_lse or want_p:
        out_specs.append(pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b * h, np_q, 1), jnp.float32))
    if want_p:
        out_specs.append(pl.BlockSpec((1, bq, np_), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b * h, np_q, np_), q.dtype))

    res = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, d=d),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, np_), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 2 * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=b * h * ((np_q + 3 * np_) * d * 2
                                    + (np_q * np_ if want_p else 0))
            * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qf, ktf, vef, bias)
    if want_p:
        return res[0], res[1], res[2]
    if want_lse:
        return res[0], res[1], None
    return res[0], None, None


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, *, block_q: int = DEFAULT_BLOCK_Q, interpret: bool = False):
    """softmax(q k^T / sqrt(d)) v for (B, h, N, d) inputs, fused on TPU.

    Numerically equal to ops.attention.attention_scores @ v (f32 softmax),
    tested in both interpret (CPU) and compiled (TPU) modes.
    """
    b, h, n, d = q.shape
    out, _, _ = _flash_fwd(q, k, v, block_q, interpret, want_lse=False)
    return out[:, :n, :].reshape(b, h, n, d)


# Training-path dispatch: save the forward's unnormalized softmax P (plus
# 1/denom) instead of recomputing exp(s - lse) in the backward. The MIM
# tail decomposition (BENCH.md) measured the attention backward
# VPU-transcendental-bound — ~12 us of elementwise f32 passes (exp
# recompute + dS assembly) against ~4.6 us of MXU dots per program — so
# trading the exp pass for a cheap row-broadcast multiply (e = P * inv)
# plus one HBM round-trip of P (~1.4 MB/program, far below the kernel's
# bandwidth headroom) and dropping the s-recompute dot is a net win on
# paper; tools/probe_fused_mlp.py's "+savep" variants measured it on chip
# (r4): 56.5 ms vs 49.6 baseline on the MIM AMP step — the P round-trip
# through HBM costs more than the elementwise passes it removes, so the
# route stays OFF (a tested opt-in for future shapes).
# _SHIPPED_SAVE_P is the single source of truth for the measured default
# (flip it here if a future probe picks it); SAVE_P is the live route,
# set via models/vit.set_train_kernel_modes / cfg.TRAIN.ATTN_SAVE_P
# ("auto" restores the shipped value).
_SHIPPED_SAVE_P = False
SAVE_P = _SHIPPED_SAVE_P


def _attn_bwd_savep_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, p_ref, inv_ref,
                           dq_ref, dk_ref, dv_ref):
    """Backward with the forward's P resident: e = P * inv reproduces the
    softmax probabilities with one row-broadcast multiply (no exp, no
    s-recompute dot, no bias/lse bookkeeping). Padded key columns carry
    P == 0 exactly (masked in the forward) and padded q rows carry dO == 0,
    so every pad contribution is exactly zero without masking."""
    j = pl.program_id(1)
    q = q_ref[0]  # pre-scaled
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]

    e = p_ref[0].astype(jnp.float32) * inv_ref[0]  # (bq, Np) true probs
    pt = e.astype(v.dtype)  # bf16 operand for the dv dot
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (e * (dp - dcap)).astype(v.dtype)

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dv_blk = jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_blk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(j != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)


def _flash_bwd_savep_impl(q, k, v, o, p, inv, do, block_q, interpret):
    """p: (BH, Npq, Np) and inv: (BH, Npq, 1) exactly as _flash_fwd_savep
    produced them (same block_q -> same bq layout)."""
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    # same save_p-aware pick as the forward, so p's block layout matches
    bq = _pick_block_q(block_q, n, np_, save_p=True, itemsize=q.dtype.itemsize)
    nq = pl.cdiv(n, bq)
    np_q = nq * bq

    qf = _fold((q.astype(jnp.float32) * scale).astype(q.dtype), b, h, n, d, np_q)
    dof = _fold(do, b, h, n, d, np_q)
    of = _fold(o, b, h, n, d, np_q)
    kf = _fold(k, b, h, n, d, np_)
    vf = _fold(v, b, h, n, d, np_)

    blk_q = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    blk_p = pl.BlockSpec((1, bq, np_), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_inv = pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _attn_bwd_savep_kernel,
        grid=(b * h, nq),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q, blk_q, blk_p, blk_inv],
        out_specs=(blk_q, blk_kv, blk_kv),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * n * n * d,
            bytes_accessed=b * h * ((3 * np_q + 4 * np_) * d + np_q * np_) * q.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, of, p, inv)

    unfold = lambda x, nn: x[:, :nn, :].reshape(b, h, nn, d)
    dq = unfold(dq, n)
    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype)
    return dq, unfold(dk, n), unfold(dv, n)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, bias_ref,
                     dq_ref, dk_ref, dv_ref):
    """Backward for one q block with full K/V resident: recomputes the
    softmax rows from the saved logsumexp (one exp pass, no max/sum), then
    dV += P^T dO, dS = P*(dP - D), dK += dS^T q_scaled, dq = dS K * scale.
    dk/dv accumulate across the (sequential) q-block grid axis into
    i-indexed output blocks. q arrives pre-scaled; the final dq scale
    multiply happens outside on the (N, d) result."""
    j = pl.program_id(1)
    q = q_ref[0]  # pre-scaled
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]  # (bq, 1) f32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    e = jnp.exp(s + bias_ref[:] - lse)  # (bq, Np) f32, one transcendental pass
    p = e.astype(v.dtype)  # bf16 operand for the dv dot
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # (bq,1)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # dS from the unrounded f32 exp (SSA reuse): skips the bf16->f32 upcast
    # pass the old p-roundtrip form paid, and is strictly more accurate
    ds = (e * (dp - dcap)).astype(v.dtype)  # (bq, Np) bf16

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dv_blk = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_blk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(j != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, block_q, interpret):
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    bq = _pick_block_q(block_q, n, np_)
    nq = pl.cdiv(n, bq)
    np_q = nq * bq

    qf = _fold((q.astype(jnp.float32) * scale).astype(q.dtype), b, h, n, d, np_q)
    dof = _fold(do, b, h, n, d, np_q)
    of = _fold(o, b, h, n, d, np_q)
    kf = _fold(k, b, h, n, d, np_)
    vf = _fold(v, b, h, n, d, np_)
    bias = jnp.where(jnp.arange(np_) < n, 0.0, -1e30).astype(jnp.float32)[None, :]
    # padded q rows: lse was computed with all -1e30 logits -> m=-1e30,
    # denom=bq... their p rows are garbage but sliced off; make them finite
    lse = jnp.nan_to_num(lse, posinf=0.0, neginf=0.0)
    if lse.shape[1] < np_q:  # callers may pass only the n valid rows
        lse = jnp.pad(lse, ((0, 0), (0, np_q - lse.shape[1]), (0, 0)))

    blk_q = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    blk_lse = pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_bias = pl.BlockSpec((1, np_), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(b * h, nq),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q, blk_q, blk_lse, blk_bias],
        out_specs=(blk_q, blk_kv, blk_kv),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * d,
            bytes_accessed=b * h * (3 * np_q + 4 * np_) * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, of, lse, bias)

    unfold = lambda x, nn: x[:, :nn, :].reshape(b, h, nn, d)
    dq = unfold(dq, n)
    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype)  # undo the q pre-scale
    return dq, unfold(dk, n), unfold(dv, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                              interpret: bool = False, save_p: bool = False):
    """Differentiable flash attention: Pallas forward AND backward kernels.
    Drop-in for the training path. With save_p=False neither direction
    moves N^2 HBM traffic (the backward recomputes exp(s - lse) in VMEM).

    save_p=True saves the forward's unnormalized P (+ 1/denom) so the
    backward runs transcendental-free (see SAVE_P above) — P DOES
    round-trip HBM as an (BH, Npq, Np) residual per call, trading
    bandwidth (cheap at MIM shapes) for VPU exp (the measured bottleneck).
    Numerics: identical math; in bf16 the saved P carries one extra bf16
    rounding vs the f32 exp recompute."""
    return flash_attention(q, k, v, block_q=block_q, interpret=interpret)


def _fa_fwd(q, k, v, block_q, interpret, save_p):
    b, h, n, d = q.shape
    if save_p:
        out, inv, p = _flash_fwd(q, k, v, block_q, interpret,
                                 want_lse=False, want_p=True)
        o = out[:, :n, :].reshape(b, h, n, d)
        return o, (q, k, v, o, p, inv)
    out, lse, _ = _flash_fwd(q, k, v, block_q, interpret, want_lse=True)
    o = out[:, :n, :].reshape(b, h, n, d)
    return o, (q, k, v, o, lse, None)


def _fa_bwd(block_q, interpret, save_p, res, do):
    if save_p:
        q, k, v, o, p, inv = res
        return _flash_bwd_savep_impl(q, k, v, o, p, inv, do, block_q, interpret)
    q, k, v, o, lse, _ = res
    return _flash_bwd_impl(q, k, v, o, lse, do, block_q, interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# qkv-direct forward (round-3 "qkvflat" design): the kernel consumes the
# fused projection tensor (B, Np, 3hd) AS IS — a legal 3-D block (the last
# dim is loaded whole), with q/k/v per head taken as 64/128-lane in-register
# slices — and writes (B, Np, hd) that the out-proj matmul consumes
# directly. The round-2 wrapper spent ~1.6 ms per mosaic-layer on HBM-level
# layout ops around the kernel (split_qkv transpose, K pre-transpose,
# V‖ones concat, output transpose — tools/probe_scaling.py `mha` vs `attn`);
# here all of them disappear. Two further kernel-level changes, both
# slope-measured on chip (tools/bench_attn_opt.py):
#
# * the O(bq·Np) row-max pass is replaced by a Cauchy-Schwarz bound
#   m_i = |q_i|·max_j|k_j| (O((bq+Np)·d)): softmax is shift-invariant, so
#   any per-row upper bound of the logits prevents exp overflow, and
#   lse = m + log(denom) is still exactly logsumexp. 6.07 -> 5.35 ms/layer.
#   Underflow to an all-zero row needs bound slack > 87 nats — out of reach
#   for LN'd ViT activations (|q||k| must exceed ~150 post-scale); the
#   denominator is clamped so even adversarial inputs degrade to a zero row
#   instead of NaN.
# * V‖ones is assembled per head as an in-register concat (SSA value), NOT
#   in a reused VMEM scratch: on current Mosaic, rewriting one scratch
#   buffer across the unrolled head iterations and feeding it to the MXU
#   miscompiles — the dot of one head consumed a STALE scratch (observed as
#   a deterministic single-head 70%-relative error in bf16; f32 dodged it
#   only by perturbing the schedule). Diagnosed by on-chip bisection:
#   slice->store identity clean, f32 p@ve clean, per-head scratch regions
#   clean, SSA concat clean — only the reused-scratch bf16 form corrupt.
#   The SSA form has explicit dataflow deps, costs nothing (73.6 vs
#   73.7 TF/s slope-measured), and cannot alias.
#
# An earlier 5-D (B, Np, 3, h, d) blocked design failed Mosaic lowering
# ("unsupported shape cast"); blocking the head dim out of the last-two
# block dims is illegal on TPU. The flat layout sidesteps that entirely.
# ---------------------------------------------------------------------------

_DENOM_TINY = 1e-35  # adversarial-input guard; never binds for sane inputs


def _attn_fwd_qkvflat_kernel(qkv_ref, bias_ref, o_ref, lse_ref,
                             *, h: int, d: int):
    """One program per batch element, all rows resident; heads unrolled
    (python loop over a static h). qkv_ref: (1, Np, 3hd) with the q section
    pre-scaled (scale folded into wqkv's q columns at trace time).

    The head loop is software-pipelined one ahead: head hh+1's s-dot (MXU)
    is emitted BEFORE head hh's exp pass (VPU), giving the Mosaic scheduler
    an always-ready independent MXU chain to overlap the softmax with.
    Chip A/B at the mosaic shape (tools/bench_attn_opt.py, r4 slope-fit):
    5.411 -> 5.232 ms/layer (73.9 -> 76.4 useful TF/s). The two further
    softmax-VPU levers probed in the same session are measured washes and
    stay out: exp2 with a LOG2E q-prescale fold (5.265 — the VPU's exp is
    already exp2-based) and bf16 subtract/exp passes (5.241 — not
    byte-bound). Dataflow per head is IDENTICAL to the unpipelined form
    (same ops, same order within a head), so numerics are bit-equal; the
    cost is one extra live (Np, Np) f32 score matrix (+23.6 MB VMEM at the
    mosaic shape — qkvflat_fits accounts for it)."""
    dm = h * d
    rows = qkv_ref.shape[1]
    bias = bias_ref[:]
    dtype = qkv_ref.dtype
    ones_pat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1) == 0, 1.0, 0.0
    ).astype(dtype)

    def load(hh):
        q = qkv_ref[0, :, hh * d : (hh + 1) * d]
        k = qkv_ref[0, :, dm + hh * d : dm + (hh + 1) * d]
        v = qkv_ref[0, :, 2 * dm + hh * d : 2 * dm + (hh + 1) * d]
        return q, k, v

    def score(q, k):
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
        kmax = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=1)))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + bias
        # qn*kmax >= row max of s (Cauchy-Schwarz on the same values)
        return s, qn * kmax

    q0, k0, v = load(0)
    s, m = score(q0, k0)
    for hh in range(h):
        if hh + 1 < h:
            qn_, kn_, vn_ = load(hh + 1)
            s_next, m_next = score(qn_, kn_)  # MXU work ahead of the exp
        p = jnp.exp(s - m).astype(dtype)
        ve = jnp.concatenate([v, ones_pat], axis=1)  # SSA; see header comment
        oe = jax.lax.dot_general(p, ve, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        denom = jnp.maximum(oe[:, d : d + 1], _DENOM_TINY)
        o_ref[0, :, hh * d : (hh + 1) * d] = (oe[:, :d] / denom).astype(o_ref.dtype)
        if lse_ref is not None:
            # exactly logsumexp: m + log(sum_j exp(s_j - m)); lane-hh write
            # exists only on the training path
            lse_ref[0, :, hh : hh + 1] = m + jnp.log(denom)
        if hh + 1 < h:
            s, m, v = s_next, m_next, vn_


def _attn_fwd_qkvflat_kernel_nolse(qkv_ref, bias_ref, o_ref, *, h, d):
    _attn_fwd_qkvflat_kernel(qkv_ref, bias_ref, o_ref, None, h=h, d=d)


def _qkv_pad_rows(n: int) -> int:
    """Rows the padded qkv/residual tensors carry on the flat-kernel path."""
    return _round_up(n, 128)


def qkvflat_fits(n: int, num_heads: int, head_dim: int) -> bool:
    """True when the one-program-per-batch flat kernel's VMEM working set
    (TWO f32 score matrices — the head pipeline keeps the next head's s
    live across this head's exp — + bf16 p + in/out blocks) fits the
    budget; callers fall back to the folded multi-block kernel otherwise."""
    np_ = _qkv_pad_rows(n)
    dm = num_heads * head_dim
    need = 10 * np_ * np_ + 2 * (3 * dm + dm) * np_ * 2 + np_ * 2 * head_dim * 2
    return need <= 100 * 1024 * 1024


def _flash_fwd_qkvflat(qkv, num_heads, n: int, interpret: bool, want_lse: bool):
    """qkv: (B, Np, 3hd) padded fused projection, q section pre-scaled.
    Returns (out (B, Np, hd), lse (B, Np, h) f32 or None)."""
    b, np_, cols = qkv.shape
    d = cols // 3 // num_heads
    dm = num_heads * d
    bias = jnp.where(jnp.arange(np_) < n, 0.0, -1e30).astype(jnp.float32)[None, :]

    out_specs = [pl.BlockSpec((1, np_, dm), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, np_, dm), qkv.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec((1, np_, num_heads), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, np_, num_heads), jnp.float32))

    kern = functools.partial(
        _attn_fwd_qkvflat_kernel if want_lse else _attn_fwd_qkvflat_kernel_nolse,
        h=num_heads, d=d)
    res = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if want_lse else out_specs[0],
        out_shape=tuple(out_shape) if want_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the head pipeline holds two f32 score matrices (~75 MB total
            # working set at the mosaic shape); measured at this limit in
            # tools/bench_attn_opt.py qkvflat_pipe
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * np_ * np_ * d,
            bytes_accessed=b * np_ * (3 * dm + dm) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * np_ * np_,
        ),
        interpret=interpret,
    )(qkv, bias)
    if want_lse:
        return res[0], res[1]
    return res, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def attention_qkv(qkv, num_heads, n: int, interpret: bool = False):
    """softmax attention straight from the fused qkv projection.

    qkv: (B, Np, 3hd), rows >= n padded with anything finite (their outputs
    are garbage and their key columns are masked); the q section must carry
    the 1/sqrt(d) scale already. Returns (B, Np, hd) — padded rows stay,
    so a padded residual stream flows through with zero layout ops.
    """
    out, _ = _flash_fwd_qkvflat(qkv, num_heads, n, interpret, want_lse=False)
    return out


def _attention_qkv_fwd(qkv, num_heads, n, interpret):
    out, lse = _flash_fwd_qkvflat(qkv, num_heads, n, interpret, want_lse=True)
    return out, (qkv, out, lse)


def _attention_qkv_bwd(num_heads, n, interpret, res, do_pad):
    qkv, out, lse = res
    b, np_, cols = qkv.shape
    h = num_heads
    d = cols // 3 // h
    # recover the (B, h, N, d) views the backward kernel consumes; these
    # transposes exist only on the training path
    qkv5 = qkv[:, :n].reshape(b, n, 3, h, d)
    q = qkv5[:, :, 0].transpose(0, 2, 1, 3)  # pre-scaled, as _flash_bwd expects... see below
    k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
    o = out[:, :n].reshape(b, n, h, d).transpose(0, 2, 1, 3)
    lse_bh = lse[:, :n].transpose(0, 2, 1).reshape(b * h, n, 1)
    do = do_pad[:, :n].reshape(b, n, h, d).transpose(0, 2, 1, 3)
    # q arrives ALREADY scaled (the fold happened in the caller's weights);
    # _flash_bwd_impl scales internally, so feed it the unscaled q and let
    # it re-apply — then dq comes back in unscaled-q units and must be
    # rescaled to match the pre-scaled input.
    scale = d**-0.5
    dq, dk, dv = _flash_bwd_impl((q.astype(jnp.float32) / scale).astype(q.dtype),
                                 k, v, o, lse_bh, do, 0, interpret)
    dq = (dq.astype(jnp.float32) / scale).astype(q.dtype)
    dqkv5 = jnp.stack([dq, dk, dv], axis=2)  # (B, h, 3, N, d)
    dqkv = dqkv5.transpose(0, 3, 2, 1, 4).reshape(b, n, cols)
    return (jnp.pad(dqkv, ((0, 0), (0, np_ - n), (0, 0))),)


attention_qkv.defvjp(_attention_qkv_fwd, _attention_qkv_bwd)


padded_rows = _qkv_pad_rows  # public alias for the padded-residual-stream callers


def _scaled_qkv_weights(params, num_heads):
    """Fold the 1/sqrt(d) attention scale into wqkv's q columns (and the q
    section of the bias) at trace time — a (D, 3D) elementwise op on the
    weight, free relative to any per-activation pass."""
    wqkv = params["wqkv"]
    dm = wqkv.shape[0]
    scale = (dm // num_heads) ** -0.5
    colscale = jnp.concatenate(
        [jnp.full((dm,), scale, jnp.float32), jnp.ones((2 * dm,), jnp.float32)])
    wq = (wqkv.astype(jnp.float32) * colscale).astype(wqkv.dtype)
    bq = params["bqkv"].astype(jnp.float32) * colscale if "bqkv" in params else None
    return wq, bq


def mha_flash(x, params, num_heads, *, n_valid: int | None = None,
              prefer_folded: bool = False, interpret: bool = False,
              quant: bool = False):
    """Full MHSA block using the Pallas kernel (drop-in for mha_fused).

    With ``n_valid=None`` (drop-in mode) x is (B, N, D); the function pads
    to the kernel's row multiple internally and returns (B, N, D). With
    ``n_valid=n`` x is an ALREADY padded residual stream of
    ``padded_rows(n)`` rows (vit._scan_blocks pads once for the whole
    scan), and the padded shape flows through — zero per-layer layout ops.

    prefer_folded=True (training paths, vit._scan_blocks train=True) skips
    the flat kernel: its row padding taxes the dense bwd more than the saved
    layout ops are worth (chip-measured; see _scan_blocks docstring).

    quant=True (inference-only, set by mha_auto from ops/quant.py's mode)
    runs the qkv/out projection dots as dynamic int8 MXU dots; the
    attention s/o dots inside the kernel stay bf16 — their ceiling is the
    d=64 contraction shape, not the FLOP rate (BENCH.md roofline).
    """
    padded_in = n_valid is not None
    n = n_valid if padded_in else x.shape[1]
    b, _, dmodel = x.shape
    d = dmodel // num_heads

    from .quant import int8_dot

    def proj_dot(a, w):
        if quant:
            return int8_dot(a, w)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    if prefer_folded or not qkvflat_fits(n, num_heads, d):
        # folded multi-block kernel path for sequence lengths whose score
        # matrix exceeds the one-program VMEM budget (quant applies here
        # too — large-sequence inference is where the projection FLOPs
        # are biggest, and mha_auto only sets quant on inference paths)
        from .attention import split_qkv

        xs = x[:, :n] if padded_in else x
        qkv = proj_dot(xs, params["wqkv"]).astype(x.dtype)
        if "bqkv" in params:
            qkv = qkv + params["bqkv"].astype(x.dtype)
        q, k, v = split_qkv(qkv, num_heads)
        out = flash_attention_trainable(q, k, v, DEFAULT_BLOCK_Q, interpret,
                                        SAVE_P)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, dmodel)
        proj = proj_dot(out, params["wo"]) + params["bo"].astype(jnp.float32)
        proj = proj.astype(x.dtype)
        if padded_in:
            proj = jnp.pad(proj, ((0, 0), (0, x.shape[1] - n), (0, 0)))
        return proj

    np_ = _qkv_pad_rows(n)
    wq, bq = _scaled_qkv_weights(params, num_heads)
    xp = x if padded_in else jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    qkv = proj_dot(xp, wq)
    if bq is not None:
        qkv = qkv + bq
    out = attention_qkv(qkv.astype(x.dtype), num_heads, n, interpret)  # (B, Np, hd)
    if not padded_in:
        out = out[:, :n]
    proj = proj_dot(out, params["wo"]) + params["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)


def mha_flash_dp(x, params, num_heads, mesh, *, n_valid: int | None = None,
                 prefer_folded: bool = False, interpret: bool = False,
                 quant: bool = False):
    """mha_flash shard_mapped over the mesh's 'data' (batch) axis.

    pallas_call lowers to a Mosaic custom call that XLA's SPMD partitioner
    cannot split — under plain GSPMD a dp-sharded batch would be
    all-gathered onto every device and the kernel run replicated. The
    dp_island wrapper (parallel/mesh.py) runs the unmodified single-device
    kernel on each shard's local batch instead (every kernel grid here is
    batch-parallel), psums the replicated-weight cotangents over 'data' via
    the shard_map transpose, and pads indivisible batches with zero rows —
    so dp training gradients equal the single-device step
    (tests/test_parallel.py). Precondition: parallel.mesh.pure_dp.
    """
    from ..parallel.mesh import dp_island

    return dp_island(
        lambda xx, pp: mha_flash(xx, pp, num_heads, n_valid=n_valid,
                                 prefer_folded=prefer_folded,
                                 interpret=interpret, quant=quant),
        mesh, x, params)
