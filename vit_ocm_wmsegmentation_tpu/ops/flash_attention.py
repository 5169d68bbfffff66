"""Pallas TPU fused attention kernel for the ViT block forward.

Why: at 384^2 tiles the token count is N=2305, and XLA's dot-softmax-dot
materializes (B, h, N, N) float32 logits in HBM (~2.8 GB per 512-row chunk
for the 49-tile mosaic batch) — the pipeline is HBM-bandwidth bound. This
kernel keeps everything in VMEM: each program loads one q block plus the
full K/V for its (batch, head) slice (N*d*4B ~ 0.6 MB each — ViT sequence
lengths fit VMEM comfortably), computes the (block_q, N) softmax in f32 on
the fly, and writes only the (block_q, d) output. No N^2 HBM traffic.

Layout: q, k, v are (BH, N, d) with BH = batch*heads folded; d = head_dim
(64 for ViT-S). N is padded to a lane multiple; padded key columns are
masked to -inf, padded q rows are sliced off by the caller.

:func:`flash_attention` is the raw forward; :func:`flash_attention_trainable`
adds a Pallas backward (custom VJP) so both inference and training use the
kernel on TPU (ops/attention.mha_auto dispatches; CPU falls back to the
chunked XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    # inputs stay in their storage dtype (bf16 on the hot path) — the MXU
    # takes bf16 operands at full rate and accumulates in f32; upcasting
    # first would force a ~4x slower f32 matmul
    q = q_ref[0]  # (bq, d)
    kt = kt_ref[0]  # (d, Np) — pre-transposed outside so the MXU consumes it
    # directly (saves a per-program VMEM transpose)
    v = v_ref[0]  # (Np, d)
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, Np) f32
    np_keys = s.shape[-1]
    if np_keys > n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, *, block_q: int = 512, interpret: bool = False):
    """softmax(q k^T / sqrt(d)) v for (B, h, N, d) inputs, fused on TPU.

    Numerically equal to ops.attention.attention_scores @ v (f32 softmax),
    tested in both interpret (CPU) and compiled (TPU) modes.
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    bq = min(block_q, np_)
    nq = pl.cdiv(np_, bq)
    np_q = nq * bq

    def fold(x, pad_to):
        x = x.reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))

    qf = fold(q, np_q)
    ktf = jnp.swapaxes(fold(k, np_), 1, 2)  # (BH, d, Np)
    vf = fold(v, np_)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=n, scale=scale),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, np_), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=b * h * (np_q + 2 * np_) * d * q.dtype.itemsize * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    return out[:, :n, :].reshape(b, h, n, d)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref,
                     *, n_valid: int, scale: float):
    """Backward for one q block with full K/V resident: recomputes the
    softmax rows, then dV += P^T dO, dS = P*(dP - D), dK += dS^T q * scale,
    dq = dS K * scale. dk/dv accumulate across the (sequential) q-block grid
    axis into i-indexed output blocks."""
    j = pl.program_id(1)
    # storage-dtype operands, f32 accumulation (see _attn_kernel)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    np_keys = s.shape[-1]
    if np_keys > n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (bq, Np)

    d = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # (bq, 1)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - d)  # (bq, Np)

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dv_blk = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_blk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale

    @pl.when(j == 0)
    def _():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(j != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)


def _flash_fwd_impl(q, k, v, block_q, interpret):
    return flash_attention(q, k, v, block_q=block_q, interpret=interpret)


def _flash_bwd_impl(q, k, v, o, do, block_q, interpret):
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    bq = min(block_q, np_)
    nq = pl.cdiv(np_, bq)
    np_q = nq * bq

    def fold(x, pad_to):
        x = x.reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))

    qf, dof, of = fold(q, np_q), fold(do, np_q), fold(o, np_q)
    kf, vf = fold(k, np_), fold(v, np_)

    blk_q = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_valid=n, scale=scale),
        grid=(b * h, nq),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q, blk_q],
        out_specs=(blk_q, blk_kv, blk_kv),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, np_, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * d,
            bytes_accessed=b * h * (3 * np_q + 4 * np_) * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, of)

    unfold = lambda x, nn: x[:, :nn, :].reshape(b, h, nn, d)
    return unfold(dq, n), unfold(dk, n), unfold(dv, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, block_q: int = 512, interpret: bool = False):
    """Differentiable flash attention: Pallas forward AND backward kernels
    (no N^2 HBM traffic in either direction). Drop-in for the training path."""
    return _flash_fwd_impl(q, k, v, block_q, interpret)


def _fa_fwd(q, k, v, block_q, interpret):
    o = _flash_fwd_impl(q, k, v, block_q, interpret)
    return o, (q, k, v, o)


def _fa_bwd(block_q, interpret, res, do):
    q, k, v, o = res
    return _flash_bwd_impl(q, k, v, o, do, block_q, interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


def mha_flash(x, params, num_heads, *, interpret: bool = False):
    """Full MHSA block using the Pallas kernel (drop-in for mha_fused)."""
    from .attention import split_qkv

    b, n, dmodel = x.shape
    qkv = jnp.dot(x, params["wqkv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bqkv" in params:
        qkv = qkv + params["bqkv"].astype(x.dtype)
    q, k, v = split_qkv(qkv, num_heads)
    out = flash_attention_trainable(q, k, v, 512, interpret)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, dmodel)
    proj = jnp.dot(out, params["wo"], preferred_element_type=jnp.float32) + params["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)
