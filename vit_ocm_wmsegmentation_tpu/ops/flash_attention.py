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

Forward-only: the inference pipelines use it; training keeps the chunked
XLA path (ops/attention.mha_fused) whose VJP is standard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (Np, d)
    v = v_ref[0]  # (Np, d)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, Np)
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
    kf = fold(k, np_)
    vf = fold(v, np_)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=n, scale=scale),
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
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
    )(qf, kf, vf)
    return out[:, :n, :].reshape(b, h, n, d)


def mha_flash(x, params, num_heads, *, interpret: bool = False):
    """Full MHSA block using the Pallas kernel (drop-in for mha_fused)."""
    from .attention import split_qkv

    b, n, dmodel = x.shape
    qkv = jnp.dot(x, params["wqkv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bqkv" in params:
        qkv = qkv + params["bqkv"].astype(x.dtype)
    q, k, v = split_qkv(qkv, num_heads)
    out = flash_attention(q, k, v, interpret=interpret)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, dmodel)
    proj = jnp.dot(out, params["wo"], preferred_element_type=jnp.float32) + params["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)
