"""Multi-head self-attention primitives.

Semantics mirror the reference Attention module
(dino/vision_transformer.py:66-90): one fused qkv projection, scale
``head_dim**-0.5``, softmax over keys, output projection. Three entry points
with different materialization:

* :func:`mha` — full block attention; optionally returns the (B,h,N,N)
  attention probabilities and the qkv tensor for the extraction paths.
* :func:`mha_fused` — same output, never materializes N^2 probabilities
  (Pallas flash kernel on TPU, chunked lax.scan elsewhere). Used for the
  non-extracted blocks of the inference hot loop.
* :func:`cls_row_attention` — only the CLS-query softmax row of the last
  block, O(N) memory: downstream only consumes attn[:, :, 0, 1:]
  (utils.py:229-235), so the last block needs just q_cls . K^T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_qkv(qkv, num_heads):
    """(B,N,3D) -> (3, B, h, N, d), replicating the torch reshape/permute at
    dino/vision_transformer.py:80."""
    b, n, dd3 = qkv.shape
    d = dd3 // 3
    hd = d // num_heads
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    return qkv.transpose(2, 0, 3, 1, 4)


def attention_scores(q, k):
    """softmax(q k^T / sqrt(d)) materialized: (B,h,N,N)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    return jax.nn.softmax(logits, axis=-1).astype(q.dtype)


def mha(x, params, num_heads, *, return_attn=False):
    """Full MHSA. Returns (out,) or (out, attn, qkv) when return_attn.

    qkv is returned in the reference layout (3, B, h, N, d) because the
    k-means feature-clustering path consumes it directly (eval.py:186-202).
    """
    qkv = jnp.dot(x, params["wqkv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bqkv" in params:
        qkv = qkv + params["bqkv"].astype(x.dtype)
    q, k, v = split_qkv(qkv, num_heads)
    attn = attention_scores(q, k)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    b, h, n, hd = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    out = (jnp.dot(out, params["wo"], preferred_element_type=jnp.float32) + params["bo"].astype(jnp.float32)).astype(x.dtype)
    if return_attn:
        return out, attn, jnp.stack([q, k, v])
    return out


def mha_fused(x, params, num_heads, *, q_chunk=512, quant=False):
    """MHSA without materializing the full (N,N) probability matrix.

    Computes softmax(qK^T)V in query chunks with a numerically stable
    streaming softmax (flash-attention recurrence) under lax.scan, so peak
    memory is O(N * q_chunk) per head. On TPU the Pallas kernel in
    :mod:`..ops.flash_attention` supersedes this for the hot path; this
    version is the portable fallback and the correctness oracle.

    quant=True (inference only — mha_auto sets it from ops/quant.py's mode
    and the train flag; never enable under differentiation, the int8
    round() has zero gradient) runs the qkv/out projections as dynamic
    int8 dots.
    """
    from .quant import int8_dot

    def proj_dot(a, w):
        if quant:
            return int8_dot(a, w)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    b, n, dmodel = x.shape
    qkv = proj_dot(x, params["wqkv"]).astype(x.dtype)
    if "bqkv" in params:
        qkv = qkv + params["bqkv"].astype(x.dtype)
    q, k, v = split_qkv(qkv, num_heads)
    scale = q.shape[-1] ** -0.5

    pad = (-n) % q_chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nq = qp.shape[2] // q_chunk
    qp = qp.reshape(b, num_heads, nq, q_chunk, -1)

    def chunk(qc):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qc, k, preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return (o / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)

    out = jax.lax.map(lambda qc: chunk(qc), jnp.moveaxis(qp, 2, 0))
    out = jnp.moveaxis(out, 0, 2).reshape(b, num_heads, nq * q_chunk, -1)[:, :, :n]
    out = out.transpose(0, 2, 1, 3).reshape(b, n, dmodel)
    proj = proj_dot(out, params["wo"]) + params["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)


# Tests only: let mha_auto take the shard_map kernel route on CPU with the
# Pallas kernels in interpret mode, so the exact multi-chip dp dispatch is
# exercised on the virtual-device mesh (tests/test_parallel.py).
DP_KERNEL_INTERPRET = False


def mha_auto(x, params, num_heads, *, n_valid=None, prefer_folded=False,
             train=False):
    """Backend dispatch: the Pallas flash kernel on TPU backends, the
    chunked XLA path elsewhere (CPU tests, autodiff).

    train=False + ops/quant.py mode "int8" quantizes the qkv/out
    projection dots (never the training routes — int8 round() has no
    useful gradient).

    With a kernel mesh active (parallel.mesh.set_kernel_mesh — the
    multi-chip training/inference paths), a pure-dp mesh wraps the kernel
    in a jax.shard_map island over 'data' (mha_flash_dp: GSPMD cannot
    partition a Mosaic custom call). tp>1 keeps the chunked XLA attention,
    which GSPMD partitions along the Megatron head rules — documented
    delta: the Pallas kernel is dp/single-device; tensor parallelism rides
    the XLA path.

    n_valid marks x as a padded residual stream (flash_attention.mha_flash);
    the CPU fallback slices to the valid rows and pads the result back.
    """
    from ..parallel.mesh import kernel_mesh, pure_dp
    from .quant import quant_enabled

    quant = quant_enabled() and not train
    on_tpu = jax.default_backend() in ("tpu", "axon")
    mesh = kernel_mesh()
    if on_tpu or (DP_KERNEL_INTERPRET and mesh is not None):
        from .flash_attention import mha_flash, mha_flash_dp

        if pure_dp(mesh):
            # dp_island pads indivisible batches (mosaic tile counts)
            return mha_flash_dp(x, params, num_heads, mesh, n_valid=n_valid,
                                prefer_folded=prefer_folded,
                                interpret=not on_tpu, quant=quant)
        if on_tpu and (mesh is None or mesh.size == 1):
            return mha_flash(x, params, num_heads, n_valid=n_valid,
                             prefer_folded=prefer_folded, quant=quant)
        # tp>1: GSPMD-partitionable XLA path below
    if n_valid is not None and n_valid != x.shape[1]:
        out = mha_fused(x[:, :n_valid], params, num_heads, quant=quant)
        return jnp.pad(out, ((0, 0), (0, x.shape[1] - n_valid), (0, 0)))
    return mha_fused(x, params, num_heads, quant=quant)


def cls_row_attention(x, params, num_heads):
    """CLS-row attention probabilities of one block: (B, h, N).

    Only q[CLS] and K are computed — no V, no output projection, no N^2
    matrix. This is the whole last-block cost of the inference pipeline
    (the reference materializes all 12 full attention matrices instead).
    """
    b, n, d = x.shape
    wqkv, bqkv = params["wqkv"], params.get("bqkv")
    wq, wk = wqkv[:, :d], wqkv[:, d : 2 * d]
    q_cls = jnp.dot(x[:, 0, :], wq, preferred_element_type=jnp.float32)
    k = jnp.dot(x, wk, preferred_element_type=jnp.float32)
    if bqkv is not None:
        q_cls = q_cls + bqkv[:d].astype(jnp.float32)
        k = k + bqkv[d : 2 * d].astype(jnp.float32)
    hd = d // num_heads
    q_cls = q_cls.reshape(b, num_heads, hd)
    k = k.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhd,bhnd->bhn", q_cls, k, preferred_element_type=jnp.float32)
    logits = logits * (hd**-0.5)
    return jax.nn.softmax(logits, axis=-1).astype(x.dtype)
