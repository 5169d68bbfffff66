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


def _pick_block_q(block_q: int, n: int, np_: int) -> int:
    if block_q:
        return min(block_q, np_)
    bq = _round_up(n, 8)
    if bq * np_ * 4 <= _AUTO_VMEM_S_BYTES:
        return bq
    return min(1216, np_)


def _attn_fwd_kernel(q_ref, kt_ref, ve_ref, bias_ref, o_ref, lse_ref=None, *, d: int):
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
    oe = jax.lax.dot_general(
        p, ve, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, 2d): [:, :d] = o*denom, [:, d] = denom
    denom = oe[:, d : d + 1]
    o_ref[0] = (oe[:, :d] / denom).astype(o_ref.dtype)
    if lse_ref is not None:  # training residual; the lane-1 write costs ~15%
        lse_ref[0] = m + jnp.log(denom)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fold(x, b, h, n, d, pad_to):
    x = x.reshape(b * h, n, d)
    return jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))


def _flash_fwd(q, k, v, block_q: int, interpret: bool, want_lse: bool):
    """Returns (out (B,h,N,d), lse (BH, Npq, 1) f32 or None).

    The lse output exists only on the training path: its (bq, 1) block
    occupies one lane of the (8, 128) VMEM tile, a pathologically padded
    write that costs ~15% of the kernel — inference skips it.
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    np_ = _round_up(n, 128)
    bq = _pick_block_q(block_q, n, np_)
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
    if want_lse:
        out_specs.append(pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b * h, np_q, 1), jnp.float32))

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
            bytes_accessed=b * h * (np_q + 3 * np_) * d * q.dtype.itemsize * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qf, ktf, vef, bias)
    if want_lse:
        return res[0], res[1]
    return res[0], None


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, *, block_q: int = DEFAULT_BLOCK_Q, interpret: bool = False):
    """softmax(q k^T / sqrt(d)) v for (B, h, N, d) inputs, fused on TPU.

    Numerically equal to ops.attention.attention_scores @ v (f32 softmax),
    tested in both interpret (CPU) and compiled (TPU) modes.
    """
    b, h, n, d = q.shape
    out, _ = _flash_fwd(q, k, v, block_q, interpret, want_lse=False)
    return out[:, :n, :].reshape(b, h, n, d)


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
    p = jnp.exp(s + bias_ref[:] - lse).astype(v.dtype)  # (bq, Np) bf16, one pass

    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)  # (bq,1)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) * (dp - dcap)).astype(v.dtype)  # (bq, Np) bf16

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, block_q: int = DEFAULT_BLOCK_Q, interpret: bool = False):
    """Differentiable flash attention: Pallas forward AND backward kernels
    (no N^2 HBM traffic in either direction). Drop-in for the training path."""
    return flash_attention(q, k, v, block_q=block_q, interpret=interpret)


def _fa_fwd(q, k, v, block_q, interpret):
    b, h, n, d = q.shape
    out, lse = _flash_fwd(q, k, v, block_q, interpret, want_lse=True)
    o = out[:, :n, :].reshape(b, h, n, d)
    return o, (q, k, v, o, lse)


def _fa_bwd(block_q, interpret, res, do):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, do, block_q, interpret)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# qkv-direct forward: the kernel reads q/k/v straight out of the padded
# (B, Np, 3, h, d) projection tensor via three BlockSpecs over the SAME
# array, and writes output in (B, Npq, h, d) so the proj matmul consumes it
# as a free reshape. Round-3 redesign: the round-2 wrapper spent ~1.3 ms per
# mosaic-layer on HBM-level layout ops around the kernel (split_qkv
# transpose, K pre-transpose, V‖ones concat, output transpose — measured by
# tools/probe_scaling.py vs tools/bench_attn_opt.py v0); here every one of
# those becomes either a BlockSpec index_map or a per-program VMEM scratch
# fill, and the softmax is software-pipelined over q chunks so the VPU
# passes overlap the MXU dots of neighboring chunks.
# ---------------------------------------------------------------------------

_STAGGER_WAYS = 4


def _span_bounds(total: int, ways: int):
    step = _round_up(-(-total // ways), 8)
    bounds = list(range(0, total, step)) + [total]
    return list(zip(bounds[:-1], bounds[1:]))


def _attn_fwd_qkv_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, ve_scr,
                         *, d: int, scale: float, ways: int):
    """One program per (batch, q-block), ALL heads resident (the TPU
    lowering requires the last two block dims — (h, d) here — be full).

    3-stage software pipeline over the flattened (head, q-chunk) stage list:
    step t emits o-dot(t-2) | softmax(t-1) | s-dot(t) — mutually independent
    stages, so the VPU softmax can overlap the MXU dots of its neighbors."""
    h = q_ref.shape[3]
    bias = bias_ref[:]
    bq = q_ref.shape[1]
    npad = k_ref.shape[1]
    ones_pat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (npad, d), 1) == 0, 1.0, 0.0
    ).astype(ve_scr.dtype)
    for hh in range(h):
        ve_scr[hh, :, :d] = v_ref[0, :, 0, hh, :]
        ve_scr[hh, :, d:] = ones_pat
    stages = [(hh, a, b) for hh in range(h) for a, b in _span_bounds(bq, ways)]
    nsp = len(stages)
    s_buf, p_buf, m_buf = {}, {}, {}
    for t in range(nsp + 2):
        if 0 <= t - 2 < nsp:
            hh, a, b = stages[t - 2]
            oe = jax.lax.dot_general(p_buf.pop(t - 2), ve_scr[hh],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            denom = oe[:, d : d + 1]
            o_ref[0, a:b, hh, :] = (oe[:, :d] / denom).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, a:b, hh, :] = m_buf.pop(t - 2) + jnp.log(denom)
        if 0 <= t - 1 < nsp:
            st = s_buf.pop(t - 1)
            m = jnp.max(st, axis=-1, keepdims=True)
            p_buf[t - 1] = jnp.exp(st - m).astype(ve_scr.dtype)
            if lse_ref is not None:
                m_buf[t - 1] = m
        if t < nsp:
            hh, a, b = stages[t]
            q = (q_ref[0, a:b, 0, hh, :].astype(jnp.float32) * scale).astype(k_ref.dtype)
            s_buf[t] = jax.lax.dot_general(q, k_ref[0, :, 0, hh, :],
                                           (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32) + bias


def _flash_fwd_qkv(qkv5, n: int, interpret: bool, want_lse: bool):
    """qkv5: (B, Np, 3, h, d) padded projection tensor (bf16/f32).
    Returns (out (B, Npq, h, d), lse (B, Npq, h, 1) or None)."""
    b, np_, three, h, d = qkv5.shape
    assert three == 3
    scale = d**-0.5
    bq, ways = _pick_block_qkv(n, np_)
    nq = pl.cdiv(n, bq)
    np_q = nq * bq
    assert np_q <= np_, (np_q, np_)  # _qkv_pad_rows guarantees this
    bias = jnp.where(jnp.arange(np_) < n, 0.0, -1e30).astype(jnp.float32)[None, :]

    blk_q = pl.BlockSpec((1, bq, 1, h, d), lambda bb, j: (bb, j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((1, np_, 1, h, d), lambda bb, j: (bb, 0, 1, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_v = pl.BlockSpec((1, np_, 1, h, d), lambda bb, j: (bb, 0, 2, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_bias = pl.BlockSpec((1, np_), lambda bb, j: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, bq, h, d), lambda bb, j: (bb, j, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, np_q, h, d), qkv5.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec((1, bq, h, 1), lambda bb, j: (bb, j, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, np_q, h, 1), jnp.float32))

    kern = functools.partial(
        _attn_fwd_qkv_kernel if want_lse else _attn_fwd_qkv_kernel_nolse,
        d=d, scale=scale, ways=ways)
    res = pl.pallas_call(
        kern,
        grid=(b, nq),
        in_specs=[blk_q, blk_k, blk_v, blk_bias],
        out_specs=tuple(out_specs) if want_lse else out_specs[0],
        out_shape=tuple(out_shape) if want_lse else out_shape[0],
        scratch_shapes=[pltpu.VMEM((h, np_, 2 * d), qkv5.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=b * h * (np_q + 2 * np_) * d * qkv5.dtype.itemsize * 2,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qkv5, qkv5, qkv5, bias)
    if want_lse:
        return res[0], res[1]
    return res, None


def _pick_block_qkv(n: int, np_: int):
    """(bq, ways): q rows per program and softmax pipeline chunks, sized so
    ~2 in-flight (bq/ways, Np) f32 score chunks stay within the VMEM budget."""
    bq = _round_up(n, 8)
    if bq * np_ * 4 > _AUTO_VMEM_S_BYTES:
        bq = min(1216, np_)
    ways = _STAGGER_WAYS
    while ways < 64 and 2 * (-(-bq // ways)) * np_ * 4 > _AUTO_VMEM_S_BYTES // 2:
        ways *= 2
    return bq, ways


def _attn_fwd_qkv_kernel_nolse(q_ref, k_ref, v_ref, bias_ref, o_ref, ve_scr,
                               *, d: int, scale: float, ways: int):
    _attn_fwd_qkv_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, None, ve_scr,
                         d=d, scale=scale, ways=ways)


def _pack_qkv5(qkv, num_heads, n_to: int):
    """(B, N, 3hd) projection output -> padded (B, Np, 3, h, d)."""
    b, n, dd3 = qkv.shape
    d = dd3 // 3 // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)
    return jnp.pad(qkv5, ((0, 0), (0, n_to - n), (0, 0), (0, 0), (0, 0)))


def _qkv_pad_rows(n: int) -> int:
    """Rows the padded qkv tensor needs: key-pad to a lane multiple AND
    enough rows for the last q block (nq*bq can round past np_ on the
    multi-block path)."""
    np_ = _round_up(n, 128)
    bq, _ = _pick_block_qkv(n, np_)
    return max(np_, pl.cdiv(n, bq) * bq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def attention_qkv(qkv, num_heads, n: int, interpret: bool = False):
    """softmax attention straight from the fused qkv projection:
    (B, N, 3hd) -> (B, N, hd), no layout transposes in the forward."""
    b = qkv.shape[0]
    out, _ = _flash_fwd_qkv(_pack_qkv5(qkv, num_heads, _qkv_pad_rows(n)), n,
                            interpret, want_lse=False)
    return out[:, :n].reshape(b, n, -1)


def _attention_qkv_fwd(qkv, num_heads, n, interpret):
    b = qkv.shape[0]
    qkv5 = _pack_qkv5(qkv, num_heads, _qkv_pad_rows(n))
    out, lse = _flash_fwd_qkv(qkv5, n, interpret, want_lse=True)
    o_flat = out[:, :n].reshape(b, n, -1)
    return o_flat, (qkv5, out, lse)


def _attention_qkv_bwd(num_heads, n, interpret, res, do_flat):
    qkv5, out, lse = res
    b, np_, _, h, d = qkv5.shape
    # recover the (B, h, N, d) views the backward kernel consumes; these
    # transposes exist only on the training path (as in round 2)
    q = qkv5[:, :n, 0].transpose(0, 2, 1, 3)
    k = qkv5[:, :n, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, :n, 2].transpose(0, 2, 1, 3)
    o = out[:, :n].transpose(0, 2, 1, 3)
    lse_bh = lse.transpose(0, 2, 1, 3).reshape(b * h, -1, 1)
    do = do_flat.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, lse_bh, do, 0, interpret)
    dqkv5 = jnp.stack([dq, dk, dv], axis=2)  # (B, h, 3, N, d)
    dqkv = dqkv5.transpose(0, 3, 2, 1, 4).reshape(b, n, 3 * h * d)
    return (dqkv,)


attention_qkv.defvjp(_attention_qkv_fwd, _attention_qkv_bwd)


def mha_flash(x, params, num_heads, *, interpret: bool = False):
    """Full MHSA block using the Pallas kernel (drop-in for mha_fused).

    Routes through the proven (B, h, N, d)-folded kernel. The qkv-direct
    kernel above (attention_qkv) eliminates the split/transpose layout ops
    but its 5-D block shapes do not lower on current Mosaic ("unsupported
    shape cast" on the (bq, d) <-> (1, bq, 1, d) reshape); it stays an
    interpret-mode-tested experiment until the layout is restructured.
    """
    from .attention import split_qkv

    b, n, dmodel = x.shape
    qkv = jnp.dot(x, params["wqkv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bqkv" in params:
        qkv = qkv + params["bqkv"].astype(x.dtype)
    q, k, v = split_qkv(qkv, num_heads)
    out = flash_attention_trainable(q, k, v, DEFAULT_BLOCK_Q, interpret)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, dmodel)
    proj = jnp.dot(out, params["wo"], preferred_element_type=jnp.float32) + params["bo"].astype(jnp.float32)
    return proj.astype(x.dtype)
