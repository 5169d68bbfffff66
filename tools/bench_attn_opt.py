"""Flash-attention kernel optimization harness (slope-based timing).

Round-2's kernel tuning optimized against overhead-deflated measurements;
tools/probe_scaling.py showed the fixed ~28 ms scalar-sync latency was
hiding the kernel's real position: 7.34 ms per mosaic-layer = 54.5 TF/s
useful vs a ~88 TF/s pure-MXU shape ceiling (s-dot contraction 64 at half
rate; o-dot 128-wide at full rate executing 2x useful FLOPs; peak 177-188
TF/s per the paired-matmul slope probes). The ~2.8 ms/layer gap is VPU
softmax time that does not overlap the MXU dots.

Variants (one per process: `python tools/bench_attn_opt.py <variant>`):

  v0      current production kernel (ops/flash_attention.py)
  exp2    fold log2(e) into the q pre-scale and use exp2 (exp = exp2 + mul)
  split2  two q half-blocks interleaved in one program, giving the Mosaic
          scheduler independent MXU/VPU chains to overlap
  split4  four-way interleave
  grid2   block_q = N/2 via the grid (2 programs per (b,h))
  nomax   drop the row-max pass (UNSAFE numerics probe: bounds the max
          pass's cost, not a shippable variant)
  qkvflat_pipe  the production qkvflat form with an explicit one-ahead
          software pipeline over heads (next head's s-dot emitted before
          this head's exp) — probes whether emission order buys back the
          ~10% gap to the d=64 shape ceiling
  qkvflat_pipe2   pipe + exp2 (LOG2E folded into the q pre-scale: one VPU
          multiply per score element removed)
  qkvflat_pipe2b  pipe + exp2 + bf16 subtract/exp passes (half VPU bytes;
          numerics probe — Dice-gated before any production use)

Each prints slope ms/iter (one iter = one mosaic-layer's attention:
B=49, h=6, N=2305, d=64) and useful TF/s.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

B, H, N, D = 49, 6, 2305, 64
LOG2E = 1.4426950408889634


def _round_up(x, m):
    return (x + m - 1) // m * m


NP = _round_up(N, 128)  # 2432
BQ = _round_up(N, 8)  # 2312


def make_inputs(use_exp2=False, q_rows=BQ):
    rng = np.random.default_rng(0)
    scale = D**-0.5 * (LOG2E if use_exp2 else 1.0)
    q = jnp.asarray(rng.normal(0, 1, (B * H, q_rows, D)) * scale, jnp.bfloat16)
    kt = jnp.asarray(rng.normal(0, 1, (B * H, D, NP)), jnp.bfloat16)
    v = rng.normal(0, 1, (B * H, NP, D))
    ve = np.concatenate([v, np.ones((B * H, NP, 1)), np.zeros((B * H, NP, D - 1))], axis=-1)
    ve = jnp.asarray(ve, jnp.bfloat16)
    bias = jnp.where(jnp.arange(NP) < N, 0.0, -1e30).astype(jnp.float32)[None, :]
    return q, kt, ve, bias


def pallas_run(kernel, nq_blocks=1):
    bq = BQ // nq_blocks if nq_blocks > 1 else BQ
    if nq_blocks > 1:
        bq = _round_up(bq, 8)
    n_rows = _round_up(BQ, bq)

    @jax.jit
    def run(q, kt, ve, bias):
        return pl.pallas_call(
            kernel,
            grid=(B * H, n_rows // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, NP), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, n_rows, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, kt, ve, bias)

    return run, n_rows


def kern_base(q_ref, kt_ref, ve_ref, bias_ref, o_ref, *, expfn):
    q = q_ref[0]
    kt = kt_ref[0]
    ve = ve_ref[0]
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = expfn(s - m).astype(ve.dtype)
    oe = jax.lax.dot_general(p, ve, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def kern_nomax(q_ref, kt_ref, ve_ref, bias_ref, o_ref):
    q = q_ref[0]
    s = jax.lax.dot_general(q, kt_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias_ref[:]
    p = jnp.exp(s).astype(ve_ref.dtype)  # numerics probe only
    oe = jax.lax.dot_general(p, ve_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def _split_bounds(total, ways):
    """8-aligned chunk boundaries covering [0, total] (last chunk absorbs
    the remainder; total must itself be 8-aligned)."""
    step = _round_up(-(-total // ways), 8)
    bounds = list(range(0, total, step)) + [total]
    return list(zip(bounds[:-1], bounds[1:]))


def kern_split(q_ref, kt_ref, ve_ref, bias_ref, o_ref, *, ways, expfn):
    kt = kt_ref[0]
    ve = ve_ref[0]
    bias = bias_ref[:]
    # issue all s-dots first as independent chains, then their softmaxes,
    # then the o-dots: the scheduler can overlap softmax_i (VPU) with
    # s-dot_{i+1} / o-dot_{i-1} (MXU)
    spans = _split_bounds(BQ, ways)
    ss = [
        jax.lax.dot_general(q_ref[0, a:b], kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias
        for a, b in spans
    ]
    ps = []
    for s in ss:
        m = jnp.max(s, axis=-1, keepdims=True)
        ps.append(expfn(s - m).astype(ve.dtype))
    for (a, b), p in zip(spans, ps):
        oe = jax.lax.dot_general(p, ve, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, a:b] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def kern_stagger(q_ref, kt_ref, ve_ref, bias_ref, o_ref, *, ways, expfn):
    """Explicit 3-stage software pipeline in one straight-line body:
    emit order per step t =  o-dot(t-2) | softmax(t-1) | s-dot(t) — three
    mutually independent chunks, so MXU (dots) and VPU (softmax) work can
    overlap if the scheduler honors the dataflow."""
    kt = kt_ref[0]
    ve = ve_ref[0]
    bias = bias_ref[:]
    spans = _split_bounds(BQ, ways)
    n = len(spans)
    s = {}
    p = {}
    for t in range(n + 2):
        if 0 <= t - 2 < n:
            a, b = spans[t - 2]
            oe = jax.lax.dot_general(p[t - 2], ve, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[0, a:b] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)
        if 0 <= t - 1 < n:
            st = s[t - 1]
            m = jnp.max(st, axis=-1, keepdims=True)
            p[t - 1] = expfn(st - m).astype(ve.dtype)
        if t < n:
            a, b = spans[t]
            s[t] = jax.lax.dot_general(q_ref[0, a:b], kt, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32) + bias


def kern_normbound(q_ref, kt_ref, ve_ref, bias_ref, o_ref):
    """SAFE max elision: softmax is shift-invariant, so any per-row shift
    m_i >= max_j s_ij prevents exp overflow. Cauchy-Schwarz gives one for
    O((bq+Np) d) work instead of the O(bq Np) row-max pass:
        s_ij = q_i . k_j <= |q_i| * max_j |k_j|.
    Underflow to a 0/0 row needs bound slack > 87 nats (f32 exp range),
    i.e. |q_i| |k|max - max_j q_i.k_j > 87 — unreachable for LN'd
    activations (slack <= 2 |q||k| ~ 16 at ViT-S scales)."""
    q = q_ref[0]
    kt = kt_ref[0]
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    kmax = jnp.sqrt(jnp.max(jnp.sum(kt.astype(jnp.float32) ** 2, axis=0)))
    m = qn * kmax  # (bq, 1), >= row max of s by Cauchy-Schwarz
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias_ref[:]
    p = jnp.exp(s - m).astype(ve_ref.dtype)
    oe = jax.lax.dot_general(p, ve_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def kern_combo(q_ref, k_ref, v_ref, bias_ref, o_ref, ve_scr):
    """normbound + K consumed untransposed (dot_general contracting the
    minor dim of both operands — no HBM-level kt) + V||ones built in VMEM
    scratch (halves the V-side HBM reads vs the precomputed 2d-wide ve)."""
    q = q_ref[0]
    k = k_ref[0]  # (Np, d) raw
    ve_scr[:, :D] = v_ref[0]
    ve_scr[:, D:] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], D), 1) == 0, 1.0, 0.0
    ).astype(ve_scr.dtype)
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    kmax = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=1)))
    m = qn * kmax
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias_ref[:]
    p = jnp.exp(s - m).astype(ve_scr.dtype)
    oe = jax.lax.dot_general(p, ve_scr[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def run_combo():
    rng = np.random.default_rng(0)
    scale = D**-0.5
    q = jnp.asarray(rng.normal(0, 1, (B * H, BQ, D)) * scale, jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    bias = jnp.where(jnp.arange(NP) < N, 0.0, -1e30).astype(jnp.float32)[None, :]

    @jax.jit
    def run(qq):
        return pl.pallas_call(
            kern_combo,
            grid=(B * H, 1),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, BQ, D), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((NP, 2 * D), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qq, k, v, bias)

    def chain(qq):
        return run(qq)

    return run, (q,)


DM = H * D  # 384
QKV_COLS = 3 * DM  # 1152


def kern_qkvflat(qkv_ref, bias_ref, o_ref, ve_scr, *, heads):
    """qkv-direct with LEGAL blocks: the (B, Np, 3hd) projection tensor is
    consumed as a 3-D array (lane blocks of 3hd=1152 = 9*128); q/k/v per
    head are 64-lane in-register slices. No HBM layout ops at all: one read
    of the projection rows, output written in (Np, hd) ready for the out
    proj. q section arrives pre-scaled (scale folded into wqkv's q columns
    at trace time in production)."""
    rows = qkv_ref.shape[1]
    bias = bias_ref[:]
    ones_pat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (rows, D), 1) == 0, 1.0, 0.0
    ).astype(ve_scr.dtype)
    for hh in range(heads):
        q = qkv_ref[0, :, hh * D : (hh + 1) * D]
        k = qkv_ref[0, :, DM + hh * D : DM + (hh + 1) * D]
        v = qkv_ref[0, :, 2 * DM + hh * D : 2 * DM + (hh + 1) * D]
        ve_scr[:, :D] = v
        ve_scr[:, D:] = ones_pat
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
        kmax = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=1)))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + bias
        p = jnp.exp(s - qn * kmax).astype(ve_scr.dtype)
        oe = jax.lax.dot_general(p, ve_scr[:, :], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)
        # write o into all three qkv sections so the probe can chain
        # output -> input without an HBM-level pad (the 2 extra section
        # writes cost ~0.25 ms total across the grid; production writes
        # one (Np, hd) output)
        o_ref[0, :, hh * D : (hh + 1) * D] = o
        o_ref[0, :, DM + hh * D : DM + (hh + 1) * D] = o
        o_ref[0, :, 2 * DM + hh * D : 2 * DM + (hh + 1) * D] = o


def run_qkvflat():
    rng = np.random.default_rng(0)
    scale = D**-0.5
    qkv = rng.normal(0, 1, (B, NP, QKV_COLS))
    qkv[:, :, :DM] *= scale
    qkv = jnp.asarray(qkv, jnp.bfloat16)
    bias = jnp.where(jnp.arange(NP) < N, 0.0, -1e30).astype(jnp.float32)[None, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(kern_qkvflat, heads=H),
            grid=(B, 1),
            in_specs=[
                pl.BlockSpec((1, NP, QKV_COLS), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NP, QKV_COLS), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NP, QKV_COLS), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((NP, 2 * D), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, bias)

    return run, (qkv,)


def kern_qkvflat_pipe(qkv_ref, bias_ref, o_ref, *, heads, expfn=jnp.exp,
                      sm_bf16=False):
    """qkvflat with an explicit one-ahead software pipeline over heads:
    head h+1's s-dot (MXU) is emitted BEFORE head h's exp pass (VPU), so
    the scheduler has an always-ready independent MXU chain to overlap the
    softmax with. Dataflow is otherwise identical to the production SSA
    kernel (r4 probe: does explicit emission order buy back the ~10% gap
    between the measured 88.7 TF/s and the ~98 TF/s d=64 shape ceiling, or
    is Mosaic already overlapping across the unrolled heads?). Two score
    matrices live at once: +22.5 MB VMEM at N=2305 — still inside the
    limit.

    expfn=jnp.exp2 assumes the q section was pre-scaled by LOG2E·d^-1/2
    (trace-time weight fold in production), removing the ln→log2 VPU
    multiply from every score element. sm_bf16=True runs the subtract+exp
    VPU passes on bf16 scores (half the VPU bytes; the denominator still
    accumulates f32 on the MXU) — a numerics-for-speed probe: the bf16
    rounding of s−m perturbs p by ≤2^-8 relative, which the denominator
    normalization mostly cancels; mask-level Dice gating decides
    shippability, not this probe."""
    rows = qkv_ref.shape[1]
    bias = bias_ref[:]
    dtype = qkv_ref.dtype
    ones_pat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (rows, D), 1) == 0, 1.0, 0.0
    ).astype(dtype)

    def load(hh):
        q = qkv_ref[0, :, hh * D : (hh + 1) * D]
        k = qkv_ref[0, :, DM + hh * D : DM + (hh + 1) * D]
        v = qkv_ref[0, :, 2 * DM + hh * D : 2 * DM + (hh + 1) * D]
        return q, k, v

    def score(q, k):
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
        kmax = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=1)))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + bias
        return s, qn * kmax

    _, _, v = load(0)
    s, m = score(*load(0)[:2])
    for hh in range(heads):
        if hh + 1 < heads:
            qn_, kn_, vn_ = load(hh + 1)
            s_next, m_next = score(qn_, kn_)  # MXU work ahead of the exp
        if sm_bf16:
            p = expfn((s - m).astype(jnp.bfloat16)).astype(dtype)
        else:
            p = expfn(s - m).astype(dtype)
        ve = jnp.concatenate([v, ones_pat], axis=1)  # SSA, never a scratch
        oe = jax.lax.dot_general(p, ve, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)
        # 3-section write so the probe chains output -> input (see
        # kern_qkvflat)
        o_ref[0, :, hh * D : (hh + 1) * D] = o
        o_ref[0, :, DM + hh * D : DM + (hh + 1) * D] = o
        o_ref[0, :, 2 * DM + hh * D : 2 * DM + (hh + 1) * D] = o
        if hh + 1 < heads:
            s, m, v = s_next, m_next, vn_


def run_qkvflat_pipe(expfn=jnp.exp, sm_bf16=False):
    rng = np.random.default_rng(0)
    scale = D**-0.5 * (LOG2E if expfn is jnp.exp2 else 1.0)
    qkv = rng.normal(0, 1, (B, NP, QKV_COLS))
    qkv[:, :, :DM] *= scale
    qkv = jnp.asarray(qkv, jnp.bfloat16)
    bias = jnp.where(jnp.arange(NP) < N, 0.0, -1e30).astype(jnp.float32)[None, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(kern_qkvflat_pipe, heads=H, expfn=expfn,
                              sm_bf16=sm_bf16),
            grid=(B, 1),
            in_specs=[
                pl.BlockSpec((1, NP, QKV_COLS), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NP, QKV_COLS), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NP, QKV_COLS), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(x, bias)

    return run, (qkv,)


def kern_bf16sm(q_ref, kt_ref, ve_ref, bias_ref, o_ref):
    """Softmax VPU passes on bf16 s (half the bytes through the VPU; max and
    exp tolerate bf16 — the denominator still accumulates in f32 on the MXU)."""
    q = q_ref[0]
    s32 = jax.lax.dot_general(q, kt_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + bias_ref[:]
    s = s32.astype(jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    oe = jax.lax.dot_general(p, ve_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (oe[:, :D] / oe[:, D : D + 1]).astype(o_ref.dtype)


def main():
    which = sys.argv[1]
    use_exp2 = which in ("exp2", "split2", "split4", "stagger2", "stagger4",
                         "stagger8", "bf16sm")
    expfn = jnp.exp2 if use_exp2 else jnp.exp
    if which in ("combo", "qkvflat", "qkvflat_pipe", "qkvflat_pipe2",
                 "qkvflat_pipe2b"):
        run, args = {
            "combo": run_combo, "qkvflat": run_qkvflat,
            "qkvflat_pipe": run_qkvflat_pipe,
            # pipe + exp2 (LOG2E folded into the q pre-scale)
            "qkvflat_pipe2": functools.partial(run_qkvflat_pipe,
                                               expfn=jnp.exp2),
            # pipe + exp2 + bf16 softmax passes
            "qkvflat_pipe2b": functools.partial(run_qkvflat_pipe,
                                                expfn=jnp.exp2,
                                                sm_bf16=True),
        }[which]()
        q = args[0]
        time_variant(which, run, q)
        return
    if which == "normbound":
        run, n_rows = pallas_run(kern_normbound)
    elif which == "v0":
        run, n_rows = pallas_run(functools.partial(kern_base, expfn=jnp.exp))
    elif which == "exp2":
        run, n_rows = pallas_run(functools.partial(kern_base, expfn=jnp.exp2))
    elif which == "nomax":
        run, n_rows = pallas_run(kern_nomax)
    elif which == "split2":
        run, n_rows = pallas_run(functools.partial(kern_split, ways=2, expfn=expfn))
    elif which == "split4":
        run, n_rows = pallas_run(functools.partial(kern_split, ways=4, expfn=expfn))
    elif which == "grid2":
        run, n_rows = pallas_run(functools.partial(kern_base, expfn=jnp.exp), nq_blocks=2)
    elif which.startswith("stagger"):
        run, n_rows = pallas_run(
            functools.partial(kern_stagger, ways=int(which[len("stagger"):]), expfn=jnp.exp2))
    elif which == "bf16sm":
        run, n_rows = pallas_run(kern_bf16sm)
    else:
        raise SystemExit(which)

    q, kt, ve, bias = make_inputs(use_exp2, q_rows=n_rows)

    def chain(qq):
        return run(qq, kt, ve, bias)

    time_variant(which, chain, q)


def time_variant(which, chain, q):
    for _ in range(2):
        o = chain(q)
        float(jnp.sum(jnp.ravel(o)[:8].astype(jnp.float32)))
    ns = [1, 2, 4, 8, 16, 32]
    times = []
    for n in ns:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            x = q
            for _ in range(n):
                x = chain(x)
            float(jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    slope, intercept = np.polyfit(np.asarray(ns, float), np.asarray(times), 1)
    fl = 4 * B * H * N * N * D
    print(json.dumps({
        "variant": which,
        "slope_ms": round(slope * 1e3, 3),
        "intercept_ms": round(intercept * 1e3, 2),
        "useful_tflops": round(fl / slope / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
