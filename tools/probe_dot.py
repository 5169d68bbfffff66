"""Single-variant dot-shape probe (one process per variant: the tunnel
pollutes timings after mid-script fresh compiles).

Usage: python tools/probe_dot.py {mm_bf16|mm_int8|attn_int8|attn_bf16}
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 49, 6, 2305, 64
NP = 2432


def chain_time(fn, first, *rest, iters=8):
    # warmup MUST sync on a scalar: block_until_ready on large pallas
    # outputs returns early over the device tunnel (CLAUDE.md)
    for _ in range(2):
        o = fn(first, *rest)
        _ = float(jnp.sum(jnp.ravel(o)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    x = first
    for _ in range(iters):
        x = fn(x, *rest)
    _ = float(jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def matmul(dtype, M=2048, K=2048, Nn=2048, bm=512, bn=512):
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc).astype(o_ref.dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(M // bm, Nn // bn),
            in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, Nn), dtype),
        )(a, b)

    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-3, 3, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-3, 3, (K, Nn)), jnp.int8)
    else:
        a = jnp.asarray(rng.normal(0, 0.1, (M, K)), dtype)
        b = jnp.asarray(rng.normal(0, 0.1, (K, Nn)), dtype)
    dt = chain_time(run, a, b)
    print(f"{dt*1e3:8.2f} ms  {2*M*K*Nn/dt/1e12:6.1f} TF/s")


def attn(dtype):
    """Both attention dots at the mosaic shape in the given dtype (scores
    dequantized, softmax f32, p requantized): the timing shape for an int8
    attention path."""
    bq = 1216
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kern(q_ref, kt_ref, v_ref, bias_ref, o_ref):
        s = jax.lax.dot_general(q_ref[0], kt_ref[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=acc).astype(jnp.float32)
        s = s * (1.0 / 16.0) + bias_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        if dtype == jnp.int8:
            pq = (p * 127.0).astype(jnp.int8)  # p in [0,1]
        else:
            pq = p.astype(dtype)
        oe = jax.lax.dot_general(pq, v_ref[0], (((1,), (0,)), ((), ())),
                                 preferred_element_type=acc).astype(jnp.float32)
        o_ref[0] = oe[:, :D].astype(jnp.bfloat16)

    @jax.jit
    def run(q, kt, v, bias):
        return pl.pallas_call(
            kern,
            grid=(B * H, NP // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, NP), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP, 2 * D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, NP, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q, kt, v, bias)

    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        q = jnp.asarray(rng.integers(-100, 100, (B * H, NP, D)), jnp.int8)
        kt = jnp.asarray(rng.integers(-100, 100, (B * H, D, NP)), jnp.int8)
        v = jnp.asarray(rng.integers(-100, 100, (B * H, NP, 2 * D)), jnp.int8)
    else:
        q = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), dtype)
        kt = jnp.asarray(rng.normal(0, 1, (B * H, D, NP)), dtype)
        v = jnp.asarray(rng.normal(0, 1, (B * H, NP, 2 * D)), dtype)
    bias = jnp.zeros((1, NP), jnp.float32)

    for _ in range(2):
        o = run(q, kt, v, bias)
        _ = float(jnp.sum(jnp.ravel(o)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(8):
        o = run(q, kt, v, bias)
    _ = float(jnp.sum(jnp.ravel(o)[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 8
    # USEFUL attention FLOPs (standard 2 dots x 2*N^2*D), matching
    # bench_attention_variants.py and BENCH.md's roofline rows. The pv dot
    # here executes against the ones-column-extended 2D-wide V (the
    # production denominator trick) — at D=64 the 128-wide output costs the
    # same MXU cycles as 64-wide, so executed!=useful is exactly the
    # half-utilization the roofline narrative accounts for.
    fl = 4 * B * H * N * N * D
    print(f"{dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s(dots, useful)")


if __name__ == "__main__":
    which = sys.argv[1]
    if which == "mm_bf16":
        matmul(jnp.bfloat16)
    elif which == "mm_int8":
        matmul(jnp.int8)
    elif which == "attn_bf16":
        attn(jnp.bfloat16)
    elif which == "attn_int8":
        attn(jnp.int8)
