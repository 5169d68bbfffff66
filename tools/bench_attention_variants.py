"""Microbench: flash-attention kernel variants at the mosaic hot shape.

Times the Pallas attention kernel on (B=49 tiles, h=6, N=2305, d=64) bf16 —
the shape that dominates the 1152^2 mosaic (11 interior ViT-S/8 blocks).
Variants isolate where the time goes (MXU dots vs VPU softmax) to guide the
round-2 optimization (VERDICT.md item 2).

Timing per CLAUDE.md: chain dispatches, sync on a scalar.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 49, 6, 2305, 64
FLOPS_DOTS = 4 * B * H * N * N * D  # 2 dots, 2 flop/MAC


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_variant(mode: str, block_q: int = 512):
    """mode: full | noexp (relu instead of exp) | bf16exp | dotsonly."""

    def kern(q_ref, kt_ref, v_ref, o_ref, *, n_valid, scale):
        q = q_ref[0]
        kt = kt_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if s.shape[-1] > n_valid:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        if mode == "full":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
        elif mode == "bf16exp":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
            denom = jnp.sum(p, axis=-1, keepdims=True)
        elif mode == "noexp":
            p = jnp.maximum(s, 0.0)
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1.0
        elif mode == "dotsonly":
            p = s
            denom = 1.0
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = (o / denom).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
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
        ktf = jnp.swapaxes(fold(k, np_), 1, 2)
        vf = fold(v, np_)
        out = pl.pallas_call(
            functools.partial(kern, n_valid=n, scale=scale),
            grid=(b * h, nq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, np_), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, np_q, d), q.dtype),
        )(qf, ktf, vf)
        return out[:, :n, :].reshape(b, h, n, d)

    return run


def timeit(fn, q, k, v, iters=8):
    # warm (compile); scalar sync — block_until_ready can return early for
    # large Pallas outputs over the device tunnel (CLAUDE.md), which would
    # leak the warmup's tail into the timed loop
    o = fn(q, k, v)
    _ = float(jnp.sum(o[0, 0, 0, :8]).astype(jnp.float32))
    # chained: feed output back as q so the chip can't overlap mosaic-free
    t0 = time.perf_counter()
    x = q
    for _ in range(iters):
        x = fn(x, k, v)
    _ = float(jnp.sum(x[0, 0, 0, :8]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)

    for mode in ("full", "dotsonly", "noexp", "bf16exp"):
        for bq in (256, 512, 1024):
            fn = make_variant(mode, bq)
            dt = timeit(fn, q, k, v)
            tf = FLOPS_DOTS / dt / 1e12
            print(f"{mode:9s} bq={bq:5d}  {dt*1e3:7.2f} ms  {tf:6.1f} TF/s(dots)", flush=True)


if __name__ == "__main__":
    main()
