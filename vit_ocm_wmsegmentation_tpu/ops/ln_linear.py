"""Pallas TPU fused LayerNorm -> Linear (forward AND backward).

Companion to ops/fused_mlp.py for the OTHER LayerNorm in each ViT block:
the pre-attention norm feeding the fused qkv projection,

    y = LN(x; scale, bias) @ W + b          (W: (D, K), e.g. K = 3D)

Stock autodiff saves LN(x) for dW's backward and runs the LN backward
(two row reductions + rescale over (R, D)) as a standalone VPU fusion.
Here only x is the residual: the backward program recomputes the row
statistics and emits the LN backward between its three dots (dxn, dW, db)
so the reductions can hide under the MXU, and xn never round-trips HBM.

Same accumulation pattern and padding semantics as ops/fused_mlp.py.
Reference site: dino/vision_transformer.py:99-101 (norm1 -> Attention.qkv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import DEFAULT_BLOCK_R, _pad_rows, _round_up


def _ln_linear_fwd_kernel(x_ref, s_ref, bb_ref, w_ref, b_ref, o_ref,
                          *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xh = xc * jax.lax.rsqrt(var + eps)
    xn = (xh * s_ref[...] + bb_ref[...]).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        xn, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_linear_bwd_kernel(x_ref, dy_ref, s_ref, bb_ref, w_ref,
                          dx_ref, ds_ref, dbb_ref, dw_ref, db_ref,
                          *, eps: float):
    i = pl.program_id(0)
    x32 = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...]

    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xh = xc * r
    xn = (xh * s_ref[...] + bb_ref[...]).astype(x_ref.dtype)

    dxn = jax.lax.dot_general(dy, w_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxh = dxn * s_ref[...]
    mu1 = jnp.mean(dxh, axis=-1, keepdims=True)
    mu2 = jnp.mean(dxh * xh, axis=-1, keepdims=True)
    dx_ref[...] = (r * (dxh - mu1 - xh * mu2)).astype(dx_ref.dtype)

    dw_blk = jax.lax.dot_general(xn, dy, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    db_blk = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    ds_blk = jnp.sum(dxn * xh, axis=0, keepdims=True)
    dbb_blk = jnp.sum(dxn, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = dw_blk
        db_ref[...] = db_blk
        ds_ref[...] = ds_blk
        dbb_ref[...] = dbb_blk

    @pl.when(i != 0)
    def _():
        dw_ref[...] += dw_blk
        db_ref[...] += db_blk
        ds_ref[...] += ds_blk
        dbb_ref[...] += dbb_blk


def _fwd_impl(x, scale, bias, w, b, eps, block_r, interpret):
    rows, d = x.shape
    k = w.shape[1]
    br = min(block_r, _round_up(rows, 16))
    rp = _round_up(rows, br)
    xp = _pad_rows(x, rp)
    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)

    blk_x = pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk_y = pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_ln_linear_fwd_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[blk_x, rep((1, d)), rep((1, d)),
                  pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  rep((1, k))],
        out_specs=blk_y,
        out_shape=jax.ShapeDtypeStruct((rp, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * k,
            bytes_accessed=(rp * d + rp * k + d * k) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, row2(scale), row2(bias), w, row2(b))
    return out[:rows]


def _bwd_impl(x, dy, scale, bias, w, eps, block_r, interpret):
    rows, d = x.shape
    k = w.shape[1]
    br = min(block_r, _round_up(rows, 16))
    rp = _round_up(rows, br)
    xp = _pad_rows(x, rp)
    dyp = _pad_rows(dy, rp)
    row2 = lambda a: a.reshape(1, -1).astype(jnp.float32)

    blk_x = pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk_y = pl.BlockSpec((br, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    dx, ds, dbb, dw, db = pl.pallas_call(
        functools.partial(_ln_linear_bwd_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[blk_x, blk_y, rep((1, d)), rep((1, d)),
                  pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            blk_x, rep((1, d)), rep((1, d)),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            rep((1, k)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * rows * d * k,
            bytes_accessed=(2 * rp * d + rp * k + 2 * d * k) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, dyp, row2(scale), row2(bias), w)
    return dx[:rows], ds, dbb, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_linear(x, scale, bias, w, b, eps: float = 1e-6,
              block_r: int = DEFAULT_BLOCK_R, interpret: bool = False):
    """LN(x; scale, bias) @ w + b, fused on TPU with a Pallas backward.

    x: (R, D); w: (D, K). Saves only x; LN statistics are recomputed in
    the backward program between its dots.
    """
    return _fwd_impl(x, scale, bias, w, b, eps, block_r, interpret)


def _ln_linear_fwd(x, scale, bias, w, b, eps, block_r, interpret):
    return _fwd_impl(x, scale, bias, w, b, eps, block_r, interpret), (
        x, scale, bias, w)


def _ln_linear_bwd(eps, block_r, interpret, res, dy):
    x, scale, bias, w = res
    dx, ds, dbb, dw, db = _bwd_impl(x, dy, scale, bias, w, eps, block_r,
                                    interpret)
    cast = lambda g, ref: g.astype(ref.dtype)
    return (dx, cast(ds[0], scale), cast(dbb[0], bias), cast(dw, w),
            cast(db[0], w))


ln_linear.defvjp(_ln_linear_fwd, _ln_linear_bwd)
