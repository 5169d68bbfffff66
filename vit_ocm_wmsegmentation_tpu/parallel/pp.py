"""GPipe-style pipeline parallelism over the ViT block stack.

The reference scales one way only (nn.DataParallel over batch,
Self-supervised_segmentation/mim.py:104); this framework already exceeds
that with GSPMD dp + Megatron tp (parallel/mesh.py). Pipeline parallelism
is the third TPU-native axis: each device holds a contiguous STAGE of
transformer blocks, activations flow stage-to-stage over ICI via
`lax.ppermute`, and microbatching keeps every stage busy outside the
fill/drain bubble. It exists for encoders whose parameters or activations
outgrow one chip's HBM (depth >> ViT-S) — for the reference's ViT-S/8 it
is a capability demonstration, correctness-gated on the virtual CPU mesh
(tests/test_parallel.py), not the default route.

Design (the scaling-book pipelining recipe, jax-native):

* mesh ('data', 'pipe'): batch shards over 'data' exactly as in dp; the
  stacked block pytree (depth leading axis) is reshaped to
  (stages, depth/stages, ...) and sharded over 'pipe', so each device
  stores only its stage's weights.
* the block stack runs as ONE `jax.shard_map` island between
  simmim.embed_tokens and simmim.tokens_to_grid (both stay plain GSPMD
  dp). Inside, a `lax.scan` over T = microbatches + stages - 1 ticks
  implements the GPipe fill-drain schedule: stage 0 injects microbatch t,
  every stage runs its local blocks, `ppermute` hands the activation to
  stage s+1 (destinations without a source receive zeros — exactly the
  bubble), and the last stage records finished microbatches into an
  output buffer (a clamped dynamic_update_slice: bubble-tick garbage
  lands on slot 0/M-1 and is always overwritten by that slot's single
  valid tick, so no lax.cond is needed).
* reverse-mode AD flows through scan + ppermute + the final psum
  broadcast (ppermute transposes to the inverse permutation), so
  gradients equal the single-device step to numerical noise — asserted
  against make_train_step on the 8-virtual-device mesh.

Constraints: cfg.depth % stages == 0, batch % microbatches == 0, and the
per-microbatch batch % mesh 'data' size == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import simmim
from ..models import vit as vit_mod


def make_pp_mesh(data: int = 1, pipe: int = -1, devices=None) -> Mesh:
    """('data', 'pipe') mesh; pipe=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if pipe == -1:
        if n % data:
            raise ValueError(f"data={data} does not divide {n} devices")
        pipe = n // data
    if data * pipe > n:
        raise ValueError(f"mesh {data}x{pipe} needs more than {n} devices")
    return Mesh(devices[: data * pipe].reshape(data, pipe), ("data", "pipe"))


def pp_params(params, stages: int):
    """Reshape the stacked block pytree (depth, ...) -> (stages, depth/stages, ...).

    Non-block leaves pass through (they are replicated; only the embed /
    head sections use them, which run outside the pipeline island)."""
    depth = jax.tree.leaves(params["blocks"])[0].shape[0]
    if depth % stages:
        raise ValueError(f"depth {depth} not divisible by pp stages {stages}")
    out = dict(params)
    out["blocks"] = jax.tree.map(
        lambda a: a.reshape((stages, depth // stages) + a.shape[1:]),
        params["blocks"])
    return out


def unpp_params(params_pp):
    """Inverse of pp_params (for checkpoints/export: the on-disk layout is
    always the plain stacked-depth pytree)."""
    out = dict(params_pp)
    out["blocks"] = jax.tree.map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]),
        params_pp["blocks"])
    return out


def pp_param_sharding(mesh: Mesh, params_pp):
    """blocks shard their stage axis over 'pipe'; everything else is
    replicated (embed/head params are consumed outside the island)."""
    blocks = jax.tree.map(lambda _: NamedSharding(mesh, P("pipe")),
                          params_pp["blocks"])
    out = {k: jax.tree.map(lambda _: NamedSharding(mesh, P()), v)
           for k, v in params_pp.items() if k != "blocks"}
    out["blocks"] = blocks
    return out


def pp_run_blocks(blocks_pp, cfg, tok, mesh: Mesh, microbatches: int,
                  remat: bool = False):
    """Run the block stack as a GPipe pipeline: tok (B, Np, D) -> (B, Np, D).

    blocks_pp: the (stages, depth/stages, ...) block pytree. Differentiable;
    call inside jit with the mesh's shardings on tok/blocks. remat
    rematerializes each stage's tick in the backward (TRAIN.USE_CHECKPOINT
    semantics, per stage per microbatch instead of per block).
    """
    stages = dict(mesh.shape)["pipe"]
    m = microbatches
    b, np_, d = tok.shape
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    data = dict(mesh.shape).get("data", 1)
    if (b // m) % data:
        raise ValueError(
            f"per-microbatch batch {b // m} not divisible by the mesh's "
            f"data axis {data} (batch {b}, microbatches {m})")
    embeds = tok.reshape(m, b // m, np_, d)
    t_total = m + stages - 1

    def island(blocks_local, emb_local):
        # (1, depth/stages, ...) -> (depth/stages, ...)
        blocks_local = jax.tree.map(lambda a: a[0], blocks_local)
        s = jax.lax.axis_index("pipe")

        def run_local(xa):
            def body(carry, bp):
                # prefer_folded matches _scan_blocks' training route: the
                # flat qkvflat kernel is chip-measured SLOWER for training
                # (models/vit._scan_blocks docstring), and the folded route
                # is what the pp parity tests pin against
                return vit_mod._block_forward(bp, cfg, carry, impl="auto",
                                              prefer_folded=True,
                                              train=True), None
            y, _ = jax.lax.scan(body, xa, blocks_local)
            return y

        if remat:
            run_local = jax.checkpoint(run_local)

        def tick(carry, t):
            recv, out = carry
            x_in = jnp.where(s == 0, emb_local[jnp.clip(t, 0, m - 1)], recv)
            y = run_local(x_in)
            out = jax.lax.dynamic_update_slice(
                out, y[None], (jnp.clip(t - (stages - 1), 0, m - 1), 0, 0, 0))
            recv_next = jax.lax.ppermute(
                y, "pipe", [(i, i + 1) for i in range(stages - 1)])
            return (recv_next, out), None

        out0 = jnp.zeros((m,) + emb_local.shape[1:], emb_local.dtype)
        (_, out), _ = jax.lax.scan(
            tick, (jnp.zeros_like(emb_local[0]), out0), jnp.arange(t_total))
        # only the last stage's buffer holds the finished microbatches;
        # broadcast it across 'pipe' (psum of a one-hot selection)
        return jax.lax.psum(jnp.where(s == stages - 1, out, 0), "pipe")

    out = jax.shard_map(
        island, mesh=mesh,
        in_specs=(P("pipe"), P(None, "data")),
        out_specs=P(None, "data"),
        check_vma=False,
    )(blocks_pp, embeds)
    return out.reshape(b, np_, d)


def pp_mim_loss(params_pp, cfg, x, mask, mesh: Mesh, microbatches: int,
                remat: bool = False):
    """simmim.mim_loss with the block stack pipelined over 'pipe'."""
    _, h, w, _ = x.shape
    tok = simmim.embed_tokens(params_pp, cfg, x, mask)
    tok = pp_run_blocks(params_pp["blocks"], cfg, tok, mesh, microbatches,
                        remat=remat)
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    z = simmim.tokens_to_grid(params_pp, cfg, tok, gh, gw)
    x_rec = simmim.decode_grid(params_pp, cfg, z)
    loss, _ = simmim.masked_l1(x, x_rec, mask, cfg.patch_size)
    return loss


def make_pp_train_step(vit_cfg, tx, mesh: Mesh, microbatches: int, *,
                       remat: bool = False, amp: bool = False):
    """Pipeline-parallel twin of train.mim_trainer.make_train_step:
    (params_pp, opt_state, x, mask) -> (params_pp, opt_state, loss, gnorm).

    params_pp comes from pp_params(...); checkpoints should store
    unpp_params(params_pp) so on-disk layout stays stage-count-agnostic.
    """

    # the AMP rule and step body are mim_trainer's (one definition for both
    # builders); kernel mesh stays None — the island manages its own
    # sharding, GSPMD must not additionally dp-wrap the kernels
    from ..train.mim_trainer import amp_cast, step_body

    def loss_fn(params, x, mask):
        if amp:
            params, x = amp_cast(params), x.astype(jnp.bfloat16)
        return pp_mim_loss(params, vit_cfg, x, mask, mesh, microbatches,
                           remat=remat)

    step = step_body(loss_fn, tx, mesh=None)

    from .mesh import batch_sharding

    batch_sh = batch_sharding(mesh)
    cache = {}  # build the jit wrapper once (param shardings need a params
    # pytree to pattern on; rebuilding the wrapper per call would retrace)

    def jitted(params, opt_state, x, mask):
        if "fn" not in cache:
            psh = pp_param_sharding(mesh, params)
            cache["fn"] = jax.jit(
                step,
                donate_argnums=(0, 1),
                in_shardings=(psh, None, batch_sh, batch_sh),
                out_shardings=(psh, None, None, None),
            )
        return cache["fn"](params, opt_state, x, mask)

    return jitted
