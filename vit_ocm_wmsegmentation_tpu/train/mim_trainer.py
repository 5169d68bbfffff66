"""MIM pretraining loop (rebuild of mim.py:83-222), data-parallel over a mesh.

Differences from the reference, by design:

* one jitted train step (fwd + bwd + clip + AdamW update) with donated
  buffers — no Python-side optimizer stepping;
* batches shard over the mesh 'data' axis; gradients reduce via GSPMD
  (the DataParallel scatter/gather disappears);
* loss convention: the global masked mean. The reference sums the per-GPU
  means of nn.DataParallel (mim.py:163,174), which rescales gradients by the
  device count; the single-device semantics is the global mean, which we
  keep on any mesh size (documented delta, SURVEY.md §7);
* checkpointing via orbax every SAVE_FREQ epochs; early stopping on stalled
  loss mirrors mim.py:116-135.
"""

from __future__ import annotations

import datetime
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import simmim
from ..ops.metrics import AverageMeter
from . import checkpoint as ckpt
from .optim import build_optimizer
from .schedule import build_schedule


def amp_cast(tree):
    """bf16 compute cast for the AMP step (f32 leaves only; the cast's VJP
    upcasts cotangents back to f32 master precision). Shared by the plain
    and pipeline-parallel steps so the AMP rule exists once."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def step_body(loss_fn, tx, mesh=None):
    """The one train-step body both step builders compile:
    value_and_grad -> global_norm -> tx.update -> apply_updates, with the
    Pallas kernel dispatch pointed at `mesh` at trace time (a pure-dp mesh
    shard_maps the kernels; None is a no-op — the pp island manages its own
    sharding and passes None)."""

    def step(params, opt_state, x, mask):
        from ..parallel.mesh import kernel_mesh_scope

        with kernel_mesh_scope(mesh):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, mask)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    return step


def make_train_step(vit_cfg, tx, *, mesh=None, param_sharding=None, batch_sharding_=None,
                    opt_sharding=None, remat=False, amp=False):
    """Compiled MIM step: (params, opt_state, x, mask) ->
    (params, opt_state, loss, grad_norm).

    amp=True is the TPU mixed-precision rebuild of the reference's
    AMP_OPT_LEVEL knob (config.py:177, apex O1 on CUDA): forward/backward run
    in bf16 (MXU-native), while master params, grads (the cast's VJP
    upcasts the cotangent), grad-clip and AdamW state stay float32. bf16 has
    fp32's exponent range, so no loss scaling is needed — the loss reduction
    itself accumulates in f32 (models/simmim.py).

    opt_sharding: explicit NamedSharding pytree for the optimizer state
    (None = let the compiler choose, the replicated-dp behavior). The FSDP
    mode passes the sharded-moment layout here so the donated opt_state
    stays ZeRO-sharded across steps instead of silently replicating.
    """

    def loss_fn(params, x, mask):
        if amp:
            params, x = amp_cast(params), x.astype(jnp.bfloat16)
        loss, _, _ = simmim.mim_loss(params, vit_cfg, x, mask, remat=remat, train=True)
        return loss

    step = step_body(loss_fn, tx, mesh)

    if mesh is not None and param_sharding is not None:
        return jax.jit(
            step,
            donate_argnums=(0, 1),
            in_shardings=(param_sharding, opt_sharding, batch_sharding_, batch_sharding_),
            out_shardings=(param_sharding, opt_sharding, None, None),
        )
    return jax.jit(step, donate_argnums=(0, 1))


def train_mim(cfg, loader, eval_fn=None, *, mesh=None, logger=None, use_wandb=False,
              wandb=None):
    """Full pretraining driver. Returns (params, history).

    cfg: utils.config tree; loader: data.Loader; eval_fn(params, vit_cfg,
    epoch) optionally runs validation each epoch (mim.py:221). Pass the
    caller's wandb client/shim so one run logs to one place; when omitted
    a file-backed shim rooted at cfg.OUTPUT is resolved here.
    """
    from ..utils.logger import create_logger
    from ..utils.wandb_shim import get_wandb

    logger = logger or create_logger(cfg.OUTPUT, name=f"{cfg.MODEL.NAME}_{cfg.MODEL.PATCH_SIZE}")
    if wandb is None:
        wandb, use_wandb = get_wandb(use_wandb or cfg.WANDB, output_dir=cfg.OUTPUT)

    from ..models import vit as vit_mod

    eff = vit_mod.set_train_kernel_modes(
        cfg.TRAIN.get("MLP_REMAT", "auto"), cfg.TRAIN.get("LN_QKV", "auto"),
        cfg.TRAIN.get("ATTN_SAVE_P", "auto"))
    logger.info(f"train kernel routes: MLP_REMAT={eff[0]} LN_QKV={eff[1]} "
                f"ATTN_SAVE_P={eff[2]}")

    vit_cfg = simmim.mim_vit_config(cfg.DATA.IMG_SIZE, cfg.MODEL.PATCH_SIZE)
    params = simmim.init(vit_cfg, jax.random.PRNGKey(cfg.SEED))
    if cfg.PRETRAINED_WEIGHTS:
        try:
            params = ckpt.load_mim_or_vit_checkpoint(
                cfg.PRETRAINED_WEIGHTS, vit_cfg, params, cfg.MODEL.CHECKPOINT_KEY)
        except Exception as e:  # mirror the reference's lenient load
            logger.info(f"could not load pretrained weights: {e}; training from scratch")

    n_iter = len(loader)
    schedule = build_schedule(cfg, max(n_iter, 1))
    tx = build_optimizer(cfg, params, schedule)
    opt_state = tx.init(params)

    pp_stages = int(cfg.TRAIN.get("PP_STAGES", 1))
    start_epoch = cfg.TRAIN.START_EPOCH
    # the reference declares TRAIN.AUTO_RESUME but never reads it
    # (config.py:105); here it actually resumes params AND optimizer state
    # from the newest ckpt_epoch_* in OUTPUT (the reference's save payload
    # includes the optimizer too, utils.py:375-385). The payload layout
    # varies (pp checkpoints carry pp_stages + stage-shaped opt_state;
    # pre-r2 ones lack opt_state), so PEEK templateless first and pick the
    # exact template after.
    resume_path = ckpt.latest_checkpoint(cfg.OUTPUT) if cfg.TRAIN.AUTO_RESUME else None
    resume_raw = ckpt.restore_checkpoint_raw(resume_path) if resume_path else None

    if resume_raw is not None and pp_stages <= 1:
        start_epoch = int(resume_raw["epoch"]) + 1
        params = jax.tree.map(jnp.asarray, resume_raw["params"])
        if "opt_state" in resume_raw and "pp_stages" not in resume_raw:
            # params were already materialized by the raw peek above; only
            # the optimizer state (an optax NamedTuple the raw dict tree
            # can't represent) needs the templated read
            restored = ckpt.restore_checkpoint_partial(
                resume_path, {"params": ckpt.placeholder_like(params),
                              "opt_state": opt_state, "epoch": 0})
            # orbax restores leaves COMMITTED to device 0; a jitted step over
            # a >1-device mesh then raises "incompatible devices" (the plain
            # dp branch passes opt_sharding=None, so nothing re-places them).
            # Host arrays are placement-free and the step's in_shardings (or
            # the FSDP branch's explicit device_put) decide the layout.
            opt_state = jax.tree.map(np.asarray, restored["opt_state"])
            logger.info(f"auto-resumed from {resume_path} at epoch {start_epoch}")
        else:
            # a pp checkpoint resumed into a plain run (stage-shaped
            # optimizer state doesn't transfer) or a pre-opt_state save
            logger.info(f"auto-resumed params from {resume_path} at epoch "
                        f"{start_epoch} (optimizer state restarted)")

    pp_mod = None
    param_sh = batch_sh = None
    amp = cfg.AMP_OPT_LEVEL not in ("", "O0")
    remat = bool(cfg.TRAIN.USE_CHECKPOINT)
    if bool(cfg.TRAIN.get("FSDP", False)) and (pp_stages > 1 or mesh is None):
        # FSDP shards over the dp mesh 'data' axis; pp brings its own mesh
        # and stage-sharded state, and a single device has nothing to
        # shard over — say so instead of silently training replicated
        logger.warning(
            "TRAIN.FSDP=True ignored: "
            + ("pipeline parallelism (TRAIN.PP_STAGES>1) already shards "
               "state over 'pipe' and the two modes do not compose"
               if pp_stages > 1 else
               "no multi-device mesh (single device run)"))
    if pp_stages > 1:
        # GPipe pipeline parallelism (parallel/pp.py): the block stack
        # shards over a 'pipe' mesh axis, remaining devices do dp. Takes
        # precedence over a caller-passed dp/tp mesh. Checkpoints store
        # stage-agnostic params (unpp_params) plus the stage-shaped
        # optimizer state tagged with pp_stages: a same-stage resume keeps
        # the full optimizer/schedule state; a changed stage count (or a
        # plain checkpoint) resumes params only.
        from ..parallel import pp as pp_mod_
        from ..parallel.mesh import batch_sharding, shard_params

        pp_mod = pp_mod_
        n_dev = len(jax.devices())
        if n_dev % pp_stages:
            raise ValueError(
                f"TRAIN.PP_STAGES={pp_stages} does not divide {n_dev} devices")
        pp_micro = int(cfg.TRAIN.get("PP_MICROBATCHES", 0)) or pp_stages
        mesh = pp_mod.make_pp_mesh(data=n_dev // pp_stages, pipe=pp_stages)
        logger.info(f"pipeline parallelism: mesh={dict(mesh.shape)} "
                    f"microbatches={pp_micro}")
        plain_params = params  # fresh/pretrained plain-layout tree
        ppp = pp_mod.pp_params(plain_params, pp_stages)
        psh = pp_mod.pp_param_sharding(mesh, ppp)
        params = shard_params(ppp, psh)
        tx = build_optimizer(cfg, params, schedule)
        # init from the SHARDED params so the step's donated opt_state
        # keeps its sharding and iteration 2 hits the jit cache
        opt_state = tx.init(params)
        batch_sh = batch_sharding(mesh)
        if resume_raw is not None:
            start_epoch = int(resume_raw["epoch"]) + 1
            if int(resume_raw.get("pp_stages", 0)) == pp_stages:
                restored = ckpt.restore_checkpoint_partial(
                    resume_path, {"params": ckpt.placeholder_like(plain_params),
                                  "opt_state": opt_state,
                                  "pp_stages": 0, "epoch": 0})
                params = shard_params(pp_mod.pp_params(
                    jax.tree.map(jnp.asarray, resume_raw["params"]),
                    pp_stages), psh)
                # orbax returns arrays committed to device 0; re-place each
                # leaf onto the mesh (param-shaped leaves keep the template's
                # NamedSharding, scalars like the schedule count replicate)
                # so the jitted step sees consistent devices
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(mesh, P())
                opt_state = jax.tree.map(
                    lambda t, r: jax.device_put(
                        r, t.sharding if isinstance(t.sharding, NamedSharding)
                        else rep),
                    opt_state, restored["opt_state"])
                logger.info(f"auto-resumed (pp, optimizer state included) from "
                            f"{resume_path} at epoch {start_epoch}")
            else:
                params = shard_params(pp_mod.pp_params(
                    jax.tree.map(jnp.asarray, resume_raw["params"]), pp_stages), psh)
                logger.info(f"auto-resumed params from {resume_path} at epoch "
                            f"{start_epoch} (stage count or mode changed; "
                            f"optimizer state restarted)")
        step_fn = pp_mod.make_pp_train_step(vit_cfg, tx, mesh, pp_micro,
                                            remat=remat, amp=amp)
    else:
        opt_sh = None
        if mesh is not None:
            from ..parallel.mesh import (
                batch_sharding,
                data_parallel_sharding,
                fsdp_param_sharding,
                shard_params,
            )

            fsdp = bool(cfg.TRAIN.get("FSDP", False))
            min_shard = int(cfg.TRAIN.get("FSDP_MIN_SHARD", 4096))
            param_sh = (fsdp_param_sharding(mesh, params, min_shard=min_shard)
                        if fsdp else data_parallel_sharding(mesh, params))
            batch_sh = batch_sharding(mesh)
            params = shard_params(params, param_sh)
            if fsdp:
                # ZeRO: the Adam moments inherit the parameter shards
                # (fsdp_opt_sharding probes GSPMD's propagated layout);
                # re-place the live opt_state (fresh init or the resumed
                # one — values are layout-agnostic host data) onto it; the
                # step then pins this layout via in/out_shardings so the
                # donated state never silently replicates.
                from ..parallel.mesh import fsdp_opt_sharding

                opt_sh = fsdp_opt_sharding(mesh, tx, params,
                                           min_shard=min_shard)
                opt_state = jax.tree.map(
                    lambda r, s: jax.device_put(np.asarray(r), s),
                    opt_state, opt_sh)
                logger.info(
                    f"FSDP over mesh {dict(mesh.shape)}: params + optimizer "
                    f"moments sharded over 'data'")
        step_fn = make_train_step(vit_cfg, tx, mesh=mesh, param_sharding=param_sh, batch_sharding_=batch_sh,
                                  opt_sharding=opt_sh, remat=remat, amp=amp)

    # the panel forward / eval / checkpointing consume the plain stacked-
    # depth layout; in pp mode convert on the way out (a cheap reshape)
    to_plain = (lambda p: pp_mod.unpp_params(p)) if pp_mod else (lambda p: p)

    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"number of params: {n_params}")
    logger.info("Start training")
    # one jit wrapper for the W&B panel forward — constructing it inside the
    # epoch loop would retrace/recompile every epoch
    panel_fn = jax.jit(simmim.mim_loss, static_argnames=("cfg",))
    from ..data.prefetch import prefetch

    history = []
    min_loss = float("inf")
    consec = 0
    start_time = time.time()
    for epoch in range(start_epoch, cfg.TRAIN.EPOCHS):
        loss_meter, norm_meter, batch_time = AverageMeter(), AverageMeter(), AverageMeter()
        epoch_start = time.time()
        end = time.time()

        # loss/grad-norm stay on device between log points: a float() per
        # iteration is a host round-trip that serializes the dispatch
        # pipeline (60% overhead on a high-latency device link)
        pending = []

        def drain():
            if not pending:
                return
            for dl, dg, bsz in pending:
                loss_meter.update(float(dl), bsz)
                norm_meter.update(float(dg))
            batch_time.update((time.time() - end) / len(pending), len(pending))
            pending.clear()

        for idx, (img, mask) in enumerate(prefetch(loader.epoch(epoch), sharding=batch_sh)):
            params, opt_state, loss, gnorm = step_fn(params, opt_state, jnp.asarray(img), jnp.asarray(mask))
            pending.append((loss, gnorm, img.shape[0]))
            if idx % cfg.PRINT_FREQ == 0:
                drain()
                end = time.time()
                t = epoch * n_iter + idx
                lr = float(schedule(jnp.asarray(t)))
                etas = batch_time.avg * (n_iter - idx)
                logger.info(
                    f"Train: [{epoch}/{cfg.TRAIN.EPOCHS}][{idx}/{n_iter}]\t"
                    f"eta {datetime.timedelta(seconds=int(etas))} lr {lr:.6f}\t"
                    f"time {batch_time.val:.4f} ({batch_time.avg:.4f})\t"
                    f"loss {loss_meter.val:.4f} ({loss_meter.avg:.4f})\t"
                    f"grad_norm {norm_meter.val:.4f} ({norm_meter.avg:.4f})"
                )
                if use_wandb:
                    wandb.log({"epoch": epoch, "train_loss": loss_meter.val,
                               "train_loss_avg": loss_meter.avg, "lr": lr}, step=epoch)
        drain()
        logger.info(f"EPOCH {epoch} training takes {datetime.timedelta(seconds=int(time.time() - epoch_start))}")

        if use_wandb and loss_meter.count > 0:
            # the reference's per-epoch mask/reconstruction panel set
            # (mim.py:204-220): input, mask, masked input, reconstruction,
            # masked reconstruction, complete reconstruction — first sample,
            # channel 0. One extra forward on the epoch's last batch.
            x_last = jnp.asarray(img)
            m_last = jnp.asarray(mask)
            _, x_rec, pix_mask = panel_fn(to_plain(params), vit_cfg, x_last, m_last)
            inp = np.asarray(x_last[0, :, :, 0])
            pm = np.asarray(pix_mask[0, :, :, 0])
            rec = np.asarray(x_rec[0, :, :, 0], dtype=np.float32)
            masked_input = inp * (1 - pm)
            wandb.log({"Masks": [
                wandb.Image(inp, caption="Input"),
                wandb.Image(pm, caption="Mask"),
                wandb.Image(masked_input, caption="Masked Input"),
                wandb.Image(rec, caption="Reconstruction"),
                wandb.Image(rec * pm, caption="Masked Reconstruction"),
                wandb.Image(rec * pm + masked_input, caption="Complete Reconstruction"),
            ]}, step=epoch)

        if epoch % cfg.SAVE_FREQ == 0 or epoch == cfg.TRAIN.EPOCHS - 1:
            # reference payload: model/optimizer/lr_scheduler/max_accuracy/
            # epoch/config (utils.py:375-385); the schedule is a pure
            # function of the step here, so opt_state + epoch cover it.
            # pp mode: stage-agnostic params + the stage-shaped optimizer
            # state tagged with its stage count (resume logic above)
            payload = ({"params": to_plain(params), "opt_state": opt_state,
                        "pp_stages": pp_stages, "epoch": epoch} if pp_mod
                       else {"params": params, "opt_state": opt_state, "epoch": epoch})
            ckpt.save_checkpoint(cfg.OUTPUT, epoch, payload)

        if eval_fn is not None:
            eval_fn(to_plain(params), vit_cfg, epoch)

        loss = loss_meter.avg
        history.append(loss)
        # early stopping on stalled loss (mim.py:116-135)
        if loss < min_loss:
            min_loss = loss
            consec = 0
        else:
            consec += 1
        logger.info(f"consecutive epochs = {consec}")
        if cfg.early_stopping and consec >= 4 and min_loss - loss < 1e-3:
            logger.info("Loss has not changed significantly in 4 epochs. Stopping training early.")
            break

    logger.info("Training time {}".format(datetime.timedelta(seconds=int(time.time() - start_time))))
    return to_plain(params), history
