"""Labeled evaluation harness (rebuild of eval.py:106-283).

Runs the attention pipeline and one of the reference's 8 segmentation
methods per image, then Dice / accuracy / F1 / precision / recall / Jaccard
against the labels. All compute (ViT, smoothing, thresholding, clustering,
Chan-Vese, metrics) is device-side; the host only iterates images and
aggregates meters.

Methods (eval.py:172-202): ours, otsu, heatmap_threshold, k-means,
k-means_ours, chan-vese, chan-vese_ours, k-means_feature_clustering.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .models import vit
from .ops import cluster
from .ops import threshold as th
from .ops.chan_vese import chan_vese
from .ops.metrics import AverageMeter, calculate_metrics, dice_loss
from .ops.resize import resize_linear_cv2, smooth_attention
from .ops.stitch import concat_crops
from .pipeline import attention_map_rgb, head_average_attention

METHODS = (
    "ours",
    "otsu",
    "heatmap_threshold",
    "k-means",
    "k-means_ours",
    "chan-vese",
    "chan-vese_ours",
    "k-means_feature_clustering",
)


@partial(jax.jit, static_argnames=("method",))
def apply_method(img_u8, attention, method: str):
    """Attention map + gray image -> {0,255} uint8 mask for one image."""
    if method in ("ours", "otsu", "heatmap_threshold"):
        t, t2, t3 = th.threshold_ours(img_u8, attention)
        return {"ours": t, "otsu": t2, "heatmap_threshold": t3}[method]
    if method == "k-means_ours":
        return cluster.kmeans_mask_ours(img_u8, attention)
    if method == "k-means":
        return cluster.kmeans_mask_image(img_u8)
    if method == "chan-vese_ours":
        seg = chan_vese(th.mult_blend_u8(img_u8, attention))
        return seg.astype(jnp.uint8) * jnp.uint8(255)
    if method == "chan-vese":
        seg = chan_vese(img_u8)
        return seg.astype(jnp.uint8) * jnp.uint8(255)
    raise ValueError(f"unknown method {method!r}")


@partial(jax.jit, static_argnames=("cfg",))
def feature_clustering_mask(params, cfg, x, gray_u8):
    """k-means_feature_clustering (eval.py:186-202): bilinear-upsampled
    last-block keys, z-scored, 2-means -> {0,255} label map. Polarity is
    oriented unsupervised by mean gray intensity (see kmeans_feature_mask);
    the ground-truth label is never consulted."""
    b, h, w, _ = x.shape
    k = vit.last_block_key_features(params, cfg, x)[0]  # (gh, gw, D)
    up = resize_linear_cv2(jnp.moveaxis(k, -1, 0), (h, w))  # (D, H, W)
    return cluster.kmeans_feature_mask(jnp.moveaxis(up, 0, -1), gray_u8)


@jax.jit
def score_pair(output_u8, target):
    """(dice_loss, [jaccard, f1, recall, precision, acc]) with the
    reference's quirks: output/255 then sigmoid inside DiceLoss."""
    out = output_u8.astype(jnp.float32) / 255.0
    loss = dice_loss(out, target)
    mets = calculate_metrics(target, out)
    return loss, mets


def _image_attention(params, cfg, sample, crop: int, median_size: int, dtype=jnp.float32):
    """Smoothed attention for one sample, crop==1 or grid-crop variant
    (eval.py:135-171). Returns (attention (H,W), gray_u8 (H,W)).

    crop>1 matches AIP_Croped_Labeled_Dataset exactly (data.py:97-122): the
    grid is cut from the PIL-default (bicubic) resize of the source image
    (sample.crop_image), and the gray used for thresholding is the
    re-assembled bicubic image converted to L (eval.py:160-167) — which, for
    exactly-tiling grids, is the bicubic image itself.
    """
    h, w = sample.gray.shape
    if crop == 1:
        x = jnp.asarray(sample.image)[None].astype(dtype)
        attn = attention_map_rgb(params, cfg, x, median_size)[0]
        return attn, jnp.asarray(sample.gray)
    assert sample.crop_image is not None, "crop>1 needs build_eval_samples(..., crop=crop)"
    g = int(np.sqrt(crop))
    attn = _crop_attention(params, cfg, jnp.asarray(sample.crop_image), g, median_size, dtype)
    return attn, jnp.asarray(sample.crop_gray)


@partial(jax.jit, static_argnames=("cfg", "g", "median_size", "dtype"))
def _crop_attention(params, cfg, crop_image, g, median_size, dtype):
    """crop>1 grid attention as ONE dispatch (tile cut -> batched ViT ->
    concat -> smooth); eager composition here would cost hundreds of
    per-op round-trips per image over a high-latency device link."""
    h, w, _ = crop_image.shape
    ch, cw = h // g, w // g
    tiles = crop_image.reshape(g, ch, g, cw, 3).transpose(0, 2, 1, 3, 4).reshape(g * g, ch, cw, 3)
    grids = head_average_attention(params, cfg, tiles.astype(dtype), median_size).astype(jnp.float32)
    p = cfg.patch_size
    # the reference upsamples each grid by p, concatenates, and immediately
    # strides back down (eval.py:219-231); repeat-then-[::p,::p] is an exact
    # identity for equal tiles, so concatenate the grids directly
    return smooth_attention(concat_crops(grids), p, (h, w))


@partial(jax.jit, static_argnames=("cfg", "method", "median_size", "dtype"))
def _batched_eval_step_u8(params, cfg, grays_u8, targets_u8, method, median_size,
                          dtype=jnp.float32):
    """uint8-wire variant of the batched step for grayscale sources (the OCM
    datasets): the host ships only (B, H, W) uint8 gray + uint8 labels — ~8x
    fewer bytes than f32 RGB + f32 targets, which is the actual eval
    bottleneck over a host link (BENCH.md: pure compute 160 img/s vs ~26
    end-to-end before this path). The RGB model input is reconstructed on
    device; bit-identical to the f32 path when image == replicated gray."""
    from .pipeline import to_model_input

    attn = attention_map_rgb(params, cfg, to_model_input(grays_u8, dtype), median_size)
    outputs = jax.vmap(lambda g, a: apply_method(g, a, method))(grays_u8, attn)
    targets = targets_u8.astype(jnp.float32) / 255.0
    losses, mets = jax.vmap(score_pair)(outputs, targets)
    return losses, mets, outputs, attn


@partial(jax.jit, static_argnames=("cfg", "method", "median_size"))
def _batched_eval_step(params, cfg, images, grays, targets, method, median_size):
    """Fused eval for a batch of crop==1 threshold-method images: attention
    forward + per-image method + per-image Dice/metrics, one dispatch."""
    attn = attention_map_rgb(params, cfg, images, median_size)
    outputs = jax.vmap(lambda g, a: apply_method(g, a, method))(grays, attn)
    losses, mets = jax.vmap(score_pair)(outputs, targets)
    return losses, mets, outputs, attn


def _log_image_panels(wandb, meters, sample, output, attn, epoch):
    """The reference's per-image W&B panel set (eval.py:258-282):
    input / target / output / attention, alongside the running metrics."""
    wandb.log(
        {"Loss": meters["loss"].val, "Dice": 1 - meters["loss"].avg,
         "Acc": meters["acc"].avg, "f1": meters["f1"].avg,
         "precision": meters["precision"].avg, "recall": meters["recall"].avg,
         "jaccard": meters["jaccard"].avg,
         "input_images": [
             wandb.Image(np.asarray(sample.gray), caption="Input Image"),
             wandb.Image(np.asarray(sample.label), caption="Target"),
             wandb.Image(np.asarray(output), caption="Output"),
             wandb.Image(np.asarray(attn, dtype=np.float32), caption="Attention"),
         ]},
        step=epoch,
    )


def validate(params, cfg, samples, *, method="ours", crop=1, median_size=1,
             logger=None, wandb=None, epoch=0, print_freq=1, batch_size=1,
             dtype=jnp.float32, meters_out=None):
    """Returns (acc_avg, f1_avg, loss_avg), logging per image like the
    reference validate(). When ``meters_out`` is a dict it receives the full
    AverageMeter set (loss/acc/f1/precision/recall/jaccard/time) so callers
    can read all six final averages — used by the metric-level parity oracle
    against the reference's executed validate() (tests/test_reference_validate.py).

    batch_size > 1 (crop==1; threshold and k-means methods — chan-vese and
    feature clustering stay per-image) batches the whole per-image pipeline
    into one device dispatch per chunk — identical numbers, far less
    host/dispatch overhead.

    dtype=jnp.bfloat16 (eval.py --bf16 1) runs the ViT in MXU-native bf16;
    attention maps leave the model in f32 and all smoothing/threshold/metric
    stages are unchanged (documented delta: bf16 rounding can move a few
    pixels near threshold boundaries; defaults stay fp32 reference-exact).
    """
    if dtype != jnp.float32:
        from .pipeline import cast_params

        params = cast_params(params, dtype)
    meters = {k: AverageMeter() for k in ("loss", "acc", "f1", "precision", "recall", "jaccard", "time")}
    if meters_out is not None:
        meters_out.update(meters)
    # chan-vese stays per-image: a vmapped while_loop would keep updating
    # already-converged lanes, changing its results; feature clustering has
    # its own polarity handling below
    batchable = (
        crop == 1
        and method in ("ours", "otsu", "heatmap_threshold", "k-means", "k-means_ours")
        and batch_size > 1
    )
    if batchable:
        from .data.prefetch import prefetch

        # grayscale sources (image == replicated gray, true for the OCM
        # datasets) go over the wire as uint8; otherwise f32 RGB. A prefetch
        # thread overlaps the host stack + transfer with device compute.
        chunk_list = [samples[s0 : s0 + batch_size] for s0 in range(0, len(samples), batch_size)]
        u8_wire = all(getattr(s, "gray_exact", False) for s in samples)

        def host_batches():
            for chunk in chunk_list:
                grays = np.stack([s.gray for s in chunk])
                if u8_wire:
                    targets = np.stack([np.round(s.label * 255.0).astype(np.uint8) for s in chunk])
                    yield grays, targets
                else:
                    images = np.stack([s.image for s in chunk])
                    targets = np.stack([s.label for s in chunk])
                    yield images, grays, targets

        end = time.time()
        idx = 0
        dev = jax.devices()[0]
        for ci, arrs in enumerate(prefetch(host_batches(), sharding=dev)):
            chunk = chunk_list[ci]
            if u8_wire:
                losses, mets, outputs, attns = _batched_eval_step_u8(
                    params, cfg, arrs[0], arrs[1], method, median_size, dtype)
            else:
                losses, mets, outputs, attns = _batched_eval_step(
                    params, cfg, arrs[0].astype(dtype), arrs[1], arrs[2], method, median_size)
            losses, mets = np.asarray(losses), np.asarray(mets)
            for b in range(len(chunk)):
                jac, f1, rec, prec, acc = mets[b]
                meters["loss"].update(float(losses[b]), 1)
                meters["acc"].update(float(acc), 1)
                meters["f1"].update(float(f1), 1)
                meters["precision"].update(float(prec), 1)
                meters["recall"].update(float(rec), 1)
                meters["jaccard"].update(float(jac), 1)
                meters["time"].update((time.time() - end) / len(chunk))
                if wandb is not None:
                    _log_image_panels(wandb, meters, chunk[b], outputs[b], attns[b], epoch)
                idx += 1
            end = time.time()
        if logger:
            m = meters
            logger.info(
                f" * Acc_average: {m['acc'].avg:.3f} F1_average {m['f1'].avg:.3f} "
                f"precision {m['precision'].avg:.3f} recall {m['recall'].avg:.3f} "
                f"jaccard {m['jaccard'].avg:.3f} Dice Score {1 - m['loss'].avg:.4f}"
            )
        return meters["acc"].avg, meters["f1"].avg, meters["loss"].avg

    end = time.time()
    for idx, sample in enumerate(samples):
        attn, gray = _image_attention(params, cfg, sample, crop, median_size, dtype)
        if method == "k-means_feature_clustering":
            output = feature_clustering_mask(
                params, cfg, jnp.asarray(sample.image)[None].astype(dtype), gray)
        else:
            output = apply_method(gray, attn, method)
        target = jnp.asarray(sample.label)
        loss, mets = score_pair(output, target)
        jac, f1, rec, prec, acc = (float(m) for m in mets)
        meters["loss"].update(float(loss), 1)
        meters["acc"].update(acc, 1)
        meters["f1"].update(f1, 1)
        meters["precision"].update(prec, 1)
        meters["recall"].update(rec, 1)
        meters["jaccard"].update(jac, 1)
        meters["time"].update(time.time() - end)
        if wandb is not None:
            _log_image_panels(wandb, meters, sample, output, attn, epoch)
        end = time.time()
        if logger and idx % print_freq == 0:
            m = meters
            logger.info(
                f"Test: [{idx}/{len(samples)}]\t"
                f"Time {m['time'].val:.3f} ({m['time'].avg:.3f})\t"
                f"Loss {m['loss'].val:.4f} ({m['loss'].avg:.4f})\t"
                f"Dice Score {1 - m['loss'].val:.4f} ({1 - m['loss'].avg:.4f})\t"
                f"Acc {m['acc'].val:.3f} ({m['acc'].avg:.3f})\t"
                f"f1 {m['f1'].val:.3f} ({m['f1'].avg:.3f})\t"
                f"prec {m['precision'].val:.3f} ({m['precision'].avg:.3f})\t"
                f"recall {m['recall'].val:.3f} ({m['recall'].avg:.3f})\t"
                f"jaccard {m['jaccard'].val:.3f} ({m['jaccard'].avg:.3f})"
            )
    if logger:
        m = meters
        logger.info(
            f" * Acc_average: {m['acc'].avg:.3f} F1_average {m['f1'].avg:.3f} "
            f"precision {m['precision'].avg:.3f} recall {m['recall'].avg:.3f} "
            f"jaccard {m['jaccard'].avg:.3f} Dice Score {1 - m['loss'].avg:.4f}"
        )
    if wandb is not None:
        wandb.log(
            {"Loss": meters["loss"].val, "Dice": 1 - meters["loss"].avg, "Acc": meters["acc"].avg,
             "f1": meters["f1"].avg, "precision": meters["precision"].avg,
             "recall": meters["recall"].avg, "jaccard": meters["jaccard"].avg},
            step=epoch,
        )
    return meters["acc"].avg, meters["f1"].avg, meters["loss"].avg
