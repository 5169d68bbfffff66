"""Segmentation losses and metrics, fused-graph edition.

Replaces the reference's per-image sklearn calls (utils.py:388-408) and torch
DiceLoss (utils.py:410-424) with closed-form confusion-count math in jnp. The
reference quirks are preserved deliberately:

* DiceLoss applies sigmoid to its inputs even when they are already binary
  masks (eval.py:204-211 feeds {0,1} masks through sigmoid), smooth=1;
* metrics binarize both arguments at > 0.5;
* sklearn's zero-division behavior (return 0) is matched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x.astype(jnp.float32)))


def dice_loss(inputs, targets, smooth=1.0):
    """1 - (2*sum(sigmoid(x)*t) + s) / (sum(sigmoid(x)) + sum(t) + s)."""
    x = jnp.ravel(_sigmoid(inputs))
    t = jnp.ravel(targets).astype(jnp.float32)
    inter = jnp.sum(x * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(x) + jnp.sum(t) + smooth)


def dice_bce_loss(inputs, targets, smooth=1.0):
    """DiceBCELoss (unet.py:95-112): Dice + mean BCE on sigmoid outputs."""
    x = jnp.ravel(_sigmoid(inputs))
    t = jnp.ravel(targets).astype(jnp.float32)
    inter = jnp.sum(x * t)
    dice = 1.0 - (2.0 * inter + smooth) / (jnp.sum(x) + jnp.sum(t) + smooth)
    eps = 1e-7
    xc = jnp.clip(x, eps, 1.0 - eps)
    bce = -jnp.mean(t * jnp.log(xc) + (1.0 - t) * jnp.log(1.0 - xc))
    return dice + bce


def confusion_counts(y_true, y_pred):
    """(tp, fp, fn, tn) after binarizing both at > 0.5 (utils.py:390-400)."""
    t = (jnp.ravel(y_true) > 0.5).astype(jnp.float32)
    p = (jnp.ravel(y_pred) > 0.5).astype(jnp.float32)
    tp = jnp.sum(t * p)
    fp = jnp.sum((1 - t) * p)
    fn = jnp.sum(t * (1 - p))
    tn = jnp.sum((1 - t) * (1 - p))
    return tp, fp, fn, tn


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0e-38), 0.0)


def calculate_metrics(y_true, y_pred):
    """[jaccard, f1, recall, precision, accuracy] — sklearn binary semantics
    (positive class = 1), matching utils.py:388-408's call order."""
    tp, fp, fn, tn = confusion_counts(y_true, y_pred)
    jaccard = _safe_div(tp, tp + fp + fn)
    f1 = _safe_div(2 * tp, 2 * tp + fp + fn)
    recall = _safe_div(tp, tp + fn)
    precision = _safe_div(tp, tp + fp)
    acc = (tp + tn) / (tp + fp + fn + tn)
    return jnp.stack([jaccard, f1, recall, precision, acc])


def roc_auc(y_true, scores, n_thresholds=256):
    """ROC-AUC for scores in [0,1] via the rank/Mann-Whitney identity on a
    quantized histogram (finetune.py:230-235 uses sklearn roc_auc_score on
    sigmoid outputs). Exact when scores take <= n_thresholds distinct
    quantized values; ties handled like sklearn (trapezoidal)."""
    t = (jnp.ravel(y_true) > 0.5).astype(jnp.float32)
    s = jnp.clip(jnp.ravel(scores).astype(jnp.float32), 0.0, 1.0)
    q = jnp.round(s * (n_thresholds - 1)).astype(jnp.int32)
    # one weighted histogram pass each; segment_sum avoids materializing the
    # (N, n_thresholds) one-hot (callers run this per image OUTSIDE jit,
    # where nothing CSEs or fuses the naive compare away)
    pos_hist = jax.ops.segment_sum(t, q, num_segments=n_thresholds)
    neg_hist = jax.ops.segment_sum(1 - t, q, num_segments=n_thresholds)
    # P(s_pos > s_neg) + 0.5 P(equal), summed over bins
    neg_below = jnp.concatenate([jnp.zeros(1), jnp.cumsum(neg_hist)[:-1]])
    wins = jnp.sum(pos_hist * neg_below) + 0.5 * jnp.sum(pos_hist * neg_hist)
    denom = jnp.sum(t) * jnp.sum(1 - t)
    return _safe_div(wins, denom)


class AverageMeter:
    """Host-side running average (timm.utils.AverageMeter equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0
