"""Supervised / pseudo-supervised dense-prediction training.

Shared loop behind the finetune.py / PGT.py / unet.py entry points:
Adam + ReduceLROnPlateau(patience 5, factor 0.1), Dice loss, best-validation
checkpointing, and a per-image test pass with
jaccard/F1/recall/precision/acc/ROC-AUC plus image|GT|prediction triptychs
(finetune.py:59-363, unet.py:191-452, PGT.py:50-401).

The PGT teacher runs *inside the jitted step's device graph*: pseudo-labels
(CLS attention -> smooth -> Otsu blend threshold) are generated for the whole
batch in one fused call instead of the reference's per-image GPU->CPU
round-trip (PGT.py:57-86).
"""

from __future__ import annotations

import os
import time
from functools import partial
from glob import glob

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from ..ops.metrics import calculate_metrics, dice_loss, roc_auc
from ..ops.resize import smooth_attention
from ..ops.threshold import threshold_ours
from ..pipeline import head_average_attention
from . import checkpoint as ckpt

# ---------------------------------------------------------------------------
# Host data loading with the reference's cv2 conventions (finetune.py:25-53)
# ---------------------------------------------------------------------------


def _size_hw(size):
    """int -> square; (H, W) tuple passes through (unet.py's H/W globals)."""
    return (size, size) if isinstance(size, int) else tuple(size)


def load_image_cv2(path, size):
    """cv2.imread(COLOR) + INTER_LINEAR resize + /255 -> (H, W, 3) float32.

    cv2 loads BGR; the reference feeds that straight into the model, so we
    keep the loaded channel order untouched (identical for grayscale data).
    """
    import cv2

    h, w = _size_hw(size)
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    img = cv2.resize(img, (w, h))
    return (img / 255.0).astype(np.float32)


def load_mask_cv2(path, size, nearest=False):
    import cv2

    h, w = _size_hw(size)
    mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    mask = cv2.resize(mask, (w, h), interpolation=interp)
    return (mask / 255.0).astype(np.float32)


class SegLoader:
    """Labeled (or unlabeled, for PGT) batch iterator.

    ``device_resident=True`` decodes every image once into a uint8 stack in
    HBM and gathers batches on device (the /255 normalization included):
    after the first epoch, zero image bytes cross the host link. The
    supervised sets are tiny (~70 x 512^2), so this is the TPU-native
    default for the finetune/PGT/unet loops; numerics are identical to the
    host path (cv2 resize happens before the uint8 quantization either way).
    """

    def __init__(self, images, labels=None, image_size=512, batch_size=2, shuffle=False, seed=42,
                 device_resident=True):
        self.images, self.labels = list(images), (list(labels) if labels is not None else None)
        self.image_size, self.batch_size = image_size, batch_size
        self.shuffle, self.seed = shuffle, seed
        self.device_resident = device_resident
        self._dev = None  # (x_u8 (N,S,S,3), y_u8 (N,S,S,1) | None)

    def __len__(self):
        return max(1, (len(self.images) + self.batch_size - 1) // self.batch_size) if self.images else 0

    def _ensure_device_stack(self):
        import cv2
        import jax.numpy as jnp

        if self._dev is not None or not self.images:
            return
        h, w = _size_hw(self.image_size)
        xs = np.stack([
            cv2.resize(cv2.imread(p, cv2.IMREAD_COLOR), (w, h)) for p in self.images
        ]).astype(np.uint8)
        ys = None
        if self.labels is not None:
            ys = np.stack([
                cv2.resize(cv2.imread(p, cv2.IMREAD_GRAYSCALE), (w, h),
                           interpolation=cv2.INTER_LINEAR) for p in self.labels
            ]).astype(np.uint8)[..., None]
        self._dev = (jnp.asarray(xs), jnp.asarray(ys) if ys is not None else None)

    def epoch(self, epoch=0):
        if not self.images:
            # empty split (tiny dataset): yield nothing — train_supervised
            # expects an empty iterator (it falls back to the train loss),
            # but device_resident would crash unpacking the None stack
            return
        order = np.arange(len(self.images))
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(order)
        if self.device_resident:
            import jax.numpy as jnp

            self._ensure_device_stack()
            xd, yd = self._dev
            for s in range(0, len(order), self.batch_size):
                idx = jnp.asarray(order[s : s + self.batch_size])
                x = jnp.take(xd, idx, axis=0).astype(jnp.float32) / 255.0
                if yd is None:
                    yield x
                else:
                    yield x, jnp.take(yd, idx, axis=0).astype(jnp.float32) / 255.0
            return
        for s in range(0, len(order), self.batch_size):
            idx = order[s : s + self.batch_size]
            x = np.stack([load_image_cv2(self.images[i], self.image_size) for i in idx])
            if self.labels is None:
                yield x
            else:
                y = np.stack([load_mask_cv2(self.labels[i], self.image_size) for i in idx])[..., None]
                yield x, y


def split_reference(images, labels, kind: str, ratio=1.0):
    """The hard-coded splits of the reference entry points."""
    if kind == "finetune":  # finetune.py:119-128, 259-264
        tr = slice(0, 50)
        va = slice(50, 70)
        te = slice(70, None)
    elif kind == "unet":  # unet.py:209-216, 349-354
        tr, va, te = slice(0, 25), slice(25, 30), slice(30, None)
    elif kind == "pgt":  # PGT.py:161-165
        tr, va, te = slice(0, 200), slice(200, None), slice(200, None)
    else:
        raise ValueError(kind)
    train_x = images[tr][: int(len(images[tr]) * ratio)]
    train_y = labels[tr][: int(len(labels[tr]) * ratio)] if labels else None
    return (train_x, train_y), (images[va], labels[va] if labels else None), (images[te], labels[te] if labels else None)


# ---------------------------------------------------------------------------
# PGT teacher: fused pseudo-label generation
# ---------------------------------------------------------------------------


def _pil_l_from_float(x):
    """ToPILImage + convert('L') semantics: u8 = trunc(x*255), then the PIL
    ITU-R 601-2 integer luma (exact: (R*19595 + G*38470 + B*7471 + 2^15) >> 16)."""
    u8 = (x * 255.0).astype(jnp.int32)
    l = (u8[..., 0] * 19595 + u8[..., 1] * 38470 + u8[..., 2] * 7471 + (1 << 15)) >> 16
    return l.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("cfg",))
def teacher_pseudo_labels(teacher_params, cfg, x, rng_key=None):
    """(B,H,W,3) float batch -> (B,H,W,1) {0,1} float pseudo-masks
    (PGT.py:57-86), fully on device.

    rng_key=None averages all heads (the default path); with a key, each
    image averages a random subset of 1..num_heads heads (the reference's
    ``rand`` mode, PGT.py:68-78).
    """
    from ..models import vit as vit_mod

    b, h, w, _ = x.shape
    gray = _pil_l_from_float(x)
    if rng_key is None:
        avg = head_average_attention(teacher_params, cfg, x)  # (B, gh, gw)
    else:
        grids = vit_mod.cls_attention_grid(teacher_params, cfg, x)  # (B, nh, gh, gw)
        nh = cfg.num_heads

        def one(key, g):
            k1, k2 = jax.random.split(key)
            num = jax.random.randint(k1, (), 1, nh + 1)
            order = jax.random.permutation(k2, nh)
            wts = (jnp.arange(nh) < num).astype(jnp.float32)[jnp.argsort(order)]
            return jnp.tensordot(wts, g, axes=1) / jnp.sum(wts)

        avg = jax.vmap(one)(jax.random.split(rng_key, b), grids)
    attn = jax.vmap(lambda g: smooth_attention(g, cfg.patch_size, (h, w)))(avg)
    masks = jax.vmap(lambda im, a: threshold_ours(im, a)[0])(gray, attn)
    return (masks.astype(jnp.float32) / 255.0)[..., None]


# ---------------------------------------------------------------------------
# Train / evaluate / test
# ---------------------------------------------------------------------------


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau('min', patience=5):
    an epoch only counts as improved when metric < best * (1 - threshold)
    (threshold_mode='rel', threshold=1e-4) — plain `<` would let a loss
    creeping down by 1e-6/epoch suppress the decay forever."""

    def __init__(self, lr, patience=5, factor=0.1, min_lr=0.0, threshold=1e-4):
        self.lr, self.patience, self.factor, self.min_lr = lr, patience, factor, min_lr
        self.threshold = threshold
        self.best = float("inf")
        self.bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr


def make_seg_step(apply_fn, tx):
    """apply_fn(params, state, x, train) -> (logits, new_state).
    Returns jitted train and eval steps over (params, state, opt_state)."""

    def loss_fn(params, state, x, y):
        logits, new_state = apply_fn(params, state, x, train=True)
        return dice_loss(logits, y), new_state

    @partial(jax.jit, donate_argnums=(0, 2))
    def train_step(params, state, opt_state, lr, x, y):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state, x, y)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    @jax.jit
    def eval_step(params, state, x, y):
        logits, _ = apply_fn(params, state, x, train=False)
        return dice_loss(logits, y)

    return train_step, eval_step


def train_supervised(apply_fn, params, state, train_loader, valid_loader, *, epochs, lr,
                     checkpoint_path, pseudo_label_fn=None, logger=print):
    """The fully_train loop. pseudo_label_fn(x)->y turns unlabeled batches
    into (x, y) (the PGT mode). Returns (params, state, train_losses, valid_losses)."""
    if len(train_loader) == 0:
        # train on nothing -> nan losses and a garbage "best" checkpoint;
        # fail loudly instead (usually a wrong --image_path root: the CLIs
        # expect a folder CONTAINING images/, not the images/ folder itself)
        raise ValueError(
            "train split is empty — no images found (is --image_path the "
            "dataset root containing images/?)")
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = tx.init(params)
    train_step, eval_step = make_seg_step(apply_fn, tx)
    plateau = ReduceLROnPlateau(lr)

    def batches(loader, epoch):
        for batch in loader.epoch(epoch):
            if pseudo_label_fn is not None:
                x = batch if not isinstance(batch, tuple) else batch[0]
                yield jnp.asarray(x), pseudo_label_fn(jnp.asarray(x))
            else:
                x, y = batch
                yield jnp.asarray(x), jnp.asarray(y)

    # copies: captured param buffers are otherwise donated by the next
    # epoch's train_step (donate_argnums=0) and deleted on TPU
    snap = lambda p: jax.tree.map(lambda a: a.copy(), p)
    best_valid = float("inf")
    cur_lr = lr
    train_losses, valid_losses = [], []
    best = (snap(params), state)
    for epoch in range(epochs):
        t0 = time.time()
        tl = []
        for x, y in batches(train_loader, epoch):
            params, state, opt_state, loss = train_step(params, state, opt_state, cur_lr, x, y)
            tl.append(loss)  # device scalar; one sync per epoch, not per batch
        tl = [float(l) for l in tl]
        vl = [float(eval_step(params, state, x, y)) for x, y in batches(valid_loader, epoch)]
        train_loss = float(np.mean(tl)) if tl else float("nan")
        if not vl and epoch == 0:
            logger("WARNING: validation split is empty (dataset smaller than the "
                   "train split); using the train loss for best-checkpoint "
                   "selection and LR plateau decisions")
        # an empty valid split must not poison best/plateau with NaN (which
        # would silently return the untrained epoch-0 params)
        valid_loss = float(np.mean(vl)) if vl else train_loss
        train_losses.append(train_loss)
        valid_losses.append(valid_loss)
        if valid_loss < best_valid:
            logger(f"Valid loss improved from {best_valid:2.4f} to {valid_loss:2.4f}. "
                   f"Saving checkpoint: {checkpoint_path}")
            best_valid = valid_loss
            best = (snap(params), state)
            # one directory per run name (files/<name>/ckpt_epoch_0): the
            # reference writes torch.save(files/<name>); dumping everything
            # into dirname() would let runs overwrite each other's best
            ckpt.save_checkpoint(checkpoint_path, 0, {"params": params, "state": state})
        cur_lr = plateau.step(valid_loss)
        dt = time.time() - t0
        logger(f"Epoch: {epoch+1:02} | Epoch Time: {int(dt//60)}m {int(dt%60)}s\n"
               f"\tTrain Loss: {train_loss:.3f}\n\t Val. Loss: {valid_loss:.3f}")
    return best[0], best[1], train_losses, valid_losses


def test_supervised(apply_fn, params, state, test_x, test_y, image_size, results_dir,
                    *, pseudo_label_fn=None, mask_nearest=True, logger=print):
    """fully_test: per-image metrics + triptych PNGs. Returns the 6 averaged
    metrics [jaccard, f1, recall, precision, acc, roc] and the mean loss.

    mask_nearest: GT-mask resize interpolation. The reference's three test
    loops differ — finetune.py:301 resizes with INTER_NEAREST, while
    unet.py:390 and PGT.py:339 use cv2's default INTER_LINEAR — so each
    entry point passes its own value to keep metric parity per script."""
    os.makedirs(results_dir, exist_ok=True)
    totals = np.zeros(6)
    total_loss = 0.0
    n = len(test_x)
    jit_apply = jax.jit(lambda p, s, xx: apply_fn(p, s, xx, train=False))
    for i, (xp, yp) in enumerate(zip(test_x, test_y)):
        name = os.path.basename(xp).rsplit(".", 1)[0]
        x = load_image_cv2(xp, image_size)[None]
        if yp is not None:
            y = load_mask_cv2(yp, image_size, nearest=mask_nearest)[None, ..., None]
        else:
            y = np.asarray(pseudo_label_fn(jnp.asarray(x)))
        logits, _ = jit_apply(params, state, jnp.asarray(x))
        loss = float(dice_loss(logits, jnp.asarray(y)))
        total_loss += loss
        prob = jax.nn.sigmoid(logits)
        mets = np.asarray(calculate_metrics(jnp.asarray(y), prob))
        roc = float(roc_auc(jnp.asarray(y), prob))
        totals += np.concatenate([mets, [roc]])
        # triptych: image | GT | prediction (finetune.py:327-336)
        pred = (np.asarray(prob[0, ..., 0]) > 0.5).astype(np.uint8) * 255
        gt = (y[0, ..., 0] * 255).astype(np.uint8)
        img_u8 = (x[0] * 255).astype(np.uint8)
        line = np.full((_size_hw(image_size)[0], 10, 3), 128, np.uint8)
        trip = np.concatenate(
            [img_u8, line, np.repeat(gt[..., None], 3, -1), line, np.repeat(pred[..., None], 3, -1)], axis=1
        )
        Image.fromarray(trip).save(os.path.join(results_dir, f"{name}.png"))
    avg = totals / max(n, 1)
    if n == 0:
        logger("WARNING: test split is empty (dataset smaller than the "
               "reference's hard-coded train/val split); metrics below are 0")
    logger(f"Jaccard: {avg[0]:1.4f} - F1: {avg[1]:1.4f} - Recall: {avg[2]:1.4f} - "
           f"Precision: {avg[3]:1.4f} - Acc: {avg[4]:1.4f} - ROC-AUC : {avg[5]:1.4f}")
    return avg, total_loss / max(n, 1)
