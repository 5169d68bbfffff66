"""Datasets and loaders (rebuild of data.py).

Reference conventions preserved:

* eval images resize with PIL NEAREST to (image_size, image_size)
  (data.py:291-299) and labels likewise; labels are L-mode scaled to [0,1];
* images open as RGB; the thresholding side consumes the L-mode uint8 view
  (eval.py:173);
* the center %8 crop of AIP_Dataset (data.py:29-31);
* SimMIM training transform: RandomResizedCrop(scale=(0.67,1),
  ratio=(3/4,4/3)) + random H/V flips + ToTensor, plus MaskGenerator and
  optional ROI-restricted masking (data.py:189-253).
"""

from __future__ import annotations

import dataclasses
import math
import os
from glob import glob
from typing import Iterator

import numpy as np
from PIL import Image

from .mask_generator import MaskGenerator


def list_images(path: str, pattern: str = "/*") -> list[str]:
    """glob helper matching build_loader_simmim (data.py:271-275)."""
    if os.path.isfile(path):
        return sorted(glob(path))
    return sorted(glob(path + pattern))


def load_rgb_resized(path: str, size_hw, resample=Image.Resampling.NEAREST) -> np.ndarray:
    """-> float32 (H, W, 3) in [0,1] (PIL resize + ToTensor semantics)."""
    img = Image.open(path).convert("RGB").resize((size_hw[1], size_hw[0]), resample)
    return np.asarray(img, dtype=np.float32) / 255.0


def load_gray_resized(path: str, size_hw, resample=Image.Resampling.NEAREST) -> np.ndarray:
    """-> uint8 (H, W): RGB-resize first, then L conversion, matching the
    reference order (resize on RGB, convert('L') later in threshold())."""
    img = Image.open(path).convert("RGB").resize((size_hw[1], size_hw[0]), resample)
    return np.asarray(img.convert("L"), dtype=np.uint8)


@dataclasses.dataclass
class EvalSample:
    image: np.ndarray  # float32 (H, W, 3) in [0,1]
    gray: np.ndarray  # uint8 (H, W)
    label: np.ndarray  # float32 (H, W) in [0,1]
    path: str
    # crop>1 only: the reference re-opens the source and resizes it with
    # PIL's DEFAULT filter (bicubic) before grid-cropping
    # (data.py:99-102: img.copy().resize((image_size, image_size))), so the
    # grid source differs from the NEAREST-resized eval image.
    crop_image: np.ndarray | None = None  # float32 (H, W, 3) in [0,1]
    crop_gray: np.ndarray | None = None  # uint8 (H, W)
    # True when image is exactly the replicated gray (grayscale source):
    # lets batched eval ship uint8 over the wire instead of f32 RGB
    gray_exact: bool = False


def build_eval_samples(eval_dataset_path: str, image_size: int, crop: int = 1) -> list[EvalSample]:
    """build_eval_loader semantics (data.py:282-306): images/ and labels/
    subfolders, NEAREST resize to the square image_size. With crop>1 the
    bicubic grid source of AIP_Croped_Labeled_Dataset (data.py:97-122) is
    loaded alongside."""
    images = sorted(glob(eval_dataset_path + "/images/*"))
    labels = sorted(glob(eval_dataset_path + "/labels/*"))
    assert len(images) == len(labels), f"{len(images)} images vs {len(labels)} labels"
    out = []
    for ip, lp in zip(images, labels):
        rgb = load_rgb_resized(ip, (image_size, image_size))
        gray = load_gray_resized(ip, (image_size, image_size))
        lab = Image.open(lp).convert("L").resize((image_size, image_size), Image.Resampling.NEAREST)
        crop_rgb = crop_gray = None
        if crop > 1:
            crop_rgb = load_rgb_resized(ip, (image_size, image_size), Image.Resampling.BICUBIC)
            # the reference's crop>1 gray is CHANNEL 0 of the re-assembled
            # crops replicated to RGB (eval.py:161-166: temp[0][0..2] = img
            # from images[i,:,0,:,:]), NOT a luma conversion; the f32
            # /255*255 round-trip is uint8-exact, so this is the R plane
            crop_gray = np.round(crop_rgb[..., 0] * 255.0).astype(np.uint8)
        gray_exact = bool(
            np.array_equal(rgb[..., 0], rgb[..., 1])
            and np.array_equal(rgb[..., 1], rgb[..., 2])
            and np.array_equal(np.round(rgb[..., 0] * 255.0).astype(np.uint8), gray)
        )
        out.append(EvalSample(rgb, gray, np.asarray(lab, np.float32) / 255.0, ip,
                              crop_rgb, crop_gray, gray_exact))
    return out


def center_crop_mod8(img: np.ndarray) -> np.ndarray:
    """AIP_Dataset crop (data.py:29-31): truncate H and W to multiples of 8."""
    h, w = img.shape[:2]
    return img[: h - h % 8, : w - w % 8]


# ---------------------------------------------------------------------------
# SimMIM training transform
# ---------------------------------------------------------------------------


def random_resized_crop(img: Image.Image, rng: np.random.Generator, out_size: int,
                        scale=(0.67, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)) -> Image.Image:
    """torchvision RandomResizedCrop's sampling algorithm (10 attempts, then
    center fallback), BILINEAR resize."""
    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(rng.integers(0, h - ch + 1))
            j = int(rng.integers(0, w - cw + 1))
            box = (j, i, j + cw, i + ch)
            return img.resize((out_size, out_size), Image.Resampling.BILINEAR, box=box)
    # fallback: center crop at the clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    i, j = (h - ch) // 2, (w - cw) // 2
    return img.resize((out_size, out_size), Image.Resampling.BILINEAR, box=(j, i, j + cw, i + ch))


class SimMIMTransform:
    """Aug + mask pair generator (data.py:189-253, minus its debug dumps)."""

    def __init__(self, img_size: int, mask_patch_size: int, model_patch_size: int,
                 mask_ratio: float, roi_masking: bool = False):
        self.img_size = img_size
        self.roi_masking = roi_masking
        self.mask_generator = MaskGenerator(img_size, mask_patch_size, model_patch_size, mask_ratio)

    def __call__(self, img: Image.Image, rng: np.random.Generator):
        img = img.convert("RGB")
        img = random_resized_crop(img, rng, self.img_size)
        if rng.random() < 0.5:
            img = img.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
        if rng.random() < 0.5:
            img = img.transpose(Image.Transpose.FLIP_TOP_BOTTOM)
        arr = np.asarray(img, dtype=np.float32) / 255.0  # (H, W, 3)
        mask = self.mask_generator(rng)
        if self.roi_masking:
            from ..ops.morphology import get_rois

            gray = np.asarray(img.convert("L"))
            binary = np.where(gray > 10, 255, 0).astype(np.uint8)
            rois = get_rois(binary)
            # nearest-resize the label image to the mask grid (order-0)
            ys = (np.arange(mask.shape[0]) * rois.shape[0] / mask.shape[0]).astype(int)
            xs = (np.arange(mask.shape[1]) * rois.shape[1] / mask.shape[1]).astype(int)
            rois_small = (rois[np.ix_(ys, xs)] != 0).astype(mask.dtype)
            new_mask = mask * rois_small
            if new_mask.sum() != 0:
                mask = new_mask
        return arr, mask


def build_simmim_loader(image_path: str, batch_size: int, img_size: int, mask_patch_size: int,
                        model_patch_size: int, mask_ratio: float, roi_masking: bool = False,
                        seed: int = 0, drop_last: bool = True, cache_images: bool = True) -> "Loader":
    paths = list_images(image_path)
    transform = SimMIMTransform(img_size, mask_patch_size, model_patch_size, mask_ratio, roi_masking)
    return Loader(paths, transform, batch_size, seed=seed, drop_last=drop_last, cache_images=cache_images)


def build_simmim_device_loader(image_path: str, batch_size: int, img_size: int,
                               mask_patch_size: int, model_patch_size: int,
                               mask_ratio: float, seed: int = 0,
                               drop_last: bool = True) -> "DeviceAugLoader":
    """Device-side augmentation variant of build_simmim_loader
    (DATA.DEVICE_AUG): the host only decodes; RandomResizedCrop + flips +
    MaskGenerator run as one jitted graph per batch (data/device_aug.py).
    ROI masking needs host connected components — use the host loader there.
    """
    return DeviceAugLoader(list_images(image_path), batch_size, img_size,
                           mask_patch_size, model_patch_size, mask_ratio,
                           seed=seed, drop_last=drop_last)


class DeviceAugLoader:
    """HBM-resident dataset + on-device SimMIM transform.

    Per-batch host->device shipping is the actual training bottleneck when
    the host link is slow (a 60x224^2x3 f32 batch is 36 MB; BENCH.md measured
    ~20 MB/s over this repo's device tunnel — 10x the step time). OCM
    pretraining sets are small (~600 384^2 tiles = ~100 MB as uint8 gray), so
    the TPU-native shape of this loader is: decode every source once, ship
    the whole uint8 stack to HBM once, and run shuffle-gather + the full
    augmentation as device ops. Steady-state epochs move ZERO image bytes
    over the host link.

    Yields (aug (B, S, S, 3) f32, mask (B, g, g) i32) device arrays.
    Sources are decoded at the canonical size — the size of the first
    readable image; stragglers are PIL-bilinear-resized to it (documented
    delta: the reference crops each image at its native size). Grayscale
    sources (the OCM case) are stored single-channel. Datasets larger than
    ``max_resident_bytes`` (default 4 GB, ~v5e HBM / 4) fall back to shipping
    uint8 batches per step. Deterministic per (seed, epoch, batch index).
    """

    def __init__(self, paths, batch_size, img_size, mask_patch_size,
                 model_patch_size, mask_ratio, seed=0, drop_last=True,
                 max_resident_bytes=4 << 30):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.img_size = img_size
        self.mask_patch_size = mask_patch_size
        self.model_patch_size = model_patch_size
        self.mask_ratio = mask_ratio
        self.seed = seed
        self.drop_last = drop_last
        self.max_resident_bytes = max_resident_bytes
        self._host_src: np.ndarray | None = None  # (N, H, W[, 3]) uint8
        self._dev_src = None  # same, device-resident (or None if too big)
        self._n: int | None = None  # decoded image count

    def _ensure_sources(self):
        if self._n is not None:
            return
        arrs = []
        canonical = None
        all_gray = True
        for p in self.paths:
            try:
                img = Image.open(p).convert("RGB")
            except Exception as e:
                print(f"Error reading image: {p} ({e}); skipping")
                continue
            if canonical is None:
                canonical = img.size
            elif img.size != canonical:
                img = img.resize(canonical, Image.Resampling.BILINEAR)
            a = np.asarray(img, dtype=np.uint8)
            if all_gray and not (
                np.array_equal(a[..., 0], a[..., 1]) and np.array_equal(a[..., 1], a[..., 2])
            ):
                all_gray = False
            arrs.append(a)
        if not arrs:
            self._host_src = np.zeros((0, 1, 1), np.uint8)
            self._n = 0
            return
        src = np.stack(arrs)
        if all_gray:
            src = src[..., 0]  # single channel over the wire and in HBM
        self._n = len(src)
        if src.nbytes <= self.max_resident_bytes:
            import jax.numpy as jnp

            self._dev_src = jnp.asarray(src)  # one transfer, resident forever;
            # the host copy is never read again — drop it rather than pinning
            # a second full-dataset copy in RAM for the process lifetime
        else:
            self._host_src = src

    def __len__(self):
        self._ensure_sources()
        n = self._n // self.batch_size
        if not self.drop_last and self._n % self.batch_size:
            n += 1
        return max(n, 0)

    def epoch(self, epoch: int):
        import jax
        import jax.numpy as jnp

        from .device_aug import simmim_augment

        self._ensure_sources()
        n = self._n
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        stop = n - n % self.batch_size if self.drop_last else n
        for batch_idx, s0 in enumerate(range(0, stop, self.batch_size)):
            idx = order[s0 : s0 + self.batch_size]
            if self._dev_src is not None:
                batch = jnp.take(self._dev_src, jnp.asarray(idx), axis=0)  # HBM gather
            else:
                batch = jnp.asarray(self._host_src[idx])  # uint8 over the wire
            yield simmim_augment(
                batch, jax.random.fold_in(key, batch_idx),
                out_size=self.img_size, mask_patch_size=self.mask_patch_size,
                model_patch_size=self.model_patch_size, mask_ratio=self.mask_ratio)


class Loader:
    """Minimal epoch-based loader: per-item PIL decode + transform, stacked
    into device-ready numpy batches. Deterministic per (seed, epoch).

    ``cache_images=True`` decodes each file once and keeps the PIL image in
    RAM (augmentation still reruns per epoch) — on hosts with few cores the
    jpeg decode dominates epoch time otherwise. OCM pretraining sets fit
    comfortably (the reference's is ~600 tiles).
    """

    def __init__(self, paths, transform, batch_size, seed=0, drop_last=True, cache_images=False):
        self.paths = list(paths)
        self.transform = transform
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self._cache = {} if cache_images else None

    def _open(self, path):
        if self._cache is None:
            return Image.open(path)
        if path not in self._cache:
            img = Image.open(path)
            img.load()
            self._cache[path] = img
        return self._cache[path]

    def __len__(self):
        n = len(self.paths) // self.batch_size
        if not self.drop_last and len(self.paths) % self.batch_size:
            n += 1
        return max(n, 0)

    def epoch(self, epoch: int) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(len(self.paths))
        pending = list(order)
        imgs, masks = [], []
        while pending or (imgs and not self.drop_last):
            if pending:
                i = pending.pop(0)
                try:
                    # unreadable files are skipped with a warning — the
                    # reference's swallow-errors __getitem__ (data.py:67-80)
                    # returns (None, None) and crashes later; skipping keeps
                    # batch shapes static for jit
                    img = self._open(self.paths[i])
                    arr, mask = self.transform(img, rng)
                except Exception as e:
                    print(f"Error reading image: {self.paths[i]} ({e}); skipping")
                    continue
                imgs.append(arr)
                masks.append(mask)
            if len(imgs) == self.batch_size or (not pending and imgs and not self.drop_last):
                yield np.stack(imgs), np.stack(masks)
                imgs, masks = [], []
