"""Optional Weights & Biases: real client when installed, file-backed shim when not.

Every trainable reference entry logs scalars AND image panels to W&B
(mim.py:84-91,200-220; eval.py:258-282; unet.py:30-41). This module keeps
those call sites working in offline images with full observability parity:
when wandb is unavailable, scalars append to ``<output>/wandb_offline.jsonl``
and ``wandb.Image`` panels are written as PNGs under
``<output>/wandb_images/step{N}/``.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np


def _to_u8(arr) -> np.ndarray:
    """wandb.Image dtype handling: integer data is already 0-255 (clip);
    float data in [0, 1] is scaled by 255; other float data is clipped to
    [0, 255]. No contrast stretching — a constant panel stays that shade."""
    a = np.squeeze(np.asarray(arr))
    if np.issubdtype(a.dtype, np.integer) or a.dtype == np.bool_:
        return np.clip(a, 0, 255).astype(np.uint8)
    a = a.astype(np.float32)
    if a.size and a.min() >= 0.0 and a.max() <= 1.0:
        a = a * 255.0
    return np.clip(a, 0.0, 255.0).astype(np.uint8)


class _FileImage:
    """wandb.Image stand-in capturing the array + caption."""

    def __init__(self, data, caption: str = "image", **kwargs):
        self.data = data
        self.caption = caption


class _FileWandb:
    """No-network wandb: log() persists scalars to JSONL and images to PNGs."""

    Image = _FileImage

    def __init__(self, output_dir: str | None = None):
        self._dir = output_dir
        self._step = 0

    def init(self, *args, **kwargs):
        cfg = kwargs.get("dir") or (args[0] if args else None)
        if isinstance(cfg, str):
            self._dir = cfg
        return self

    def _save_image(self, img: _FileImage, step: int, idx: int, panel: str):
        if not self._dir:
            return
        from PIL import Image as PILImage

        d = os.path.join(self._dir, "wandb_images", f"step{step}")
        os.makedirs(d, exist_ok=True)
        slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", img.caption) or f"img{idx}"
        PILImage.fromarray(_to_u8(img.data)).save(os.path.join(d, f"{panel}_{slug}.png"))

    def log(self, data: dict, step: int | None = None, **kwargs):
        step = self._step if step is None else step
        self._step = step + 1
        scalars = {}
        for key, val in data.items():
            if isinstance(val, _FileImage):
                self._save_image(val, step, 0, key)
            elif isinstance(val, (list, tuple)) and val and isinstance(val[0], _FileImage):
                for i, im in enumerate(val):
                    self._save_image(im, step, i, key)
            else:
                try:
                    scalars[key] = float(val)
                except (TypeError, ValueError):
                    pass
        if self._dir and scalars:
            os.makedirs(self._dir, exist_ok=True)
            with open(os.path.join(self._dir, "wandb_offline.jsonl"), "a") as f:
                f.write(json.dumps({"step": step, **scalars}) + "\n")

    def __getattr__(self, name):  # finish(), watch(), ...
        def _noop(*args, **kwargs):
            return None

        return _noop


def get_wandb(enabled: bool, output_dir: str | None = None):
    """Returns (wandb_module_or_shim, actually_enabled).

    enabled + wandb installed -> the real client. enabled + not installed ->
    the file-backed shim (scalars JSONL + PNG panels in output_dir), still
    reported as enabled so callers log the reference's full panel set.
    """
    if not enabled:
        return _FileWandb(None), False
    try:
        import wandb

        # guard against a stray `wandb/` run-artifact directory on sys.path
        # resolving as an empty namespace package (the reference repo ships
        # one) — only accept a module that actually looks like the client
        if not (hasattr(wandb, "init") and hasattr(wandb, "log")):
            raise ImportError("wandb resolved to a non-client package")
        return wandb, True
    except ImportError:
        return _FileWandb(output_dir), True
