"""Binary morphology and connected components.

Two tiers, mirroring how the reference uses them:

* In-graph (jnp): binary closing with a disk structuring element via
  reduce_window — used when ROI masking participates in a jitted pipeline.
* Host-side (scipy.ndimage): connected-component labeling, small-object
  removal and region centroids for the query-point generation modes
  (utils.py:250-301), which are off the hot path and inherently host logic
  (variable object counts feed matplotlib / query loops).

Semantics match skimage: disk(r) = {(y,x): y^2+x^2 <= r^2}; 8-connectivity
(connectivity=2) for labeling; erosion treats out-of-image as foreground so
borders don't erode (skimage default).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi


def disk(radius: int) -> np.ndarray:
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (yy * yy + xx * xx <= radius * radius).astype(bool)


# ---------------------------------------------------------------------------
# jnp (in-graph) variants
# ---------------------------------------------------------------------------


def _morph_window(x, structure, op):
    """Apply a min/max window restricted to the structuring element by
    shifting: out(p) = op over {x[p + s] : s in structure}."""
    r = structure.shape[0] // 2
    pad_val = 0.0 if op is jnp.maximum else 1.0
    padded = jnp.pad(x.astype(jnp.float32), r, constant_values=pad_val)
    h, w = x.shape
    acc = None
    for dy in range(structure.shape[0]):
        for dx in range(structure.shape[1]):
            if not structure[dy, dx]:
                continue
            window = padded[dy : dy + h, dx : dx + w]
            acc = window if acc is None else op(acc, window)
    return acc > 0.5


def binary_dilation(x, structure):
    return _morph_window(x, structure, jnp.maximum)


def binary_erosion(x, structure):
    return _morph_window(x, structure, jnp.minimum)


def binary_closing(x, structure):
    """Dilation then erosion (skimage.binary_closing; utils.py:252)."""
    return binary_erosion(binary_dilation(x, structure), structure)


# ---------------------------------------------------------------------------
# Host-side (scipy) variants
# ---------------------------------------------------------------------------

_EIGHT = np.ones((3, 3), bool)


def _native():
    """First-party C++ kernels (native/ocm_native.cpp) when built; None
    falls back to scipy."""
    try:
        from .. import native

        return native if native.available() else None
    except Exception:
        return None


def remove_small_objects(mask: np.ndarray, min_size=20, connectivity=2) -> np.ndarray:
    """skimage.morphology.remove_small_objects for boolean masks."""
    nat = _native() if connectivity == 2 else None
    if nat is not None:
        return nat.remove_small_objects(mask, min_size)
    structure = _EIGHT if connectivity == 2 else None
    labels, n = ndi.label(mask, structure=structure)
    if n == 0:
        return mask.copy()
    sizes = np.bincount(labels.ravel())
    keep = sizes >= min_size
    keep[0] = False
    return keep[labels]


def get_rois(mask_u8: np.ndarray) -> np.ndarray:
    """utils.py:250-254: remove objects <20px (8-conn), close with disk(2),
    label (8-conn). Returns the int label image."""
    mask = np.asarray(mask_u8) > 0
    mask = remove_small_objects(mask, min_size=20, connectivity=2)
    # skimage binary_closing: dilation (border background) then erosion with
    # out-of-image treated as foreground
    st = disk(2)
    nat = _native()
    if nat is not None:
        mask = nat.binary_erosion(nat.binary_dilation(mask, st), st, border_value=1)
        labels, _ = nat.cc_label(mask)
        return labels
    mask = ndi.binary_dilation(mask, structure=st)
    mask = ndi.binary_erosion(mask, structure=st, border_value=1)
    labels, _ = ndi.label(mask, structure=_EIGHT)
    return labels


def region_centroids(labels: np.ndarray, min_area=10):
    """(x, y) centroids of regions with area >= min_area, in ascending label
    order — the query points of morphology_cleaning (utils.py:256-301)."""
    n = int(labels.max())
    nat = _native()
    if nat is not None and n > 0:
        areas, centroids, _ = nat.region_props(labels, n)
        return [tuple(centroids[i]) for i in range(n) if areas[i] >= min_area]
    points = []
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        if ys.size >= min_area:
            points.append((float(xs.mean()), float(ys.mean())))
    return points
