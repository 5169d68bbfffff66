"""Small spatial filters: scipy-compatible median / rank filter.

Replaces scipy.ndimage.median_filter on the eval path (eval.py:144, default
size=1 is the identity; PGT/analysis runs use larger sizes) with a jittable
neighborhood-sort. ``reflect`` border mode matches scipy's default
(= numpy 'symmetric').
"""

from __future__ import annotations

import jax.numpy as jnp


def median_filter(x, size: int):
    """scipy.ndimage.median_filter(x, size) on a 2D array.

    scipy's median filter is the rank filter with rank = (size*size) // 2 on
    the sorted window, matching even window sizes too.
    """
    if size <= 1:
        return x
    k = size
    # scipy origin: window spans [-(k//2), (k-1)//2] around the pixel... for
    # odd k it's centered; for even k scipy shifts left/up by one (origin 0
    # with even size covers [-k//2, k//2-1]).
    lo = k // 2
    hi = k - 1 - lo
    padded = jnp.pad(x, ((lo, hi), (lo, hi)), mode="symmetric")
    h, w = x.shape
    windows = [padded[dy : dy + h, dx : dx + w] for dy in range(k) for dx in range(k)]
    stack = jnp.stack(windows, axis=-1)
    rank = (k * k) // 2
    return jnp.sort(stack, axis=-1)[..., rank]
