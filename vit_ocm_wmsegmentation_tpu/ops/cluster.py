"""Deterministic jitted k-means (k=2) — the clustering back-ends.

The reference shells out to cv2.kmeans on pixel triplets (utils.py:118-169)
and sklearn KMeans on 384-d key features (utils.py:171-197), both with
stochastic restarts. On TPU we run fixed-iteration Lloyd updates under
lax.fori_loop with a deterministic farthest-point init: for the k=2,
well-separated problems these pipelines pose, Lloyd converges to the same
partition as the multi-restart originals (verified against cv2/sklearn in
tests/test_cluster.py), without host round-trips or data-dependent control
flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lloyd(points, centers, iters):
    """points (N,D), centers (2,D) -> (labels (N,), centers (2,D))."""

    def step(_, c):
        d = jnp.sum(jnp.square(points[:, None, :] - c[None]), axis=-1)  # (N,2)
        lab = jnp.argmin(d, axis=-1)
        w = (lab[:, None] == jnp.arange(2)[None]).astype(points.dtype)  # (N,2)
        tot = jnp.maximum(jnp.sum(w, axis=0), 1.0)
        return (w.T @ points) / tot[:, None]

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d = jnp.sum(jnp.square(points[:, None, :] - centers[None]), axis=-1)
    return jnp.argmin(d, axis=-1), centers


def _candidate_inits(points, max_axis_splits=8):
    """Deterministic restart set replacing cv2/sklearn's random restarts:

    * farthest-point pair (min-sum point and the point farthest from it);
    * per-axis splits: means of the below/above-median halves along a
      coordinate (covers the axis-aligned local optima of multimodal data).
      Only the ``max_axis_splits`` highest-variance axes are tried so the
      restart count stays bounded for high-dimensional features.
    Returns (R, 2, D).
    """
    c0 = points[jnp.argmin(jnp.sum(points, axis=-1))]
    c1 = points[jnp.argmax(jnp.sum(jnp.square(points - c0), axis=-1))]
    inits = [jnp.stack([c0, c1])]
    med = jnp.median(points, axis=0)
    n, d = points.shape
    if d <= max_axis_splits:
        axes = range(d)
    else:
        var = jnp.var(points, axis=0)
        axes = jnp.argsort(-var)[:max_axis_splits]
    for ax in axes:
        lo = points[:, ax] <= med[ax]
        wlo = lo.astype(points.dtype)[:, None]
        mlo = jnp.sum(points * wlo, axis=0) / jnp.maximum(jnp.sum(wlo), 1.0)
        mhi = jnp.sum(points * (1 - wlo), axis=0) / jnp.maximum(jnp.sum(1 - wlo), 1.0)
        inits.append(jnp.stack([mlo, mhi]))
    return jnp.stack(inits)


def kmeans2(points, iters=20):
    """2-means on (N,D) float points; returns (labels, centers).

    Runs Lloyd from the deterministic restart set and keeps the
    lowest-inertia solution, mirroring cv2.kmeans' attempts=10 /
    sklearn's n_init=10 without randomness.
    """
    points = points.astype(jnp.float32)

    def run(init):
        labels, centers = _lloyd(points, init, iters)
        d = jnp.sum(jnp.square(points - centers[labels]), axis=-1)
        return labels, centers, jnp.sum(d)

    labels, centers, inertia = jax.vmap(run)(_candidate_inits(points))
    best = jnp.argmin(inertia)
    return labels[best], centers[best]


def kmeans_mask_ours(img_u8, attention):
    """The reference `kmeans` blend branch (utils.py:118-140): modulate the
    image by the normalized attention, quantize, cluster pixel triplets with
    k=2, paint clusters with their (uint8) center values, Otsu the result.

    Returns a {0,255} uint8 mask. The reference's reshape(-1, 3) groups three
    consecutive *pixels* as one point — reproduced as-is for parity. Unlike
    threshold(), kmeans() does NOT min-max the attention: it scales the raw
    map by its max (utils.py:121).
    """
    from .threshold import mult_blend_u8, otsu_binary_u8

    result = mult_blend_u8(img_u8, attention)
    pts = result.reshape(-1, 3).astype(jnp.float32)
    labels, centers = kmeans2(pts)
    centers_u8 = centers.astype(jnp.uint8)
    painted = centers_u8[labels].reshape(result.shape)
    mask, _ = otsu_binary_u8(painted)
    return mask


def kmeans_mask_image(img_u8):
    """The `kmeans` original-image branch (utils.py:141-155): cluster the raw
    grayscale pixel triplets, paint, Otsu."""
    from .threshold import otsu_binary_u8

    pts = img_u8.reshape(-1, 3).astype(jnp.float32)
    labels, centers = kmeans2(pts)
    painted = centers.astype(jnp.uint8)[labels].reshape(img_u8.shape)
    mask, _ = otsu_binary_u8(painted)
    return mask


def kmeans_feature_mask(features, gray_u8=None):
    """kmeans_feature (utils.py:171-197): z-score the per-pixel feature
    vectors (torch unbiased std), 2-means, return the {0,255} label map.

    features: (H, W, D) — typically bilinearly-upsampled last-block keys
    (eval.py:186-202). Cluster identity is arbitrary in the reference
    (whichever label sklearn's random init assigned). Documented delta:
    when ``gray_u8`` (H, W) is given, polarity is fixed by an unsupervised
    rule — the cluster whose pixels have the higher mean gray intensity
    becomes foreground (255), matching the bright-is-foreground convention
    cv2.THRESH_BINARY Otsu implies everywhere else in the pipeline. No
    ground-truth label is consulted.
    """
    h, w, d = features.shape
    pts = features.reshape(-1, d).astype(jnp.float32)
    mean = jnp.mean(pts, axis=0)
    std = jnp.std(pts, axis=0, ddof=1)
    pts = (pts - mean) / jnp.maximum(std, 1e-12)
    labels, _ = kmeans2(pts, iters=30)
    labels = labels.reshape(h, w)
    if gray_u8 is not None:
        g = gray_u8.astype(jnp.float32).reshape(h, w)
        on = labels.astype(jnp.float32)
        m1 = jnp.sum(g * on) / jnp.maximum(jnp.sum(on), 1.0)
        m0 = jnp.sum(g * (1 - on)) / jnp.maximum(jnp.sum(1 - on), 1.0)
        labels = jnp.where(m1 >= m0, labels, 1 - labels)
    return labels.astype(jnp.uint8) * jnp.uint8(255)
