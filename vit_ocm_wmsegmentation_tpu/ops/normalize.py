"""Feature-map normalizers (rebuild of utils.py:426-449).

Used by the feature-analysis paths; all jnp, jittable, with the reference's
exact guards (epsilon on L1, zero-norm/std passthrough, per-row softmax with
additive epsilon when a row sums to zero).
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_normalize(feat_map):
    """x / (sum|x| + 1e-8)."""
    return feat_map / (jnp.sum(jnp.abs(feat_map)) + 1e-8)


def l2_normalize(x):
    """x / ||x||_2; zero-norm inputs pass through unchanged."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x)))
    return jnp.where(norm == 0, x, x / jnp.maximum(norm, 1e-38))


def zscore_normalize(x):
    """(x - mean) / std; zero-std inputs pass through unchanged."""
    mean = jnp.mean(x)
    std = jnp.std(x)
    return jnp.where(std == 0, x, (x - mean) / jnp.maximum(std, 1e-38))


def softmax_normalize(feat_map):
    """Row-wise exp(x) / sum(exp(x), axis=1): the reference adds 1e-8 to the
    exponentials when any row sums to zero (utils.py:444-449)."""
    e = jnp.exp(feat_map)
    row_sums = jnp.sum(e, axis=1, keepdims=True)
    e = jnp.where(jnp.any(row_sums == 0), e + 1e-8, e)
    return e / jnp.sum(e, axis=1, keepdims=True)
