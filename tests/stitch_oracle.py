"""Transliterated reference tiling/stitching algorithms, shared test oracles.

Not a test module (no test_* functions) — imported by test_stitch.py and
test_pipeline.py, like torch_oracle.py, so test modules never import each
other (works under any pytest import mode).
"""

import numpy as np


def _blend_v(top, bottom):
    w = np.linspace(1, 0, top.shape[0])[:, None]
    return top * w + bottom * (1 - w)


def _blend_h(left, right):
    w = np.linspace(1, 0, left.shape[1])[None, :]
    return left * w + right * (1 - w)


def concat_crops_blended_oracle(crops, stride, window):
    """sw_processing.py:113-134 for float crops."""
    n = int(np.sqrt(len(crops)))
    step = window - stride
    vertical = None
    for i in range(n):
        horizontal = crops[i * n]
        for j in range(1, n):
            left, right = horizontal, crops[i * n + j]
            overlap = _blend_h(left[:, -step:], right[:, :-stride])
            horizontal = np.concatenate([left[:, :-step], overlap, right[:, -stride:]], axis=1)
        if i == 0:
            vertical = horizontal
        else:
            top_overlap = _blend_v(vertical[-step:, :], horizontal[:-stride, :])
            vertical = np.concatenate([vertical[:-step, :], top_overlap, horizontal[-stride:, :]], axis=0)
    return vertical


def concat_crops_u8_oracle(crops, stride, window):
    """sw_processing.py:113-149 for uint8 crops: `overlap = np.zeros_like(top)`
    makes every blend truncate to uint8 before the next concatenate — the
    semantics the reference hits when re-stitching the IMAGE tiles (its
    attention tiles are float and take the float path above)."""
    n = int(np.sqrt(len(crops)))
    step = window - stride

    def blend_h(left, right):
        w = np.linspace(1, 0, left.shape[1])[None, :]
        return (left.astype(np.float64) * w + right.astype(np.float64) * (1 - w)).astype(np.uint8)

    def blend_v(top, bottom):
        w = np.linspace(1, 0, top.shape[0])[:, None]
        return (top.astype(np.float64) * w + bottom.astype(np.float64) * (1 - w)).astype(np.uint8)

    vertical = None
    for i in range(n):
        horizontal = crops[i * n]
        for j in range(1, n):
            left, right = horizontal, crops[i * n + j]
            overlap = blend_h(left[:, -step:], right[:, :-stride])
            horizontal = np.concatenate([left[:, :-step], overlap, right[:, -stride:]], axis=1)
        if i == 0:
            vertical = horizontal
        else:
            top_overlap = blend_v(vertical[-step:, :], horizontal[:-stride, :])
            vertical = np.concatenate([vertical[:-step, :], top_overlap, horizontal[-stride:, :]], axis=0)
    return vertical


def sliding_window_oracle(img, stride, window):
    """sw_processing.py:151-163 (PIL .size is (W,H); square here)."""
    crops = []
    for y in range(0, img.shape[0] - stride * 2, stride):
        for x in range(0, img.shape[1] - stride * 2, stride):
            crops.append(img[y : y + window, x : x + window])
    return crops


def concat_crops_overlap_oracle(crops, stride):
    """utils.py:319-347."""
    n = int(np.sqrt(len(crops)))
    s = stride * 2
    vertical = None
    for i in range(n):
        horizontal = crops[i * n]
        for j in range(1, n):
            left, right = horizontal, crops[i * n + j]
            overlap = left[:, -s:] // 2 + right[:, :s] // 2
            horizontal = np.concatenate([left[:, :-s], overlap, right[:, s:]], axis=1)
        if i == 0:
            vertical = horizontal
        elif i == n - 1:
            vertical = np.concatenate([vertical, horizontal[s:, :]], axis=0)
        else:
            top = vertical[-s:, :] // 2 + horizontal[:s, :] // 2
            vertical = np.concatenate([vertical[:-s, :], top, horizontal[s:, :]], axis=0)
    return vertical
