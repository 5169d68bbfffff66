"""Shared CLI plumbing for the entry-point scripts.

The repo-root scripts (eval.py, mim.py, analyse_attention.py, ...) preserve
the reference's public flag names and behavior; this module holds what they
share: arch resolution, weight loading, and output helpers.
"""

from __future__ import annotations

import os

import numpy as np

from .models.vit import ARCHS, ViTConfig
from .train.checkpoint import load_pretrained


def enable_compile_cache(path: str = "/tmp/jax_cache"):
    """Persistent XLA compile cache: repeated CLI invocations skip the
    (remote, sometimes slow) compiles entirely. Safe no-op on failure."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass


def build_vit_config(arch: str, patch_size: int) -> ViTConfig:
    if arch not in ARCHS:
        raise SystemExit(f"unknown arch {arch!r}; choices: {sorted(ARCHS)}")
    return ARCHS[arch](patch_size=patch_size)


def load_model(arch: str, patch_size: int, pretrained_weights: str = "",
               checkpoint_key: str = "teacher", seed: int = 0):
    """(params, cfg, source). Resolution order mirrors eval.py:67-94."""
    cfg = build_vit_config(arch, patch_size)
    params, source = load_pretrained(cfg, arch, pretrained_weights, checkpoint_key, seed)
    if source == "random":
        print("There is no reference weights available for this model => We use random weights.")
    else:
        print(f"Pretrained weights loaded from {source}")
    return params, cfg, source


def str2bool(v) -> bool:
    """argparse type for NEW boolean flags: 'False'/'0'/'no'/'' parse falsy.
    (Flags replicated from the reference keep its type=bool quirk, where
    any non-empty string — including 'False' — is True.)"""
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() not in ("", "false", "0", "no", "n", "f")


def create_dir(path: str):
    os.makedirs(path, exist_ok=True)


def imsave(fname: str, arr, cmap=None):
    """matplotlib-compatible image save (the reference saves everything with
    plt.imsave; we keep the same colormap behavior: 2D arrays get viridis by
    default, cmap='gray' for masks)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    arr = np.asarray(arr)
    plt.imsave(fname=fname, arr=arr, format="png", cmap=cmap)
    print(f"{fname} saved.")


_VIRIDIS_LUT = None


def viridis_lut() -> np.ndarray:
    """(256, 3) uint8 viridis table, byte-identical to matplotlib's."""
    global _VIRIDIS_LUT
    if _VIRIDIS_LUT is None:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        # integer input indexes the LUT directly; bytes=True applies
        # matplotlib's own float->uint8 conversion (truncating, not rounding)
        _VIRIDIS_LUT = plt.get_cmap("viridis")(np.arange(256), bytes=True)[:, :3]
    return _VIRIDIS_LUT


def imsave_fast(fname: str, arr_u8, cmap=None):
    """Direct PIL encode for hot loops — plt.imsave renders a full
    matplotlib figure per call (~2.5 s per 1152 px map on a 1-core host,
    measured; the dominant cost of streaming inference). ``cmap=None``
    treats ``arr_u8`` as viridis LUT indices (matplotlib's default-colormap
    semantics for 2-D saves); 'gray' writes the uint8 plane as-is."""
    from PIL import Image as PILImage

    arr_u8 = np.asarray(arr_u8, dtype=np.uint8)
    if cmap == "gray":
        im = PILImage.fromarray(arr_u8, mode="L")
    else:
        im = PILImage.fromarray(viridis_lut()[arr_u8])
    # PNG bytes regardless of extension, lossless masks — same content
    # convention as imsave() above (plt.imsave format="png"); level 1 keeps
    # encoding off the critical path
    im.save(fname, format="PNG", compress_level=1)


def save_threshold_outputs(output_directory: str, img_u8, attention, name: str | None = None):
    """Replicates threshold()'s save side effects (utils.py:83-115) and
    returns the three masks."""
    import jax.numpy as jnp

    from .ops.threshold import blend_ours, threshold_ours

    blend_u8, attn_u8 = blend_ours(jnp.asarray(img_u8), jnp.asarray(attention))
    th, th2, th3 = threshold_ours(jnp.asarray(img_u8), jnp.asarray(attention))
    imsave(os.path.join(output_directory, "result.png"), np.asarray(blend_u8))
    subdir = ""
    if name is not None:
        subdir = name + "/"
        create_dir(os.path.join(output_directory, subdir))
    imsave(os.path.join(output_directory, subdir, "OTSU_th_average.png"), np.asarray(th), cmap="gray")
    imsave(os.path.join(output_directory, "OTSU_th_original.png"), np.asarray(th2), cmap="gray")
    imsave(os.path.join(output_directory, "weighted_iamge_attention.png"), np.asarray(blend_u8), cmap="gray")
    imsave(os.path.join(output_directory, "heatmap_otsu_attention.png"), np.asarray(th3), cmap="gray")
    imsave(os.path.join(output_directory, "temp.png"), np.asarray(attn_u8))
    return np.asarray(th), np.asarray(th2), np.asarray(th3)
