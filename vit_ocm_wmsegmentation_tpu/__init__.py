"""TPU-native white-matter OCM segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
linum-uqam/ViT-OCM-WMSegmentation (MLMI-2023): unsupervised segmentation of
optical coherence microscopy images by thresholding the self-attention maps of
a DINO ViT-S/8, plus SimMIM pretraining, sliding-window gigapixel inference,
classical segmentation back-ends, supervised UNet / linear-probing baselines,
pseudo-ground-truth distillation, and the Allen-brain side experiments.

Design: pure-function models (params as pytrees), all per-image post-processing
fused into jitted XLA graphs, tile batches sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # The TPU-relay sitecustomize calls jax.config.update("jax_platforms",
    # "axon,cpu") at interpreter startup, clobbering an explicit
    # JAX_PLATFORMS=cpu from the environment. That made every fresh
    # subprocess (CLI --help smoke tests, tools run with the env var) try to
    # initialize the axon backend first — a ~25-min blocking hang whenever
    # the relay is unreachable. Re-assert the caller's explicit CPU request
    # here, before any backend is initialized; no-op when the relay is the
    # intended target (JAX_PLATFORMS is then "axon" or unset).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    del _jax

_SUBMODULES = (
    "nn",
    "pipeline",
    "evaluation",
    "native",
    "models",
    "ops",
    "parallel",
    "data",
    "train",
    "utils",
)


def __getattr__(name):
    """Lazy submodule access: `import vit_ocm_wmsegmentation_tpu as ocm;
    ocm.pipeline.segment_mosaic(...)` without importing jax at package
    import time."""
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
