"""Optional Weights & Biases: real client when installed, no-op shim when not.

Every trainable reference entry logs to W&B (mim.py:84-91, eval.py:258-282,
unet.py:30-41, ...); this keeps those call sites working in offline images.
"""

from __future__ import annotations


class _NoOpWandb:
    def __getattr__(self, name):
        def _noop(*args, **kwargs):
            return None

        return _noop

    class Image:  # wandb.Image(...) placeholder
        def __init__(self, *args, **kwargs):
            pass


def get_wandb(enabled: bool):
    """Returns (wandb_module_or_shim, actually_enabled)."""
    if not enabled:
        return _NoOpWandb(), False
    try:
        import wandb

        return wandb, True
    except ImportError:
        return _NoOpWandb(), False
