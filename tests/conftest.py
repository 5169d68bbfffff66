"""Test env: force the CPU backend with 8 virtual devices.

This is the standard JAX trick for exercising pjit/shard_map/collectives
without a TPU slice (SURVEY.md §4). Numeric tests also run on CPU so they are
deterministic and independent of the tunneled device.

Note: this image's sitecustomize imports jax at interpreter startup (axon PJRT
plugin), so env vars set here are too late — we must go through jax.config,
which works any time before the backend is first initialized.
"""

import os

import re

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in _flags:
    # REWRITE an ambient count rather than keep it: the parallel suite is
    # written for exactly 8 virtual devices, and an inherited =4 would fail
    # every make_mesh test with opaque mesh-size errors
    _flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                    "--xla_force_host_platform_device_count=8", _flags)
    os.environ["XLA_FLAGS"] = _flags
else:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
