"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a simulated 8-device CPU mesh (the standard
TPU-less mesh simulation, SURVEY.md §4). NOTE: this image's TPU plugin
ignores the JAX_PLATFORMS env var, so we force CPU through jax.config too.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
