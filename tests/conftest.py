"""Test configuration: run on a virtual 8-device CPU mesh.

The environment ships an 'axon' TPU plugin that overrides the JAX_PLATFORMS
env var, so the platform must be forced through jax.config after import (but
before any backend initialization).  XLA_FLAGS still must be set before the
CPU backend spins up to get 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
