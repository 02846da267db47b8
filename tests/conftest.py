"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this environment overrides the JAX_PLATFORMS env var,
so we additionally force the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
