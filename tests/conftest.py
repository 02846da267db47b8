"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this environment overrides the JAX_PLATFORMS env var,
so we additionally force the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU kills the process when a collective's participants arrive
    # more than 40s apart ("Termination timeout ... exceeded", SIGABRT).
    # On a 1-vCPU host running 8 virtual devices the arrival spread of a
    # grad all-reduce is easily minutes — raise both timeouts.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
