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

# Persistent compile cache: full-model fixtures cost minutes of XLA:CPU
# compile per pytest process on this 1-vCPU host; cache entries are keyed
# to the boot (utils/cache.py) so a VM migration starts cold instead of
# loading AOT code compiled for another CPU's features.
from pdfnet_tpu.utils.cache import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir(
    "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
