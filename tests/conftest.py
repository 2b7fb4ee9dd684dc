"""Test configuration: CPU-jit, 8 virtual devices for multi-chip tests.

The standard JAX substitute for "multi-node without a real cluster": force the
host platform and split it into 8 virtual devices so `Mesh`/`shard_map` paths
compile and execute exactly as they would on a TPU slice.

Note: the TPU tunnel's sitecustomize imports jax at interpreter start, so
env-var overrides are too late — `jax.config.update` before first backend use
is the reliable switch.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
