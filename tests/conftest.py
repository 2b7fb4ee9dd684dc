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

# PTRE_TEST_TPU=1 keeps the real accelerator visible so the kernel smoke
# tests exercise the compiled Pallas paths on the chip (seconds each)
# instead of interpret mode. Intended for running that module alone
# (`PTRE_TEST_TPU=1 pytest tests/test_kernel_smoke.py`): the multi-device
# mesh tests expect the 8 virtual CPU devices this switch removes.
_USE_REAL_TPU = os.environ.get("PTRE_TEST_TPU", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if not _USE_REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _USE_REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
