"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host-platform virtual devices
(``xla_force_host_platform_device_count``); real-TPU perf is exercised by
``bench.py`` instead. The axon sitecustomize pins ``jax_platforms`` to the TPU
backend, so we must override programmatically after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Exact-parity tests compare fp32 against torch; keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")
