"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of the reference's GRID_H x GRID_W torchrun
env tests (ref: tests/distributed/tests_fft.py) — distributed paths are
exercised via jax.sharding over host-platform devices.
"""

import os

# must be set before jax initializes a backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# the environment may pre-register an accelerator backend (and force
# jax_platforms programmatically); pin tests to the host CPU platform
jax.config.update("jax_platforms", "cpu")
