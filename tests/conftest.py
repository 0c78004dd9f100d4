"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
run without TPU hardware (SURVEY.md section 4 test plan).

The container boots every interpreter with an `axon` TPU-tunnel plugin via a
sitecustomize on PYTHONPATH which exports JAX_PLATFORMS=axon; tests must run
on the virtual-CPU mesh instead.  Backends are initialized lazily, so
overriding the platform via jax.config before any computation is sufficient.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
