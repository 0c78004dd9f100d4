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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables after each test module.

    The full suite compiles hundreds of XLA programs in one process; the
    CPU client eventually segfaults inside backend_compile_and_load when
    the accumulated live executables exhaust a process resource (observed
    at ~96% of the suite with 127 GB RAM free - resource-map pressure,
    not OOM; any tail subset passes).  Dropping caches at module
    boundaries keeps the live-executable population bounded; modules
    recompile their own shapes anyway.
    """
    yield
    jax.clear_caches()
