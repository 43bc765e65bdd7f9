"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no multi-device tests at all (SURVEY.md §4); we add what it
lacks: every sharding-aware test sees 8 XLA host-platform devices so pod
behavior is exercised without TPU hardware.  Set PBRT_TPU_TEST_TPU=1 to run
the suite on real accelerators instead.

Note: in this image jax is pre-imported (sitecustomize) with
``JAX_PLATFORMS=axon`` pointing at a remote TPU; compiles over that tunnel
take tens of seconds, so unit tests must switch the platform *before any
backend is initialized* — config.update still works at conftest time.
"""

import os

if os.environ.get("PBRT_TPU_TEST_TPU", "0") in ("", "0"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
