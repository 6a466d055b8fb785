"""Root conftest: force the test suite onto a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers a remote TPU PJRT
backend at interpreter start (before any conftest runs), pinning the
JAX_PLATFORMS *env var*. Backends initialize lazily though, so flipping the
platform through the config API here — before any jax.devices() call — still
lands the suite on CPU. Multi-chip sharding tests rely on the 8 virtual host
devices (SURVEY.md §4: replaces the reference's missing distributed-test
story). Set F_LITE_TPU_TEST_ON_TPU=1 to opt out and test on real hardware.
"""

import os

if not os.environ.get("F_LITE_TPU_TEST_ON_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
