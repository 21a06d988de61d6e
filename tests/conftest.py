import os
import sys

# Multi-device CPU mesh for all tests. The image's sitecustomize imports jax
# at interpreter start with JAX_PLATFORMS=axon (real tunneled TPU), so env
# vars are too late — override through jax.config instead. XLA_FLAGS must be
# set before the CPU backend initializes.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference/ruzstd"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference corpus not mounted at /root/reference",
)
