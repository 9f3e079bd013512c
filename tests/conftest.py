"""Test config: force an 8-device virtual CPU mesh so distributed paths are
exercised without TPU hardware (SURVEY.md SS4's fake-backend analogue)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin overrides jax_platforms to "axon,cpu" at import time,
# ignoring the env var — force CPU explicitly before any backend init.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
