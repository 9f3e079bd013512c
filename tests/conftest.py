"""Test config: force an 8-device virtual CPU mesh so distributed paths are
exercised without TPU hardware (SURVEY.md SS4's fake-backend analogue)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
