"""utils/backend.py: outage-bounded backend probing."""

import numpy as np  # noqa: F401  (conftest parity)

from instancediff_tpu.utils import backend


def test_noop_when_platform_pinned_cpu():
    """Under the CPU test env (JAX_PLATFORMS=cpu) probing must be a no-op —
    drivers call this before jax import and tests must never probe the
    tunnel."""
    assert backend._platform_forced_off_tpu() is True
    assert backend.wait_for_backend() is True  # returns immediately


def test_transient_error_classifier():
    assert backend.is_transient_backend_error(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE"))
    assert backend.is_transient_backend_error(
        RuntimeError("Backend 'axon' is not in the list of known backends"))
    assert not backend.is_transient_backend_error(ValueError("shape mismatch"))


def test_probe_failure_bounded(monkeypatch):
    """When probes fail the wait is bounded and returns False."""
    calls = []

    def fake_run(*a, **k):
        calls.append(1)

        class R:
            returncode = 1
        return R()

    monkeypatch.setattr(backend, "_platform_forced_off_tpu", lambda: False)
    monkeypatch.setattr(backend.subprocess, "run", fake_run)
    monkeypatch.setattr(backend.time, "sleep", lambda s: None)
    assert backend.wait_for_backend(probes=3) is False
    assert len(calls) == 3
