"""TPU backend availability helpers.

The tunneled axon plugin on this class of host exhibits two failure modes
around chip handoffs/outages (observed repeatedly; see CLAUDE.md):
  * PJRT client init HANGS (often ignoring SIGTERM) for 20+ minutes,
  * or raises UNAVAILABLE / "not in the list of known backends".

Drivers call :func:`wait_for_backend` before first device use so a user's
``trainUM.py``/``testUM.py``/``bench.py`` degrades into a bounded, logged
retry loop instead of a silent hang. Probing runs ``jax.devices()`` in a
KILLABLE subprocess (a hung in-process init cannot be recovered — a failed
PJRT init poisons the in-process backend cache).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def is_transient_backend_error(e: Exception) -> bool:
    """Transient tunnel failures: right after another process frees the chip
    the plugin reports 'not in the list of known backends'; during outages
    init raises (or hangs then raises) UNAVAILABLE setup/compile errors."""
    msg = str(e)
    return ("known backends" in msg or "UNAVAILABLE" in msg
            or "Unable to initialize backend" in msg)


def _platform_forced_off_tpu() -> bool:
    # Deliberately do NOT trust the JAX_PLATFORMS env var: the axon plugin
    # ignores it (CLAUDE.md), so an env-var 'cpu' process still inits the
    # tunnel and needs the bounded probe. Only an in-process jax whose
    # CONFIG pins a non-TPU platform (tests, --platform users) is safe.
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            cfg = jax.config.jax_platforms or ""
            return cfg != "" and "tpu" not in cfg and "axon" not in cfg
        except Exception:
            pass
    return False


def wait_for_backend(probes: int = 5, probe_timeout: int = 240,
                     sleep_s: int = 30) -> bool:
    """Probe ``jax.devices()`` in a killable subprocess until it answers.

    Returns True when a probe succeeded, False when all probes failed (the
    caller proceeds and lets the real init surface the error). No-op when
    the environment pins a non-TPU platform (CPU tests/dev boxes).
    """
    if _platform_forced_off_tpu():
        return True
    for attempt in range(probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, env=os.environ)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"TPU backend probe {attempt + 1}/{probes} failed; "
              f"retrying in {sleep_s}s", file=sys.stderr)
        time.sleep(sleep_s)
    return False
