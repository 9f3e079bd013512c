"""Diffusion schedule families.

The drift SDE is parameterised by two monotone schedules s(0)=0 -> s(T)=1
(``drift_schedule`` and ``noise_schedule``; reference config.yml:170-175 uses
'sigmoid' for both). The cosine family matches the reference helper
``get_drift_deferential_cosine`` (drift_noise_model.py:10-16):
``(1 - cos(t*pi/T)) / 2``. ``cosine_alpha`` is the DDPM alpha-bar cosine
schedule used by the DDPM baseline (config.yml:176-180).

All schedules are returned as float32 ``jnp`` arrays of shape [T+1] so a
per-sample integer ``t`` in [0, T] can gather its level inside a jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SCHEDULE_NAMES = ("linear", "cosine", "sigmoid", "constant")


def make_schedule(name: str, T: int, sigmoid_scale: float = 6.0) -> jnp.ndarray:
    """Monotone level schedule s[t], s[0]=0, s[T]=1, shape [T+1]."""
    t = np.arange(T + 1, dtype=np.float64)
    if name == "linear":
        s = t / T
    elif name == "cosine":
        s = (1.0 - np.cos(t * np.pi / T)) / 2.0
    elif name == "sigmoid":
        a = sigmoid_scale
        raw = 1.0 / (1.0 + np.exp(-a * (2.0 * t / T - 1.0)))
        lo = 1.0 / (1.0 + np.exp(a))
        hi = 1.0 / (1.0 + np.exp(-a))
        s = (raw - lo) / (hi - lo)
    elif name == "constant":
        # degenerate family from the legacy IR-SDE theta options
        # (utils/sde_utils.py:94-124): full level from the first step on.
        s = np.ones_like(t)
        s[0] = 0.0
    else:
        raise ValueError(f"unknown schedule '{name}' (choose from {SCHEDULE_NAMES})")
    # exact endpoints regardless of float error
    s[0], s[-1] = 0.0, 1.0
    return jnp.asarray(s, dtype=jnp.float32)


def make_cosine_alphas_bar(T: int, s: float = 0.008) -> jnp.ndarray:
    """DDPM 'cosine_alpha' schedule: alpha_bar[t], shape [T+1], alpha_bar[0]=1.

    Standard improved-DDPM cosine alpha-bar (the 'cosine_alpha' entry at
    reference config.yml:180)."""
    t = np.arange(T + 1, dtype=np.float64)
    f = np.cos((t / T + s) / (1 + s) * np.pi / 2.0) ** 2
    abar = f / f[0]
    abar = np.clip(abar, 1e-8, 1.0)
    return jnp.asarray(abar, dtype=jnp.float32)


def schedule_increment(schedule: jnp.ndarray) -> jnp.ndarray:
    """Per-step increments ds[t] = s[t] - s[t-1] (ds[0] = 0), shape [T+1].

    The cosine case reproduces the reference's per-step drift increment helper
    (drift_noise_model.py:10-16)."""
    ds = jnp.diff(schedule, prepend=schedule[:1])
    return ds


def strided_sampling_grid(T: int, sample_steps=None):
    """Reverse-sampler timestep grid: ``(t_hi, t_lo)`` arrays running
    T -> 0 over ``sample_steps`` (or all T) strided posterior pairs.
    Shared by DriftSDE.reverse_ddpm and DDPMSDE strided sampling."""
    import numpy as _np

    n_steps = T if sample_steps is None else int(sample_steps)
    grid = _np.unique(_np.round(
        _np.linspace(0, T, n_steps + 1)).astype(_np.int32))
    t_hi = jnp.asarray(grid[1:][::-1].copy())   # T ... first
    t_lo = jnp.asarray(grid[:-1][::-1].copy())  # ... 0
    return t_hi, t_lo
