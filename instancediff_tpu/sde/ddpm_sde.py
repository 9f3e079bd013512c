"""Conditional DDPM SDE — the baseline diffusion used by the reference's
``CLIPDDPMModel`` mode (config.yml:149-167,176-180: ``max_sigma: 1, T: 100,
schedule: cosine_alpha``; module itself missing upstream, SURVEY.md SS2.9c).

Standard variance-preserving DDPM on the clean image, conditioned on the
degraded input through the network (which sees the condition as its second
input channel):
    x_t = sqrt(abar_t) * x0 + sqrt(1 - abar_t) * eps
Reverse: ancestral DDPM step from the single noise net, run as one
``lax.scan``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedules import make_cosine_alphas_bar

# predict_fn(x_t, t[B]) -> pred_noise [B,1,H,W]
NoisePredictFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class DDPMSDE:
    def __init__(self, T: int = 100, max_sigma: float = 1.0, schedule: str = "cosine_alpha"):
        self.T = int(T)
        self.max_sigma = float(max_sigma)
        self.schedule_name = schedule
        if schedule != "cosine_alpha":
            raise ValueError(f"unsupported ddpm schedule '{schedule}'")
        self.alphas_bar = make_cosine_alphas_bar(self.T)  # [T+1], abar[0]=1
        abar = self.alphas_bar
        self.alphas = abar[1:] / abar[:-1]  # [T], alpha_t for t=1..T
        self.betas = 1.0 - self.alphas

    def forward_diffusion(self, key, x0, mu=None):
        """Sample (t, x_t, std_noise). ``mu`` is unused by the forward process
        (kept for drift-SDE signature compatibility; the condition enters the
        network, not the noising)."""
        B = x0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 1, self.T + 1)
        eps = jax.random.normal(kn, x0.shape, dtype=x0.dtype)
        bshape = (B,) + (1,) * (x0.ndim - 1)
        abar = self.alphas_bar[t].reshape(bshape).astype(x0.dtype)
        x_t = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * self.max_sigma * eps
        return t.reshape(bshape), x_t, eps

    def reverse_ddpm(self, key, mu, predict_fn: NoisePredictFn, shape=None):
        """T-step ancestral sampling from pure noise, conditioned through the
        net. One jitted ``lax.scan``."""
        shape = mu.shape if shape is None else shape
        B = shape[0]
        k_init, k_loop = jax.random.split(key)
        x_T = jax.random.normal(k_init, shape, dtype=mu.dtype) * self.max_sigma
        step_keys = jax.random.split(k_loop, self.T)

        abar = self.alphas_bar

        # max_sigma generalisation: with x_t = sqrt(abar_t) x0 +
        # s*sqrt(1-abar_t) eps (s = max_sigma), the posterior mean coefficients
        # are unchanged (s^2 cancels) but the eps term and the posterior
        # variance pick up s and s^2 respectively.
        s = jnp.asarray(self.max_sigma)

        def body(x, inp):
            t_scalar, k = inp
            t_b = jnp.full((B,), t_scalar, dtype=jnp.int32)
            eps_hat = predict_fn(x, t_b)
            a_t = (abar[t_scalar] / abar[t_scalar - 1]).astype(x.dtype)
            abar_t = abar[t_scalar].astype(x.dtype)
            abar_p = abar[t_scalar - 1].astype(x.dtype)
            beta_t = 1.0 - a_t
            s_ = s.astype(x.dtype)
            mean = (x - s_ * beta_t / jnp.sqrt(1.0 - abar_t) * eps_hat) / jnp.sqrt(a_t)
            var = s_ * s_ * beta_t * (1.0 - abar_p) / (1.0 - abar_t)
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            x_next = mean + jnp.where(t_scalar > 1, jnp.sqrt(var), 0.0) * z
            return x_next, None

        ts = jnp.arange(self.T, 0, -1, dtype=jnp.int32)
        x0, _ = jax.lax.scan(body, x_T, (ts, step_keys))
        return x0

    def set_gpu(self, device=None):  # pragma: no cover - trivial
        return self
