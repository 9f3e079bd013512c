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

    def reverse_ddpm(self, key, mu, predict_fn: NoisePredictFn, shape=None,
                     sample_steps=None, eta=None, clip_x0=True):
        """Ancestral sampling from pure noise, conditioned through the net.
        One jitted ``lax.scan``.

        ``sample_steps < T`` runs the strided DDIM-family posterior over an
        evenly spaced timestep subset (same grid construction as
        ``DriftSDE.reverse_ddpm``); ``eta`` scales the fresh-noise std
        (eta=1, consecutive grid == the exact ancestral DDPM step; eta=0 ==
        deterministic DDIM).

        ``clip_x0`` clamps the per-step x0 estimate to [-1, 1] (the standard
        DDPM ``clip_denoised`` stabiliser). Sampling starts from PURE noise —
        unlike the drift sampler, which starts at the degraded image — so
        near t=T the 1/sqrt(abar_t) amplification feeds prediction error back
        through the loop; measured unclipped at 224px the state diverges to
        |x| ~ 1e2 (PSNR -52) while clipped sampling is stable."""
        shape = mu.shape if shape is None else shape
        B = shape[0]
        eta_v = 1.0 if eta is None else float(eta)
        k_init, k_loop = jax.random.split(key)
        x_T = jax.random.normal(k_init, shape, dtype=mu.dtype) * self.max_sigma

        from .schedules import strided_sampling_grid

        t_hi, t_lo = strided_sampling_grid(self.T, sample_steps)
        step_keys = jax.random.split(k_loop, len(t_hi))

        abar = self.alphas_bar

        # max_sigma generalisation: with x_t = sqrt(abar_t) x0 +
        # s*sqrt(1-abar_t) eps (s = max_sigma), the posterior mean coefficients
        # are unchanged (s^2 cancels) but the eps term and the posterior
        # variance pick up s and s^2 respectively.
        s = jnp.asarray(self.max_sigma)

        def body(x, inp):
            t_scalar, t_prev_scalar, k = inp
            t_b = jnp.full((B,), t_scalar, dtype=jnp.int32)
            eps_hat = predict_fn(x, t_b)
            abar_t = abar[t_scalar].astype(x.dtype)
            abar_p = abar[t_prev_scalar].astype(x.dtype)
            s_ = s.astype(x.dtype)
            # DDIM(eta) posterior between arbitrary grid neighbours:
            #   x0_hat = (x - s*sqrt(1-abar_t) eps_hat) / sqrt(abar_t)
            #   sigma  = eta * sqrt((1-abar_p)/(1-abar_t) * (1-abar_t/abar_p))
            #   x_prev = sqrt(abar_p) x0_hat
            #          + s*sqrt(1-abar_p-sigma^2) eps_hat + s*sigma z
            # For eta=1 on the consecutive grid this is algebraically the
            # exact ancestral DDPM transition (beta_t formulation).
            x0_hat = (x - s_ * jnp.sqrt(1.0 - abar_t) * eps_hat) / jnp.sqrt(abar_t)
            if clip_x0:
                x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
                # re-derive eps consistent with the clipped estimate so the
                # carry term matches the clipped-posterior-mean convention
                eps_hat = (x - jnp.sqrt(abar_t) * x0_hat) / (
                    s_ * jnp.sqrt(1.0 - abar_t))
            sigma2 = (eta_v**2 * (1.0 - abar_p) / (1.0 - abar_t)
                      * (1.0 - abar_t / abar_p))
            sigma2 = jnp.clip(sigma2, 0.0, 1.0 - abar_p)
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            noise_term = jnp.where(t_prev_scalar > 0, jnp.sqrt(sigma2), 0.0) * z
            carry = jnp.sqrt(jnp.clip(1.0 - abar_p - sigma2, 0.0, None))
            x_next = (jnp.sqrt(abar_p) * x0_hat
                      + s_ * carry * eps_hat + s_ * noise_term)
            return x_next, None

        x0, _ = jax.lax.scan(body, x_T, (t_hi, t_lo, step_keys))
        return x0

    def set_gpu(self, device=None):  # pragma: no cover - trivial
        return self
