"""Legacy mean-reverting IR-SDE (the published SDE this work builds on).

Parity with reference utils/sde_utils.py:81-342 (the only SDE whose full
source survives upstream — kept both for capability parity and as an
executable cross-check for the drift SDE's algebra).

Math (sde_utils.py:126-214):
    theta_t:      per-step reversion rate (constant / linear / cosine family)
    sigma_t^2   = 2 * max_sigma^2 * theta_t
    thetabar_t  = cumsum(theta)
    sigmabar_t  = sqrt(max_sigma^2 * (1 - exp(-2 * thetabar_t * dt)))
    dt          = -log(eps) / thetabar_T
    mean_t      = mu + (x0 - mu) * exp(-thetabar_t * dt)
    forward:      x_t ~ N(mean_t, sigmabar_t^2)
    score        = -noise / sigmabar_t
    reverse SDE:  x <- x - [theta_t (mu - x) - sigma_t^2 * score] dt
                        (+ sigma_t sqrt(dt) z for the stochastic variant)
    optimum step: posterior mean of x_{t-1} | x_t, x0.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class IRSDE:
    def __init__(self, max_sigma=0.4, T=100, schedule="cosine", eps=0.01):
        # schedule construction is the reference's _initialize verbatim
        # (sde_utils.py:91-152; golden-tested table-for-table in
        # tests/test_irsde_golden.py): T+1 theta entries, index 0 "never
        # used"; the /255 convention and default eps=0.01 included
        self.T = int(T)
        self.max_sigma = float(max_sigma) / 255.0 if max_sigma >= 1 else float(max_sigma)
        self.schedule_name = schedule
        if schedule == "constant":
            thetas = np.ones(T + 1, dtype=np.float64)
        elif schedule == "linear":
            scale = 1000.0 / (T + 1)
            thetas = np.linspace(scale * 1e-4, scale * 0.02, T + 1,
                                 dtype=np.float64)
        elif schedule == "cosine":
            s, steps = 0.008, T + 2
            x = np.linspace(0, steps, steps + 1, dtype=np.float64)
            ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
            ac = ac / ac[0]
            thetas = 1.0 - ac[1:-1]  # the reference's 1 - alphabar betas
        else:
            raise ValueError(f"unknown IR-SDE schedule '{schedule}'")
        thetas_cum = np.cumsum(thetas) - thetas[0]  # cumsum[0] = 0
        self.dt = float(-np.log(eps) / thetas_cum[-1])
        self.thetas = jnp.asarray(thetas, dtype=jnp.float32)
        self.thetas_cum = jnp.asarray(thetas_cum, dtype=jnp.float32)
        sigma_bars = np.sqrt(self.max_sigma**2 * (1.0 - np.exp(-2.0 * thetas_cum * self.dt)))
        self.sigma_bars = jnp.asarray(sigma_bars, dtype=jnp.float32)
        self.sigmas = jnp.sqrt(2.0 * self.max_sigma**2 * self.thetas)

    def mu_bar(self, x0, mu, t):
        decay = jnp.exp(-self.thetas_cum[t] * self.dt)
        decay = decay.reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
        return mu + (x0 - mu) * decay

    def forward_diffusion(self, key, x0, mu):
        """Sample (t, x_t, std_noise) from the closed-form forward marginal
        (the analogue of generate_random_states, sde_utils.py:322-338)."""
        B = x0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 1, self.T + 1)
        eps = jax.random.normal(kn, x0.shape, dtype=x0.dtype)
        bshape = (B,) + (1,) * (x0.ndim - 1)
        mean = self.mu_bar(x0, mu, t)
        sbar = self.sigma_bars[t].reshape(bshape).astype(x0.dtype)
        x_t = mean + sbar * eps
        return t.reshape(bshape), x_t, eps

    def score_from_noise(self, noise_hat, t):
        sbar = self.sigma_bars[t].reshape((-1,) + (1,) * (noise_hat.ndim - 1))
        return -noise_hat / jnp.maximum(sbar, 1e-12).astype(noise_hat.dtype)

    def reverse_sde(self, key, mu, noise_fn: Callable, stochastic=True,
                    return_states=False):
        """T-step reverse SDE loop as one ``lax.scan``
        (legacy analogue: sde_utils.py:244-261). ``noise_fn(x, t[B]) ->
        predicted std noise``.

        ``return_states=True`` additionally returns the per-step trajectory
        stacked [T, ...] — the functional analogue of the reference's
        ``save_states`` PNG dumps (sde_utils.py:251-259); the caller decides
        how to persist them (no filesystem IO inside the jitted loop)."""
        B = mu.shape[0]
        x_T = mu + self.max_sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)
        k_loop = jax.random.fold_in(key, 1)
        step_keys = jax.random.split(k_loop, self.T)

        def body(x, inp):
            t_scalar, k = inp
            t_b = jnp.full((B,), t_scalar, dtype=jnp.int32)
            noise_hat = noise_fn(x, t_b)
            score = self.score_from_noise(noise_hat, t_b)
            theta = self.thetas[t_scalar].astype(x.dtype)
            sigma2 = (2.0 * self.max_sigma**2 * self.thetas[t_scalar]).astype(x.dtype)
            drift = theta * (mu - x) * self.dt
            rev_drift = drift - sigma2 * score * self.dt
            x_next = x - rev_drift
            if stochastic:
                z = jax.random.normal(k, x.shape, dtype=x.dtype)
                x_next = x_next + jnp.sqrt(sigma2 * self.dt) * z * jnp.where(t_scalar > 1, 1.0, 0.0)
            return x_next, x_next if return_states else None

        ts = jnp.arange(self.T, 0, -1, dtype=jnp.int32)
        x0, states = jax.lax.scan(body, x_T, (ts, step_keys))
        return (x0, states) if return_states else x0

    def reverse_ode(self, key, mu, noise_fn: Callable, return_states=False):
        """Deterministic probability-flow loop (sde_utils.py:263-279): the
        reverse drift uses HALF the diffusion term and injects no noise."""
        B = mu.shape[0]
        x_T = mu + self.max_sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)

        def body(x, t_scalar):
            t_b = jnp.full((B,), t_scalar, dtype=jnp.int32)
            score = self.score_from_noise(noise_fn(x, t_b), t_b)
            theta = self.thetas[t_scalar].astype(x.dtype)
            sigma2 = (2.0 * self.max_sigma**2 * self.thetas[t_scalar]).astype(x.dtype)
            rev_drift = (theta * (mu - x) - 0.5 * sigma2 * score) * self.dt
            x_next = x - rev_drift
            return x_next, x_next if return_states else None

        ts = jnp.arange(self.T, 0, -1, dtype=jnp.int32)
        x0, states = jax.lax.scan(body, x_T, ts)
        return (x0, states) if return_states else x0

    def ode_sampler(self, x_T, mu, noise_fn: Callable, rtol=1e-5, atol=1e-5,
                    eps=1e-3):
        """Black-box adaptive ODE solve of the probability-flow ODE
        (sde_utils.py:282-306). TPU-native equivalent of scipy
        ``solve_ivp(..., method='RK45')``: ``jax.experimental.ode.odeint``
        (adaptive Dormand-Prince RK45) — the whole solve stays on device
        instead of round-tripping flattened numpy arrays through the host.

        Integrates s = T - t from 0 to T - eps; schedules are interpolated
        continuously, the net is called with the rounded integer step."""
        from jax.experimental.ode import odeint

        B = x_T.shape[0]
        t_grid = jnp.arange(0, self.T + 1, dtype=jnp.float32)

        def dx_ds(x, s):
            t_cont = jnp.asarray(self.T, jnp.float32) - s
            t_idx = jnp.clip(jnp.round(t_cont).astype(jnp.int32), 1, self.T)
            t_b = jnp.full((B,), t_idx, dtype=jnp.int32)
            score = self.score_from_noise(noise_fn(x, t_b), t_b)
            theta = jnp.interp(t_cont, t_grid, self.thetas).astype(x.dtype)
            sigma2 = (2.0 * self.max_sigma**2 * theta).astype(x.dtype)
            # discrete loop: x(t-1) = x(t) - rev_drift, i.e. dx/dt = +rev_drift;
            # with s = T - t, dx/ds = -rev_drift
            return -(theta * (mu - x) - 0.5 * sigma2 * score) * self.dt

        s_span = jnp.asarray([0.0, self.T - eps], dtype=jnp.float32)
        ys = odeint(dx_ds, x_T, s_span, rtol=rtol, atol=atol)
        return ys[-1]

    def reverse_optimum_step(self, x_t, x0, t):
        """Posterior-mean step (sde_utils.py:206-214): optimal x_{t-1} given
        x_t and the true x0."""
        bshape = (-1,) + (1,) * (x_t.ndim - 1)
        A = jnp.exp(-self.thetas[t] * self.dt).reshape(bshape).astype(x_t.dtype)
        B_ = jnp.exp(-self.thetas_cum[t] * self.dt).reshape(bshape).astype(x_t.dtype)
        C = jnp.exp(-self.thetas_cum[t - 1] * self.dt).reshape(bshape).astype(x_t.dtype)
        sbar_t = self.sigma_bars[t].reshape(bshape).astype(x_t.dtype)
        sbar_p = self.sigma_bars[t - 1].reshape(bshape).astype(x_t.dtype)
        term1 = A * (sbar_p**2) / jnp.maximum(sbar_t**2, 1e-12) * x_t
        term2 = C * (1.0 - A**2 * (sbar_p**2) / jnp.maximum(sbar_t**2, 1e-12)) * x0
        # both terms are defined relative to mu; caller passes x - mu residuals
        return term1 + term2
