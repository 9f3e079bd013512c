"""Drift SDE algebra tests: forward marginals against closed forms, and
reverse sampling with *oracle* predictors must reconstruct x0 exactly
(the SURVEY.md SS7 'validate on synthetic data where the true posterior is
known' mitigation for the missing upstream module)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.sde import DriftSDE, DDPMSDE, IRSDE, create_sde


def _toy_batch(key, B=2, H=8, W=8):
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (B, 1, H, W))
    mu = x0 + 0.5 * jax.random.normal(k2, (B, 1, H, W))
    return x0, mu


def test_forward_diffusion_contract():
    sde = DriftSDE(T=100, max_sigma=0.4)
    key = jax.random.key(0)
    x0, mu = _toy_batch(key)
    t, x_t, drift, std_noise, noise = sde.forward_diffusion(jax.random.key(1), x0, mu)
    assert t.shape == (2, 1, 1, 1)
    assert np.all(np.asarray(t) >= 1) and np.all(np.asarray(t) <= 100)
    # x_t decomposes exactly
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x0 + drift + noise), atol=1e-6)
    # drift is the scheduled instance-wise residual
    sd = sde.drift_schedule[t.reshape(-1)].reshape(2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(drift), np.asarray(sd * (mu - x0)), atol=1e-6)
    # noise std matches the schedule
    sig = sde.sigmas[t.reshape(-1)].reshape(2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(noise), np.asarray(sig * std_noise), atol=1e-6)


def test_forward_marginal_statistics():
    """Monte-carlo check: E[x_t] = x0 + s_d[t] (mu - x0), Var = max_sigma^2 s_n[t]."""
    sde = DriftSDE(T=10, max_sigma=0.4)
    x0 = jnp.full((1, 1, 4, 4), 0.3)
    mu = jnp.full((1, 1, 4, 4), 1.1)
    t = 7
    keys = jax.random.split(jax.random.key(0), 2000)

    def one(k):
        eps = jax.random.normal(k, x0.shape)
        mean, sig = sde.marginal(x0, mu, jnp.array([t]))
        return mean + sig * eps

    samples = np.asarray(jax.vmap(one)(keys))
    exp_mean = 0.3 + float(sde.drift_schedule[t]) * 0.8
    exp_std = 0.4 * float(jnp.sqrt(sde.noise_schedule[t]))
    assert samples.mean() == pytest.approx(exp_mean, abs=0.02)
    assert samples.std() == pytest.approx(exp_std, abs=0.02)


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_reverse_with_oracle_recovers_x0(eta):
    """With exact predictions the sampler's per-step posterior is exact, so the
    final sample must equal x0 (stochasticity cancels: the chain stays on the
    manifold x_t = x0 + s_d[t] D + sigma_t eps_effective and t=0 collapses)."""
    sde = DriftSDE(T=50, max_sigma=0.4, drift_schedule="sigmoid", noise_schedule="sigmoid")
    key = jax.random.key(3)
    x0, mu = _toy_batch(key, B=2, H=8, W=8)
    true_drift = mu - x0

    def oracle(x_t, t_b):
        # exact drift; exact effective noise inferred from the state itself
        sd = sde.drift_schedule[t_b].reshape(-1, 1, 1, 1)
        sig = sde.sigmas[t_b].reshape(-1, 1, 1, 1)
        eps = (x_t - x0 - sd * true_drift) / jnp.maximum(sig, 1e-12)
        return true_drift, eps

    out = sde.reverse_ddpm(jax.random.key(4), mu, oracle, eta=eta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_reverse_scan_jits_and_is_deterministic():
    sde = DriftSDE(T=20, max_sigma=0.4)
    x0, mu = _toy_batch(jax.random.key(0), B=1, H=8, W=8)

    def predict(x_t, t_b):
        return jnp.zeros_like(x_t), jnp.zeros_like(x_t)

    f = jax.jit(lambda k, m: sde.reverse_ddpm(k, m, predict))
    a = f(jax.random.key(7), mu)
    b = f(jax.random.key(7), mu)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero_noise_schedule_path_reduces_to_drift_removal():
    """eta=0 with zero predicted noise: sampler must remove exactly the full
    predicted drift across the loop (telescoping schedule increments)."""
    sde = DriftSDE(T=25, max_sigma=0.4)
    x0, mu = _toy_batch(jax.random.key(2), B=1)
    D = mu - x0

    def predict(x_t, t_b):
        return D, jnp.zeros_like(x_t)

    out = sde.reverse_ddpm(jax.random.key(0), mu, predict, eta=0.0, noise_init=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_create_sde_factory():
    sde = create_sde({"class_name": "driftSDE", "T": 10, "max_sigma": 0.4,
                      "drift_schedule": "sigmoid", "noise_schedule": "sigmoid"})
    assert isinstance(sde, DriftSDE) and sde.T == 10
    ddpm = create_sde({"class_name": "DDPM", "T": 10, "max_sigma": 1, "schedule": "cosine_alpha"})
    assert isinstance(ddpm, DDPMSDE)
    with pytest.raises(ValueError):
        create_sde({"class_name": "nope"})


def test_ddpm_oracle_reverse():
    """DDPM ancestral sampling with an oracle noise net lands near x0."""
    sde = DDPMSDE(T=50)
    x0 = jax.random.normal(jax.random.key(0), (1, 1, 8, 8))

    def oracle(x_t, t_b):
        abar = sde.alphas_bar[t_b].reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(abar) * x0) / jnp.sqrt(1 - abar)

    # clip_x0 (the image-range stabiliser) off: the oracle's x0 is a
    # standard normal, not an image in [-1, 1]
    out = sde.reverse_ddpm(jax.random.key(1), x0, oracle, clip_x0=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddpm_oracle_reverse_max_sigma():
    """max_sigma != 1 must stay self-consistent: the reverse step folds the
    scale into the eps term and posterior variance (ADVICE r1)."""
    s = 0.4
    sde = DDPMSDE(T=50, max_sigma=s)
    x0 = jax.random.normal(jax.random.key(0), (1, 1, 8, 8))

    def oracle(x_t, t_b):
        abar = sde.alphas_bar[t_b].reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(abar) * x0) / (s * jnp.sqrt(1 - abar))

    out = sde.reverse_ddpm(jax.random.key(1), x0, oracle, clip_x0=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_irsde_forward_marginal_and_optimum_step():
    sde = IRSDE(max_sigma=0.4, T=100, schedule="cosine")
    x0, mu = _toy_batch(jax.random.key(5))
    t, x_t, eps = sde.forward_diffusion(jax.random.key(6), x0, mu)
    tt = t.reshape(-1)
    mean = sde.mu_bar(x0, mu, tt)
    sbar = sde.sigma_bars[tt].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(mean + sbar * eps), atol=1e-6)
    # sigma_bar is increasing toward max_sigma * sqrt(1 - eps^2-ish)
    sb = np.asarray(sde.sigma_bars)
    assert np.all(np.diff(sb) >= -1e-7)
    assert sb[-1] <= 0.4 + 1e-6


def test_irsde_oracle_reverse_sde():
    sde = IRSDE(max_sigma=0.2, T=100, schedule="cosine")
    x0, mu = _toy_batch(jax.random.key(8), B=1)

    def oracle_noise(x, t_b):
        mean = sde.mu_bar(x0, mu, t_b)
        sbar = sde.sigma_bars[t_b].reshape(-1, 1, 1, 1)
        return (x - mean) / jnp.maximum(sbar, 1e-8)

    out = sde.reverse_sde(jax.random.key(9), mu, oracle_noise, stochastic=False)
    err = float(jnp.mean(jnp.abs(out - x0)))
    assert err < 0.05  # ODE-style reverse with oracle score converges near x0


def test_irsde_reverse_ode_and_state_dumps():
    """Probability-flow loop (half-diffusion drift) + state-dump option
    (sde_utils.py:263-279 save_states analogue)."""
    sde = IRSDE(max_sigma=0.2, T=100, schedule="cosine")
    x0, mu = _toy_batch(jax.random.key(8), B=1)

    def oracle_noise(x, t_b):
        mean = sde.mu_bar(x0, mu, t_b)
        sbar = sde.sigma_bars[t_b].reshape(-1, 1, 1, 1)
        return (x - mean) / jnp.maximum(sbar, 1e-8)

    out, states = sde.reverse_ode(jax.random.key(9), mu, oracle_noise,
                                  return_states=True)
    assert states.shape == (100,) + x0.shape
    np.testing.assert_allclose(np.asarray(states[-1]), np.asarray(out))
    assert float(jnp.mean(jnp.abs(out - x0))) < 0.05
    # sde variant also exposes the trajectory
    out_s, states_s = sde.reverse_sde(jax.random.key(9), mu, oracle_noise,
                                      stochastic=False, return_states=True)
    assert states_s.shape == (100,) + x0.shape


def test_irsde_ode_sampler_black_box():
    """Adaptive RK45 probability-flow solve (ode_sampler analogue,
    sde_utils.py:282-306) restores x0 from an oracle score."""
    sde = IRSDE(max_sigma=0.2, T=100, schedule="cosine")
    x0, mu = _toy_batch(jax.random.key(8), B=1)

    def oracle_noise(x, t_b):
        mean = sde.mu_bar(x0, mu, t_b)
        sbar = sde.sigma_bars[t_b].reshape(-1, 1, 1, 1)
        return (x - mean) / jnp.maximum(sbar, 1e-8)

    x_T = mu + sde.max_sigma * jax.random.normal(jax.random.key(3), mu.shape)
    out = sde.ode_sampler(x_T, mu, oracle_noise, rtol=1e-4, atol=1e-4)
    assert float(jnp.mean(jnp.abs(out - x0))) < 0.05


@pytest.mark.parametrize("steps", [5, 10])
def test_strided_sampling_oracle(steps):
    """Fast sampling over a strided timestep subset still recovers x0 with
    oracle predictions (exact per-pair posterior)."""
    sde = DriftSDE(T=50, max_sigma=0.4)
    x0, mu = _toy_batch(jax.random.key(11), B=1)
    D = mu - x0

    def oracle(x_t, t_b):
        sd = sde.drift_schedule[t_b].reshape(-1, 1, 1, 1)
        sig = sde.sigmas[t_b].reshape(-1, 1, 1, 1)
        eps = (x_t - x0 - sd * D) / jnp.maximum(sig, 1e-12)
        return D, eps

    out = sde.reverse_ddpm(jax.random.key(12), mu, oracle, sample_steps=steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_hoist_noise_matches_inloop_draws():
    """`hoist_noise=True` pre-draws all step noise outside the scan with the
    SAME per-step keys; values equal the in-loop draws up to ~1-ulp
    fusion-order rounding."""
    sde = DriftSDE(T=7, max_sigma=0.4)
    key = jax.random.key(5)
    x0 = jax.random.uniform(key, (2, 16, 16, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.key(6), x0.shape)

    def pred(x, t_b):
        return mu - x0, 0.3 * x

    for steps in (None, 3):
        a = jax.jit(lambda k: sde.reverse_ddpm(
            k, mu, pred, sample_steps=steps))(jax.random.key(9))
        b = jax.jit(lambda k: sde.reverse_ddpm(
            k, mu, pred, sample_steps=steps, hoist_noise=True))(
                jax.random.key(9))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
