"""Golden parity: sde/ir_sde.py vs the reference's OWN executable IRSDE
(/root/reference/utils/sde_utils.py — torch). The file imports torchvision
only for image dumps we never call, so it is imported with a stub module.

Covers: schedule tables (thetas/sigmas/thetas_cumsum/sigma_bars/dt) for all
three schedules, the forward marginal (mu_bar), and the reverse SDE/ODE
drift functions on random states."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.sde import IRSDE  # noqa: E402


@pytest.fixture(scope="module")
def ref_sde_utils():
    # dump-only dep, not installed; another golden test may have stubbed
    # the torchvision root already (without .utils) — augment, never skip
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if "torchvision.utils" not in sys.modules:
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision.utils"] = tv.utils
    spec = importlib.util.spec_from_file_location(
        "ref_sde_utils", "/root/reference/utils/sde_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("schedule", ["cosine", "linear", "constant"])
def test_irsde_schedule_tables_match_reference(ref_sde_utils, schedule):
    T, max_sigma, eps = 100, 0.4, 0.01
    ref = ref_sde_utils.IRSDE(max_sigma, T=T, schedule=schedule, eps=eps,
                              device="cpu")
    ours = IRSDE(max_sigma=max_sigma, T=T, schedule=schedule, eps=eps)
    assert abs(float(ref.dt) - ours.dt) < 1e-6 * abs(float(ref.dt))
    # t = 1..T is the used index range (reference: "state t=0 never used")
    for name, r, o in (
        ("thetas", ref.thetas, ours.thetas),
        ("sigmas", ref.sigmas, ours.sigmas),
        ("thetas_cumsum", ref.thetas_cumsum, ours.thetas_cum),
        ("sigma_bars", ref.sigma_bars, ours.sigma_bars),
    ):
        np.testing.assert_allclose(np.asarray(o)[1:T + 1],
                                   r.numpy()[1:T + 1], rtol=2e-5, atol=1e-7,
                                   err_msg=f"{schedule}:{name}")


def test_irsde_marginal_and_reverse_drifts_match_reference(ref_sde_utils):
    T, max_sigma, eps = 100, 0.3, 0.01
    ref = ref_sde_utils.IRSDE(max_sigma, T=T, schedule="cosine", eps=eps,
                              device="cpu")
    ours = IRSDE(max_sigma=max_sigma, T=T, schedule="cosine", eps=eps)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.3
    mu = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.3
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.3
    score = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)

    for t in (1, 17, 50, 100):
        ref.set_mu(torch.from_numpy(mu))
        want_mean = ref.mu_bar(torch.from_numpy(x0), t).numpy()
        got_mean = np.asarray(ours.mu_bar(
            jnp.asarray(x0), jnp.asarray(mu), jnp.full((2,), t, jnp.int32)))
        np.testing.assert_allclose(got_mean, want_mean, rtol=2e-5, atol=1e-6)

        want_rev = ref.sde_reverse_drift(
            torch.from_numpy(x), torch.from_numpy(score), t).numpy()
        theta = float(ours.thetas[t])
        sigma2 = 2.0 * max_sigma ** 2 * theta
        got_rev = (theta * (mu - x) - sigma2 * score) * ours.dt
        np.testing.assert_allclose(got_rev, want_rev, rtol=2e-5, atol=1e-6)

        want_ode = ref.ode_reverse_drift(
            torch.from_numpy(x), torch.from_numpy(score), t).numpy()
        got_ode = (theta * (mu - x) - 0.5 * sigma2 * score) * ours.dt
        np.testing.assert_allclose(got_ode, want_ode, rtol=2e-5, atol=1e-6)

        want_score = ref.get_score_from_noise(torch.from_numpy(score), t).numpy()
        got_score = np.asarray(ours.score_from_noise(
            jnp.asarray(score), jnp.full((2,), t, jnp.int32)))
        np.testing.assert_allclose(got_score, want_score, rtol=2e-5, atol=1e-5)


def test_irsde_reverse_optimum_step_matches_reference(ref_sde_utils):
    """Our sigma_bar-ratio form of the posterior step is algebraically the
    reference's (1-C^2)/(1-B^2) form (:206-214); check numerically on
    mu-residuals (the caller's convention here)."""
    T, max_sigma = 100, 0.3
    ref = ref_sde_utils.IRSDE(max_sigma, T=T, schedule="cosine", device="cpu")
    ours = IRSDE(max_sigma=max_sigma, T=T, schedule="cosine")
    rng = np.random.default_rng(2)
    xt = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.2
    x0 = rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.2
    ref.set_mu(0.0)
    for t in (2, 40, 100):
        want = ref.reverse_optimum_step(torch.from_numpy(xt),
                                        torch.from_numpy(x0), t).numpy()
        got = np.asarray(ours.reverse_optimum_step(
            jnp.asarray(xt), jnp.asarray(x0), jnp.full((2,), t, jnp.int32)))
        # the forms are equal in exact arithmetic; at small t both ratios
        # suffer fp32 cancellation (1-B^2 ~ 1e-4), so compare absolutely
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)
