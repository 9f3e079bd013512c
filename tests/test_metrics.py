import numpy as np
import pytest

from instancediff_tpu.utils.metrics import (
    calculate_psnr,
    calculate_rmse,
    calculate_ssim,
    eval_restoration,
)


def test_psnr_known_value():
    a = np.zeros((32, 32))
    b = np.full((32, 32), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    assert calculate_psnr(a, b) == pytest.approx(20.0, abs=1e-6)


def test_psnr_identical_is_inf():
    a = np.random.rand(16, 16)
    assert calculate_psnr(a, a) == float("inf")


def test_rmse():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.5)
    assert calculate_rmse(a, b) == pytest.approx(0.5)


def test_ssim_self_is_one():
    rng = np.random.default_rng(0)
    a = rng.random((64, 64))
    assert calculate_ssim(a, a) == pytest.approx(1.0, abs=1e-9)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    a = rng.random((64, 64))
    s_small = calculate_ssim(a, np.clip(a + 0.01 * rng.standard_normal(a.shape), 0, 1))
    s_big = calculate_ssim(a, np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1))
    assert 0 < s_big < s_small < 1


def test_ssim_matches_closed_form_constant_shift():
    """For im2 = im1 + c (constant), vx=vy=vxy and ux-uy=c everywhere, so
    SSIM = ((2 ux uy + C1)(2 vx + C2)) / ((ux^2+uy^2+C1)(2 vx + C2))
         = (2 ux uy + C1) / (ux^2 + uy^2 + C1) pointwise."""
    rng = np.random.default_rng(2)
    im1 = rng.random((40, 40)) * 0.5
    c = 0.25
    im2 = im1 + c
    got = calculate_ssim(im1, im2)

    from scipy.ndimage import gaussian_filter

    ux = gaussian_filter(im1, sigma=1.5, truncate=3.5)
    uy = ux + c
    C1 = 0.01**2
    S = (2 * ux * uy + C1) / (ux**2 + uy**2 + C1)
    expected = S[5:-5, 5:-5].mean()
    assert got == pytest.approx(expected, abs=1e-10)


def test_eval_restoration_rescales():
    pred = np.full((1, 1, 16, 16), -1.0)  # -> 0.0 after /2+0.5
    gt = np.full((1, 1, 16, 16), 1.0)  # -> 1.0
    out = eval_restoration(pred, gt)
    assert out["RMSE"] == pytest.approx(1.0)
    assert out["PSNR"] == pytest.approx(0.0, abs=1e-6)


def test_jnp_metrics_match_numpy():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instancediff_tpu.utils.metrics import psnr_jnp, ssim_jnp

    rng = np.random.default_rng(5)
    a = rng.random((48, 48))
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)
    assert float(psnr_jnp(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        calculate_psnr(a, b), abs=1e-3)
    assert float(ssim_jnp(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        calculate_ssim(a, b), abs=2e-4)
