import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.sde import make_schedule, make_cosine_alphas_bar, schedule_increment


@pytest.mark.parametrize("name", ["linear", "cosine", "sigmoid", "constant"])
def test_schedule_endpoints_and_monotone(name):
    T = 100
    s = np.asarray(make_schedule(name, T))
    assert s.shape == (T + 1,)
    assert s[0] == 0.0
    assert s[-1] == 1.0
    assert np.all(np.diff(s) >= -1e-7)


def test_cosine_matches_reference_helper():
    # reference helper (drift_noise_model.py:10-16): level (1-cos(t*pi/T))/2
    T = 100
    s = np.asarray(make_schedule("cosine", T))
    t = np.arange(T + 1)
    expected = (1 - np.cos(t * np.pi / T)) / 2
    np.testing.assert_allclose(s, expected, atol=1e-6)


def test_sigmoid_symmetric():
    s = np.asarray(make_schedule("sigmoid", 100))
    # symmetric around the midpoint: s(t) + s(T-t) == 1
    np.testing.assert_allclose(s + s[::-1], 1.0, atol=1e-6)
    assert s[50] == pytest.approx(0.5, abs=1e-6)


def test_cosine_alpha_bar():
    abar = np.asarray(make_cosine_alphas_bar(100))
    assert abar[0] == pytest.approx(1.0)
    assert abar[-1] < 1e-3
    assert np.all(np.diff(abar) <= 1e-9)


def test_schedule_increment_sums_to_one():
    s = make_schedule("sigmoid", 50)
    ds = np.asarray(schedule_increment(s))
    assert ds[0] == 0.0
    assert np.sum(ds) == pytest.approx(1.0, abs=1e-5)
