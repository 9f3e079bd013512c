import io
import sys

import jax
import jax.numpy as jnp
import numpy as np

from instancediff_tpu.utils import ProgressBar
from instancediff_tpu.utils.img_utils import tensor2img, img2tensor
from instancediff_tpu.ops.degradations import (
    add_gaussian_noise,
    add_speckle,
    low_dose_sim,
    apply_degradation,
    upscale,
    mask_to,
)


def test_progress_bar_counts(capsys):
    pb = ProgressBar(task_num=4, bar_width=10)
    for _ in range(4):
        pb.update("msg")
    out = capsys.readouterr().out
    assert "4/4" in out
    pb2 = ProgressBar(task_num=0)
    pb2.update()
    assert pb2.completed == 1


def test_tensor2img_roundtrip():
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    t = img2tensor(img)
    assert t.shape == (1, 16, 16)
    back = tensor2img(t)
    assert back.dtype == np.uint8
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_degradations_ranges():
    key = jax.random.key(0)
    x = jnp.zeros((2, 8, 8, 1)) + 0.2
    for fn in (lambda k, v: add_gaussian_noise(k, v, 25.0),
               lambda k, v: add_speckle(k, v),
               lambda k, v: low_dose_sim(k, v)):
        y = fn(key, x)
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))
    # sigma>1 is interpreted as /255 (deg_utils.py:13-15)
    y = add_gaussian_noise(key, x, 255.0)
    assert float(jnp.std(y - x)) < 1.5


def test_apply_degradation_switches_by_type():
    key = jax.random.key(1)
    x = jnp.zeros((2, 8, 8, 1)) + 0.1
    y0 = apply_degradation(key, x, jnp.array([0, 0]))
    y4 = apply_degradation(key, x, jnp.array([4, 4]))
    assert not np.allclose(np.asarray(y0), np.asarray(y4))


def test_upscale_and_mask():
    x = jnp.ones((1, 4, 4, 1)) * 0.5
    up = upscale(x, scale=2)
    assert up.shape == (1, 8, 8, 1)
    mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
    out = mask_to(x, mask)
    np.testing.assert_allclose(np.asarray(out[0, :2]), 0.5)
    np.testing.assert_allclose(np.asarray(out[0, 2:]), 1.0)


def test_degra_context_engine_path():
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    tiny = dict(in_nc=2, out_nc=5, nf=4, ch_mult=[1, 2], context_dim=8,
                text_module="scoremap", score_map_chan=2,
                if_MultiScoreMap=True, num_res_blocks=1)
    eng = CLIPDriftEngine(
        dnet_settings=tiny, nnet_settings=tiny, score_map_ch_mult=(1, 1),
        score_map_ngf=4, use_image_context=False, use_degra_context=True,
        CLIP_Type="CLIP", tiny_text_encoder=True,
        sde=DriftSDE(T=4, max_sigma=0.4), image_size=8, nepoch=2, seed=0,
        drift_net_lr=1e-3, noise_net_lr=1e-3)
    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (2, 8, 8, 1)) * 2 - 1
    batch = {"input": x0 + 0.1, "target": x0, "type_idx": jnp.array([0, 4]),
             "A_emb": jnp.zeros((2, 1, 8))}
    loss = eng.optimize_parameters(batch, jax.random.key(1))
    assert np.isfinite(loss)
    out = eng.test(batch, jax.random.key(2), use_ema=False)
    assert out.shape == (2, 8, 8, 1) and bool(jnp.all(jnp.isfinite(out)))


def test_matlab_psnr_ssim_golden_vs_reference():
    """Golden: our numpy MATLAB-convention PSNR/SSIM vs the reference's
    executable cv2 implementation (utils/img_utils.py:182-234)."""
    import numpy as np
    import pytest

    cv2 = pytest.importorskip("cv2")
    from instancediff_tpu.utils.img_utils import calculate_psnr, calculate_ssim

    rng = np.random.RandomState(0)
    a = (rng.rand(48, 48) * 255).astype(np.float64)
    b = np.clip(a + rng.randn(48, 48) * 12, 0, 255)

    # reference psnr formula
    mse = np.mean((a - b) ** 2)
    ref_psnr = 20 * np.log10(255.0 / np.sqrt(mse))
    assert abs(calculate_psnr(a, b) - ref_psnr) < 1e-9

    # reference ssim formula (cv2.filter2D + [5:-5] crop), re-executed
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    f = lambda x: cv2.filter2D(x, -1, window)[5:-5, 5:-5]
    mu1, mu2 = f(a), f(b)
    s1 = f(a**2) - mu1**2
    s2 = f(b**2) - mu2**2
    s12 = f(a * b) - mu1 * mu2
    ref_ssim = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean()
    assert abs(calculate_ssim(a, b) - ref_ssim) < 1e-9
    # channel forms
    assert abs(calculate_ssim(a[..., None], b[..., None]) - ref_ssim) < 1e-9
    assert calculate_psnr(a, a) == float("inf")


def test_upscale_golden_vs_torch_bicubic():
    """ops.degradations.upscale reproduces the reference's
    F.interpolate(mode='bicubic') exactly (deg_utils.py:38-40) — including
    the a=-0.75 kernel and border clamping (jax.image's 'cubic' is the
    a=-0.5 Keys kernel, a different function)."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from instancediff_tpu.ops.degradations import upscale

    rng = np.random.default_rng(3)
    for scale, (h, w) in ((2, (8, 6)), (4, (5, 7))):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             scale_factor=scale, mode="bicubic").numpy()
        got = np.asarray(upscale(jnp.asarray(x), scale=scale))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   atol=2e-5, rtol=1e-4)
