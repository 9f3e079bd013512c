"""On-device degradation synthesis.

Capability parity with reference utils/deg_utils.py (Gaussian ``add_noise``
with the sigma>1 -> sigma/255 convention, inpainting masks, bicubic upscale)
plus the modality-specific degradations of the five artifact types
(config.yml:15-21) so synthetic GT-only datasets can be degraded *on the TPU*
inside the jitted input pipeline (BASELINE.json north star: hosts stream raw
arrays, degradations fuse into the step).

All functions take explicit PRNG keys and NHWC arrays in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ARTIFACT_TYPES = (
    "speckle in OCT",
    "speckle in ultra sound",
    "noise in cryo-EM image",
    "noise in low dose CT",
    "Gaussian noise in MRI",
)


def add_gaussian_noise(key, x, sigma):
    """Additive Gaussian noise (deg_utils.py:13-15 incl. /255 convention)."""
    sigma = jnp.where(sigma > 1, sigma / 255.0, sigma)
    return x + jax.random.normal(key, x.shape, dtype=x.dtype) * sigma


def add_speckle(key, x, sigma=0.3, looks=None):
    """Multiplicative speckle (OCT / ultrasound model). On [0,1] intensity:
    y = s * (1 + n), n ~ N(0, sigma^2) (or gamma-distributed for L-look SAR
    style when ``looks`` given). Input/output in [-1,1]."""
    s01 = (x + 1.0) / 2.0
    if looks is None:
        mult = 1.0 + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)
    else:
        # L-look amplitude speckle: mean-1 gamma(L, 1/L)
        mult = jax.random.gamma(key, looks, x.shape, dtype=x.dtype) / looks
    y01 = jnp.clip(s01 * mult, 0.0, 1.0)
    return y01 * 2.0 - 1.0


def low_dose_sim(key, x, dose_frac=0.25, i0=1e4):
    """Low-dose CT simulation: Poisson photon statistics on line integrals at
    ``dose_frac`` of the full-dose photon count ``i0`` (Gaussian approximation
    of Poisson — exact enough at these counts and jit-cheap)."""
    s01 = (x + 1.0) / 2.0
    n0 = i0 * dose_frac
    counts = n0 * jnp.exp(-s01)
    noisy = counts + jnp.sqrt(counts) * jax.random.normal(key, x.shape, dtype=x.dtype)
    noisy = jnp.clip(noisy, 1.0, None)
    y01 = jnp.clip(-jnp.log(noisy / n0), 0.0, 1.0)
    return y01 * 2.0 - 1.0


def apply_degradation(key, x, type_idx, sigma=25.0):
    """Apply the per-sample degradation selected by integer ``type_idx``
    (type_map_ind, config.yml:16-21) with branch-free ``lax.switch``-style
    select — jit/TPU friendly (no data-dependent Python control flow)."""
    keys = jax.random.split(key, 5)
    cands = jnp.stack(
        [
            add_speckle(keys[0], x, sigma=0.35),           # 0 speckle in OCT
            add_speckle(keys[1], x, sigma=0.25),           # 1 speckle in ultrasound
            add_gaussian_noise(keys[2], x, 2.0 * sigma),   # 2 cryo-EM noise (heavy)
            low_dose_sim(keys[3], x),                      # 3 low dose CT
            add_gaussian_noise(keys[4], x, sigma),         # 4 Gaussian noise in MRI
        ]
    )  # [5, B, H, W, C]
    idx = type_idx.reshape((-1,) + (1,) * (x.ndim - 1))
    take = jnp.take_along_axis(
        cands, idx[None].astype(jnp.int32), axis=0
    )
    return take[0]


def _torch_cubic_weights(frac, a=-0.75):
    """Cubic convolution weights for the 4 taps around a sample at fractional
    offset ``frac`` — torch/OpenCV convention a=-0.75 (jax.image's 'cubic'
    is the Keys a=-0.5 kernel, which is a DIFFERENT function)."""
    def k(d):
        ad = jnp.abs(d)
        return jnp.where(
            ad <= 1, ((a + 2) * ad - (a + 3)) * ad * ad + 1,
            jnp.where(ad < 2, (((ad - 5) * ad + 8) * ad - 4) * a, 0.0))

    return jnp.stack([k(frac + 1), k(frac), k(1 - frac), k(2 - frac)], -1)


def _bicubic_axis(x, out_n, axis):
    """torch ``F.interpolate(mode='bicubic', align_corners=False)`` along one
    axis: src = (dst+0.5)*N/out_n - 0.5, 4 border-clamped taps, a=-0.75."""
    n = x.shape[axis]
    dst = jnp.arange(out_n, dtype=jnp.float32)
    src = (dst + 0.5) * (n / out_n) - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    w = _torch_cubic_weights(frac)                                # [out_n, 4]
    idx = jnp.clip(i0[:, None].astype(jnp.int32)
                   + jnp.arange(-1, 3)[None], 0, n - 1)           # [out_n, 4]
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    shp = list(x.shape)
    shp[axis:axis + 1] = [out_n, 4]
    taps = taps.reshape(shp)
    wshape = [1] * taps.ndim
    wshape[axis], wshape[axis + 1] = out_n, 4
    return (taps * w.reshape(wshape).astype(x.dtype)).sum(axis=axis + 1)


def upscale(x, scale=4, method="bicubic"):
    """SR upscale (deg_utils.py:38-40) for NHWC batches — torch-exact
    bicubic (golden vs F.interpolate, tests/test_misc_utils.py); other
    methods delegate to jax.image.resize."""
    B, H, W, C = x.shape
    if method == "bicubic":
        return _bicubic_axis(_bicubic_axis(x, H * scale, 1), W * scale, 2)
    return jax.image.resize(x, (B, H * scale, W * scale, C), method=method)


def mask_to(x, mask):
    """Inpainting degradation: keep masked region, fill rest with 1.0
    (deg_utils.py:19-34 semantics; mask supplied as an array here — file IO
    belongs to the host pipeline)."""
    return mask * x + (1.0 - mask)


# Pre-jitted host-callable wrapper: drivers that synthesise LQ outside a
# larger jitted program (engine.test with degrade_on_device) must reuse ONE
# jit cache — wrapping apply_degradation in a fresh jax.jit per call would
# re-trace every batch.
apply_degradation_jit = jax.jit(apply_degradation, static_argnames=("sigma",))
