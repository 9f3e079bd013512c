"""Resize ops for score-map pyramid supervision and up/down-sampling.

The reference supervises each scale's score map against the label resized by
``torchvision.transforms.Resize`` (bilinear, antialias) to H/mult for
mult=[1,2,4,8] (drift_noise_model.py:234-240). ``jax.image.resize`` with
'bilinear' antialiases on downscale by default and matches torch's
antialiased bilinear to float32 roundoff (max abs err ~1.2e-7) for these
power-of-two factors — demonstrated in
tests/test_minor_parity.py::test_downsample_matches_torch_antialiased_bilinear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_like(x, h, w, method="bilinear"):
    """Resize NHWC batch to (h, w)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method=method)


def downsample_label(label, mult):
    """Downsample an NHWC label by integer factor ``mult`` (bilinear —
    torchvision Resize semantics used by optimize_score_map)."""
    if mult == 1:
        return label
    B, H, W, C = label.shape
    return jax.image.resize(label, (B, H // mult, W // mult, C), method="bilinear")
