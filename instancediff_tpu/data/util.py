"""Color-space utilities — parity with the reference's missing ``data/util.py``
whose only referenced symbol is ``bgr2ycbcr`` (imported at testUM.py:23;
vestigial in surviving code, SURVEY.md SS0.1)."""

from __future__ import annotations

import numpy as np


def bgr2ycbcr(img, only_y=True):
    """BGR (HWC, [0,1] float or [0,255] uint8) -> YCbCr, MATLAB convention.

    Returns Y only when ``only_y`` (the usual SR-metric usage)."""
    in_img_type = img.dtype
    img = img.astype(np.float64)
    if in_img_type != np.uint8:
        img *= 255.0
    if only_y:
        rlt = np.dot(img, [24.966, 128.553, 65.481]) / 255.0 + 16.0
    else:
        rlt = np.matmul(
            img,
            [[24.966, 112.0, -18.214],
             [128.553, -74.203, -93.786],
             [65.481, -37.797, 112.0]],
        ) / 255.0 + [16, 128, 128]
    if in_img_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt /= 255.0
    return rlt.astype(in_img_type)


def rgb2ycbcr(img, only_y=True):
    """RGB variant of :func:`bgr2ycbcr`."""
    return bgr2ycbcr(np.asarray(img)[..., ::-1], only_y=only_y)
