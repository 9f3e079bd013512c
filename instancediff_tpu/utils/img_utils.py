"""Image/array conversion and IO helpers.

Parity with reference utils/img_utils.py:33-179 (tensor<->image converters) and
the raw-float32 dump convention used by testUM.py:170-173 / MedSpeckle.py:44-45.
Arrays are NumPy/JAX; there is no torch dependency.
"""

from __future__ import annotations

import os

import numpy as np


def tensor2img(tensor, out_type=np.uint8, min_max=(0, 1)):
    """Convert a [C,H,W] or [H,W] float array in ``min_max`` range to an image
    array (HWC uint8 by default). Mirrors reference img_utils.py:136-163."""
    img = np.asarray(tensor, dtype=np.float32)
    img = np.clip((img - min_max[0]) / (min_max[1] - min_max[0]), 0, 1)
    if img.ndim == 4:
        img = img[0]
    if img.ndim == 3:
        if img.shape[0] in (1, 3):  # CHW -> HWC
            img = np.transpose(img, (1, 2, 0))
        if img.shape[-1] == 1:
            img = img[..., 0]
    if out_type == np.uint8:
        img = (img * 255.0).round().astype(np.uint8)
    else:
        img = img.astype(out_type)
    return img


def img2tensor(img):
    """HWC uint8/float image -> [C,H,W] float32 in [0,1]."""
    src = np.asarray(img)
    arr = src.astype(np.float32)
    if src.dtype == np.uint8 or arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = np.transpose(arr, (2, 0, 1))
    return arr.astype(np.float32)


def save_img(img, img_path):
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(img_path)), exist_ok=True)
    Image.fromarray(img).save(img_path)


def save_raw(arr, path):
    """Dump a float32 array in the reference's raw binary format
    (testUM.py:170-173: ``LQ|pred|GT`` concatenations as flat float32)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.asarray(arr, dtype=np.float32).tofile(path)


def load_raw(path, shape=(1, 224, 224)):
    """Load a raw float32 file into ``shape`` (MedSpeckle.py:44-45 convention)."""
    return np.fromfile(path, dtype=np.float32).reshape(shape)
