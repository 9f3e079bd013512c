"""ctypes binding to the native IO runtime (native/instancediff_io.cc).

Builds ``libinstancediff_io.so`` on first use (g++ available in the image;
silent fallback to NumPy if the toolchain or build fails) and exposes:

  * ``read_batch(paths, per_item, modes, n_threads)`` -> float32
    [len(paths), per_item] with per-modality normalisation fused into the
    read (MedSpeckle.py:55-70 semantics; mode map in MODES).

This is the framework's native replacement for the reference's pinned-memory
torch DataLoader workers (SURVEY.md SS2.10).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

MODES = {"affine": 0, "ct": 1, "cryo": 2, "raw": 3}

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libinstancediff_io.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.idf_read_batch.restype = ctypes.c_int
        lib.idf_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def mode_for(name: str) -> int:
    """Per-artifact-type normalisation mode (med_dataset normalize_pair)."""
    if name == "scatter artifact in CT":
        return MODES["ct"]
    if name == "noise in cryo-EM image":
        return MODES["cryo"]
    return MODES["affine"]


def read_batch(paths, per_item, modes, n_threads=4):
    """Read len(paths) raw-f32 files into one [N, per_item] array with fused
    normalisation. Falls back to NumPy when the native lib is unavailable."""
    n = len(paths)
    out = np.empty((n, per_item), dtype=np.float32)
    lib = _load()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_modes = (ctypes.c_int32 * n)(*modes)
        rc = lib.idf_read_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            per_item, c_modes, n_threads)
        if rc == 0:
            return out
    # numpy fallback (also the golden reference in tests)
    for i, (p, m) in enumerate(zip(paths, modes)):
        arr = np.fromfile(p, dtype=np.float32, count=per_item)
        if m == MODES["ct"]:
            arr = np.clip(arr, 0.0, 1800.0) / 1800.0 * 2.0 - 1.0
        elif m == MODES["cryo"]:
            arr = np.clip(arr, 0.0, 255.0) / 255.0 * 2.0 - 1.0
        elif m == MODES["affine"]:
            arr = arr * 2.0 - 1.0
        out[i] = arr
    return out
