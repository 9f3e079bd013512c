"""Filesystem / logging / reproducibility helpers.

Capability parity with reference utils/file_utils.py:39-160 (timestamped dir
renaming, logger setup, seed control) and trainUM.py:37-48 (source snapshot).
"""

from __future__ import annotations

import logging
import os
import random
import shutil
import sys
from datetime import datetime

import numpy as np


def get_timestamp():
    return datetime.now().strftime("%y%m%d-%H%M%S")


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    if isinstance(paths, str):
        mkdir(paths)
    else:
        for p in paths:
            mkdir(p)


def mkdir_and_rename(path):
    """Create ``path``; if it already exists, archive it with a timestamp suffix
    first (reference file_utils.py:56-63)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        print(f"Path already exists. Rename it to [{new_name}]")
        os.rename(path, new_name)
    os.makedirs(path)


def set_random_seed(seed):
    """Seed Python/NumPy RNGs. JAX randomness is explicit-key based — callers
    derive ``jax.random.key(seed)`` themselves (reference file_utils.py:66-70
    seeded torch/cuda instead)."""
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(logger_name, root, phase, level=logging.INFO, screen=False, tofile=False):
    """Configure a named logger writing ``<phase>_<timestamp>.log`` under ``root``
    (reference file_utils.py:73-91)."""
    lg = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s", datefmt="%y-%m-%d %H:%M:%S"
    )
    lg.setLevel(level)
    if tofile:
        log_file = os.path.join(root, f"{phase}_{get_timestamp()}.log")
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(formatter)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(formatter)
        lg.addHandler(sh)
    return lg


def store_files(opt, dst_dir):
    """Snapshot the config-listed source files into the experiment dir for
    reproducibility (reference trainUM.py:37-48)."""
    mkdir(dst_dir)
    for f in opt.get("file_to_be_store") or []:
        if os.path.isfile(f):
            shutil.copy(f, os.path.join(dst_dir, os.path.basename(f)))
