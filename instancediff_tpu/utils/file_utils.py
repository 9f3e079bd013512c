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


class ProgressBar:
    """Console progress bar (reference file_utils.py:94-160 parity): renders
    a fixed-width bar with fps and elapsed time, falling back to a counter
    when the task count is unknown."""

    def __init__(self, task_num=0, bar_width=50, start=True):
        self.task_num = task_num
        self.bar_width = max(2, min(bar_width, 50))
        self.completed = 0
        if start:
            self.start()

    def start(self):
        import time as _time

        if self.task_num > 0:
            sys.stdout.write(
                f"[{' ' * self.bar_width}] 0/{self.task_num}, elapsed: 0s, ETA:\n")
        else:
            sys.stdout.write("completed: 0, elapsed: 0s")
        sys.stdout.flush()
        self.start_time = _time.time()

    def update(self, msg="In progress..."):
        import time as _time

        self.completed += 1
        elapsed = max(_time.time() - self.start_time, 1e-9)
        fps = self.completed / elapsed
        if self.task_num > 0:
            percentage = self.completed / float(self.task_num)
            eta = int(elapsed * (1 - percentage) / max(percentage, 1e-9) + 0.5)
            mark_width = int(self.bar_width * percentage)
            bar = ">" * mark_width + "-" * (self.bar_width - mark_width)
            sys.stdout.write("\033[2F\033[J")
            sys.stdout.write(
                f"[{bar}] {self.completed}/{self.task_num}, "
                f"{fps:.1f} task/s, elapsed: {int(elapsed + 0.5)}s, "
                f"ETA: {eta:5}s\n{msg}\n")
        else:
            sys.stdout.write(
                f"completed: {self.completed}, elapsed: {int(elapsed + 0.5)}s,"
                f" {fps:.1f} tasks/s")
        sys.stdout.flush()


def store_files(opt, dst_dir):
    """Snapshot the config-listed source files into the experiment dir for
    reproducibility (reference trainUM.py:37-48)."""
    mkdir(dst_dir)
    for f in opt.get("file_to_be_store") or []:
        if os.path.isfile(f):
            shutil.copy(f, os.path.join(dst_dir, os.path.basename(f)))
