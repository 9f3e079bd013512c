"""Epoch-seeded distributed iteration sampler.

Parity with reference data/data_sampler.py:13-68 (``DistIterSampler``):
dataset-enlarging ``ratio``, epoch-seeded permutation over ``total_size`` with
modulo wraparound onto the dataset, strided rank subsampling, ``set_epoch``.
NumPy PRNG replaces the torch generator (deterministic per epoch across
hosts, the SPMD analogue of per-rank DDP sampling — SURVEY.md SS5.8)."""

from __future__ import annotations

import math

import numpy as np


class DistIterSampler:
    def __init__(self, dataset_size, num_replicas=1, rank=0, ratio=1):
        if rank >= num_replicas:
            raise ValueError("rank must be < num_replicas")
        self.dataset_size = int(dataset_size)
        self.num_replicas = int(num_replicas)
        self.rank = int(rank)
        self.epoch = 0
        self.num_samples = int(math.ceil(self.dataset_size * ratio / self.num_replicas))
        self.total_size = self.num_samples * self.num_replicas

    def __iter__(self):
        g = np.random.default_rng(self.epoch)
        indices = g.permutation(self.total_size)
        indices = indices % self.dataset_size
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self):
        return self.num_samples

    def set_epoch(self, epoch):
        self.epoch = int(epoch)
