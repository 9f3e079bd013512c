"""Host input pipeline: batching + background prefetch.

Replaces the reference's pinned-memory torch DataLoader workers
(data/__init__.py:21-29) with a NumPy collate + a single background prefetch
thread that overlaps host IO with device compute (the 1-core-per-host design
point of this image; ``jax.device_put`` of the assembled NHWC batch is the
H2D boundary). Batches are dicts of stacked arrays ready for the jitted step:
``input``/``target`` [B,H,W,1], ``A_emb`` [B,1,E], ``type_idx`` [B] int32.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(samples):
    return {
        "input": np.stack([s["LQ"] for s in samples]),
        "target": np.stack([s["GT"] for s in samples]),
        "A_emb": np.stack([s["A_emb"] for s in samples]),
        "type_idx": np.stack([s["type_idx"] for s in samples]),
        "names": [s["name"] for s in samples],
        "LQ_path": [s["LQ_path"] for s in samples],
        "GT_path": [s["GT_path"] for s in samples],
    }


class DataLoader:
    """Minimal map-style loader: sampler -> dataset -> collate, with optional
    background prefetch (``n_prefetch`` batches ahead)."""

    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 drop_last=False, n_prefetch=2, seed=0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.sampler = sampler
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.n_prefetch = n_prefetch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx.tolist()

    def _batches(self):
        idx = self._indices()
        stop = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        fast = getattr(self.dataset, "batch_load", None)
        for s in range(0, stop, self.batch_size):
            chunk = idx[s : s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            if fast is not None:
                yield fast(chunk)
            else:
                yield collate([self.dataset[i] for i in chunk])

    def __iter__(self):
        if self.n_prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.n_prefetch)
        sentinel = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        th.join()
