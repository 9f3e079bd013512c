"""Synthetic SpeckleMed-compatible data.

The reference's dataset index and assets are unreleased
(`.MISSING_LARGE_BLOBS`, SURVEY.md SS0.1), so the framework ships a synthetic
generator producing (a) in-memory datasets for tests/benchmarks and (b) a
raw-float32 file tree + JSON index in the exact MedSpeckle schema
(README.md:68-102) so the file-based drivers exercise the real IO path.

Clean images are smooth random phantoms (mixture-of-Gaussians blobs +
sinusoids — banded structure roughly like tissue layers); degradations follow
ops.degradations per artifact type.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .med_dataset import DEFAULT_TYPE_MAP, normalize_pair

ARTIFACTS = list(DEFAULT_TYPE_MAP)


def make_phantom(rng, res=224):
    """Smooth structured phantom in [0,1]."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    img = 0.15 * np.sin(2 * np.pi * (3 * yy + rng.uniform(0, 1))) + 0.5
    for _ in range(6):
        cy, cx = rng.uniform(0.1, 0.9, 2)
        s = rng.uniform(0.03, 0.2)
        a = rng.uniform(-0.4, 0.5)
        img = img + a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def degrade_with_key(key, clean01, name):
    """Host-side degradation delegating to ``ops.degradations`` — the SINGLE
    source of truth for the degradation math (the on-device train-step path,
    ``apply_degradation``, runs the identical function; see
    tests/test_degrade_on_device.py for the proven host==device equivalence).
    Input [0,1] intensity, output [0,1] (files store clipped intensity; the
    device path leaves Gaussian tails unclipped)."""
    import jax
    import jax.numpy as jnp

    from ..ops.degradations import apply_degradation

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x = jnp.asarray(clean01, jnp.float32)[None, ..., None] * 2.0 - 1.0
        idx = jnp.full((1,), DEFAULT_TYPE_MAP[name], jnp.int32)
        y = apply_degradation(key, x, idx)
    out01 = (np.asarray(y)[0, ..., 0] + 1.0) / 2.0
    return np.clip(out01, 0.0, 1.0).astype(np.float32)


def degrade(rng, clean01, name):
    """Degrade with a numpy-Generator-derived PRNG key (dataset-generation
    convenience over ``degrade_with_key``)."""
    import jax

    key = jax.random.key(int(rng.integers(2**31 - 1)))
    return degrade_with_key(key, clean01, name)


class SyntheticMedDataset:
    """In-memory dataset with the SpeckleMedDataset item contract."""

    def __init__(self, n=8, res=224, artifact_types=None, seed=0, emb_dim=512):
        self.res = res
        self.emb_dim = emb_dim
        types = list(artifact_types or ARTIFACTS)
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            name = types[i % len(types)]
            clean = make_phantom(rng, res)
            deg = degrade(rng, clean, name)
            # store in raw intensity domain; normalize like the file path does
            # (low-dose CT stays in [0,1] — the reference clamps/1800 only
            # 'scatter artifact in CT', MedSpeckle.py:56-61)
            if name == "noise in cryo-EM image":
                clean_raw, deg_raw = clean * 255.0, deg * 255.0
            else:
                clean_raw, deg_raw = clean, deg
            emb = rng.standard_normal((1, emb_dim)).astype(np.float32) * 0.02
            self.items.append((deg_raw[..., None], clean_raw[..., None], name, emb, i))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        a_raw, b_raw, name, emb, i = self.items[index]
        a, b = normalize_pair(a_raw.copy(), b_raw.copy(), name)
        return {
            "LQ": a.astype(np.float32),
            "GT": b.astype(np.float32),
            "LQ_path": f"synthetic://A/{i}",
            "GT_path": f"synthetic://B/{i}",
            "name": name,
            "A_emb": emb,
            "type_idx": np.int32(DEFAULT_TYPE_MAP[name]),
        }


def make_synthetic_dataset(params):
    return SyntheticMedDataset(
        n=params.get("max_dataset_size") or 8,
        res=params.get("resolution") or 224,
        artifact_types=params.get("use_artifact_type"),
        seed=params.get("seed") or 0,
    )


def write_synthetic_index(root, n_train=8, n_val=2, n_test=2, res=224,
                          artifact_types=None, seed=0, emb_dim=512,
                          gt_only=False):
    """Write raw-f32 files + dataset_file.json in the MedSpeckle schema so the
    standard file-based loaders/drivers run without upstream assets.
    ``gt_only``: write clean images only (no *_A.raw) — for the on-device
    degradation pipeline (``datasets.*.gt_only`` + ``degrade_on_device``)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    types = list(artifact_types or ARTIFACTS)
    index = {"train": [], "val": [], "test": []}
    counter = 0
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        for i in range(n):
            name = types[counter % len(types)]
            clean = make_phantom(rng, res)
            deg = None if gt_only else degrade(rng, clean, name)
            if name == "noise in cryo-EM image":
                clean = clean * 255.0
                deg = None if deg is None else deg * 255.0
            b_path = os.path.join(root, f"{split}_{i}_B.raw")
            e_path = os.path.join(root, f"{split}_{i}_emb.raw")
            clean.astype(np.float32).tofile(b_path)
            (rng.standard_normal(emb_dim).astype(np.float32) * 0.02).tofile(e_path)
            rec = {"B": b_path, "A_emb": e_path, "name": name}
            if deg is not None:
                a_path = os.path.join(root, f"{split}_{i}_A.raw")
                deg.astype(np.float32).tofile(a_path)
                rec["A"] = a_path
            index[split].append(rec)
            counter += 1
    index_path = os.path.join(root, "dataset_file.json")
    with open(index_path, "w") as f:
        json.dump(index, f, indent=1)
    return index_path
