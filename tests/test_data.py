import json
import os

import numpy as np
import pytest

from instancediff_tpu.data import (
    DataLoader,
    DistIterSampler,
    create_dataset,
    create_dataloader,
)
from instancediff_tpu.data.med_dataset import normalize_pair, DEFAULT_TYPE_MAP
from instancediff_tpu.data.synthetic import (
    SyntheticMedDataset,
    write_synthetic_index,
)


def test_normalize_pair_modalities():
    a = np.array([[-10.0, 900.0, 2000.0]], dtype=np.float32)
    b = a.copy()
    na, nb = normalize_pair(a.copy(), b.copy(), "scatter artifact in CT")
    np.testing.assert_allclose(na, np.array([[-1.0, 0.0, 1.0]]), atol=1e-6)
    # low-dose CT gets NO clamp in the reference (MedSpeckle.py:56-61): data
    # arrives in [0,1] and only the global affine applies
    a = np.array([[0.0, 0.5, 1.0]], dtype=np.float32)
    na, _ = normalize_pair(a.copy(), a.copy(), "noise in low dose CT")
    np.testing.assert_allclose(na, np.array([[-1.0, 0.0, 1.0]]), atol=1e-6)
    a = np.array([[0.0, 127.5, 300.0]], dtype=np.float32)
    na, _ = normalize_pair(a.copy(), a.copy(), "noise in cryo-EM image")
    np.testing.assert_allclose(na, np.array([[-1.0, 0.0, 1.0]]), atol=1e-6)
    # default: plain affine
    a = np.array([[0.0, 0.5, 1.0]], dtype=np.float32)
    na, _ = normalize_pair(a.copy(), a.copy(), "speckle in OCT")
    np.testing.assert_allclose(na, np.array([[-1.0, 0.0, 1.0]]), atol=1e-6)


def test_dist_iter_sampler_semantics():
    s0 = DistIterSampler(10, num_replicas=2, rank=0)
    s1 = DistIterSampler(10, num_replicas=2, rank=1)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 5
    # rank shards are disjoint positions of the same epoch-seeded permutation
    s0b = DistIterSampler(10, num_replicas=2, rank=0)
    s0b.set_epoch(3)
    assert list(s0b) == i0  # deterministic per epoch
    s0.set_epoch(4)
    assert list(s0) != i0  # reshuffles across epochs
    # ratio enlarges with modulo wraparound
    s = DistIterSampler(4, num_replicas=1, rank=0, ratio=3)
    idx = list(s)
    assert len(idx) == 12 and max(idx) < 4


def test_multihost_loader_semantics():
    """Simulated process_count=2: each host gets a DistIterSampler shard and
    a per-host batch of global/2; per epoch the two hosts' samples are
    disjoint and cover the epoch permutation exactly once (the multi-host
    contract behind trainUM --multihost and the n_hosts divisor)."""
    ds = SyntheticMedDataset(n=8, res=8, seed=0, emb_dim=4)
    n_hosts, global_batch = 2, 4
    per_host = global_batch // n_hosts
    host_indices = {}
    for rank in range(n_hosts):
        sampler = DistIterSampler(len(ds), num_replicas=n_hosts, rank=rank)
        loader = create_dataloader(
            ds, {"phase": "train", "batch_size": global_batch},
            opt={"world_size": 1, "n_hosts": n_hosts}, sampler=sampler)
        loader.set_epoch(1)
        seen = []
        for batch in loader:
            assert batch["input"].shape[0] == per_host
            seen.extend(batch["LQ_path"])
        host_indices[rank] = seen
    all_seen = host_indices[0] + host_indices[1]
    assert len(all_seen) == len(ds)
    assert len(set(all_seen)) == len(ds)  # disjoint shards, full coverage
    # indivisible global batch is rejected
    with pytest.raises(AssertionError):
        create_dataloader(ds, {"phase": "train", "batch_size": 5},
                          opt={"world_size": 1, "n_hosts": 2},
                          sampler=DistIterSampler(len(ds), 2, 0))


def test_synthetic_dataset_contract():
    ds = SyntheticMedDataset(n=5, res=16, seed=0, emb_dim=8)
    item = ds[0]
    assert item["LQ"].shape == (16, 16, 1)
    assert item["GT"].shape == (16, 16, 1)
    assert item["A_emb"].shape == (1, 8)
    assert item["LQ"].min() >= -1.0 and item["LQ"].max() <= 1.0
    assert int(item["type_idx"]) == DEFAULT_TYPE_MAP[item["name"]]
    # degraded differs from clean
    assert not np.allclose(item["LQ"], item["GT"])


def test_file_dataset_roundtrip(tmp_path):
    root = str(tmp_path / "synth")
    index = write_synthetic_index(root, n_train=4, n_val=1, n_test=1, res=16, emb_dim=8)
    assert os.path.isfile(index)
    with open(index) as f:
        idx = json.load(f)
    assert set(idx) == {"train", "val", "test"} and len(idx["train"]) == 4

    params = {
        "name": "train_ds", "mode": "SpeckleMed", "dataset_file": index,
        "max_dataset_size": 10, "resolution": 16, "emb_dim": 8,
        "use_artifact_type": list(DEFAULT_TYPE_MAP),
        "phase": "train", "batch_size": 2,
    }
    ds = create_dataset(params)
    assert len(ds) == 4
    item = ds[0]
    assert item["LQ"].shape == (16, 16, 1)
    assert np.isfinite(item["LQ"]).all()

    loader = create_dataloader(ds, params, {"world_size": 1})
    batches = list(loader)
    assert len(batches) == 2  # 4 imgs / batch 2, drop_last
    b = batches[0]
    assert b["input"].shape == (2, 16, 16, 1)
    assert b["type_idx"].dtype == np.int32
    assert len(b["names"]) == 2


def test_loader_prefetch_matches_sync(tmp_path):
    ds = SyntheticMedDataset(n=6, res=16, seed=1, emb_dim=8)
    a = [b["input"].sum() for b in DataLoader(ds, batch_size=2, n_prefetch=0)]
    b = [b["input"].sum() for b in DataLoader(ds, batch_size=2, n_prefetch=2)]
    np.testing.assert_allclose(a, b)


def test_loader_with_sampler_epochs():
    ds = SyntheticMedDataset(n=8, res=16, seed=2, emb_dim=8)
    sampler = DistIterSampler(len(ds), num_replicas=1, rank=0)
    loader = DataLoader(ds, batch_size=2, sampler=sampler, drop_last=True)
    loader.set_epoch(0)
    e0 = [tuple(b["type_idx"].tolist()) for b in loader]
    loader.set_epoch(1)
    e1 = [tuple(b["type_idx"].tolist()) for b in loader]
    assert len(e0) == len(e1) == 4
    loader.set_epoch(0)
    assert [tuple(b["type_idx"].tolist()) for b in loader] == e0
