"""Dataset/dataloader factories — parity with reference data/__init__.py:8-50.

``create_dataloader``: train phase splits the global batch across replicas
(``batch_size % world_size == 0`` asserted, drop_last, shuffle via the
epoch-seeded sampler); val/test get batch 1 with no prefetch."""

from .med_dataset import SpeckleMedDataset, create_SpeckleMedDataset, DEFAULT_TYPE_MAP
from .sampler import DistIterSampler
from .loader import DataLoader, collate
from .synthetic import make_synthetic_dataset


def create_dataset(dataset_opt):
    mode = dataset_opt["mode"]
    if mode == "SpeckleMed":
        return create_SpeckleMedDataset(dataset_opt)
    if mode == "Synthetic":
        return make_synthetic_dataset(dataset_opt)
    raise NotImplementedError(f"Dataset mode [{mode}] is not recognized.")


def create_dataloader(dataset, dataset_opt, opt=None, sampler=None):
    phase = dataset_opt["phase"]
    if phase == "train":
        # Single-process SPMD: this process feeds the whole mesh, so the
        # loader yields the GLOBAL batch and shard_batch splits it across
        # the 'dp' axis. (The reference's per-process DDP divided the batch
        # per rank, data/__init__.py:14-15; the multi-host analogue here is
        # the n_hosts divisor with DistIterSampler rank sharding.)
        world_size = (opt or {}).get("world_size") or 1
        n_hosts = (opt or {}).get("n_hosts") or 1
        batch_size = dataset_opt["batch_size"]
        assert batch_size % world_size == 0, "batch must divide across replicas"
        assert batch_size % n_hosts == 0, (
            f"global batch {batch_size} must divide across {n_hosts} hosts")
        per_host = batch_size // n_hosts
        shuffle = sampler is None
        return DataLoader(
            dataset,
            batch_size=per_host,
            sampler=sampler,
            shuffle=shuffle,
            drop_last=True,
            n_prefetch=2,
        )
    return DataLoader(dataset, batch_size=dataset_opt.get("batch_size") or 1,
                      shuffle=False, drop_last=False, n_prefetch=0)


__all__ = [
    "create_dataset",
    "create_dataloader",
    "SpeckleMedDataset",
    "create_SpeckleMedDataset",
    "DistIterSampler",
    "DataLoader",
    "collate",
    "make_synthetic_dataset",
    "DEFAULT_TYPE_MAP",
]
