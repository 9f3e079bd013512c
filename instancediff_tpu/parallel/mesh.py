"""Device meshes and shardings.

TPU-native replacement for the reference's NCCL DDP stack (SURVEY.md SS2.11/
SS2.12): instead of one OS process per GPU with bucketed allreduce, training is
single-process SPMD — a ``jax.sharding.Mesh`` over all devices, the batch
sharded along ``'dp'``, parameters replicated (optionally sharded along
``'fsdp'`` ZeRO-style), and XLA inserting the gradient all-reduce over ICI
when the jitted step computes a global-batch mean loss.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("dp",), shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "dp") -> dict:
    """device_put a host batch with dim-0 sharding over the data axis (the
    H2D boundary — per-device shards transfer independently)."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v), axis))
        for k, v in batch.items()
    }


def _fsdp_spec(x, mesh: Mesh, axis: str = "fsdp"):
    """ZeRO-style parameter sharding rule: split the largest dimension that is
    divisible by the axis size; replicate otherwise."""
    size = mesh.shape[axis]
    if size == 1 or x.ndim == 0:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % size == 0 and x.shape[d] >= size:
            spec = [None] * x.ndim
            spec[d] = axis
            return P(*spec)
    return P()


# XLA SPMD partitioner bug (convolution_handler.cc:832 Check failure
# "ShapeUtil::Compatible(shard_shape, sharded_conv->shape())"): an
# fsdp-sharded ConvTranspose kernel inside the vmapped dual-net train step
# crashes partitioning (bisected to the UNet's `up_*` kernels; the same op
# partitioned in isolation is fine). Replicating just those kernels costs
# <2% of parameter memory and unblocks the fused step under fsdp.
FSDP_REPLICATE_PATTERNS = ("up_",)


def shard_params_fsdp(mesh: Mesh, params, axis: str = "fsdp"):
    """Place a parameter pytree with per-leaf FSDP sharding (path-aware:
    leaves under modules matching FSDP_REPLICATE_PATTERNS are replicated —
    see the partitioner-bug note above)."""
    def place(path, x):
        pstr = jax.tree_util.keystr(path)
        if any(pat in pstr for pat in FSDP_REPLICATE_PATTERNS):
            spec = P()
        else:
            spec = _fsdp_spec(x, mesh, axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
