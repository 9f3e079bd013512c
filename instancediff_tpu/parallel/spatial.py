"""Spatial parallelism: shard the image height across the mesh.

The reference has no sequence/context parallelism and none is needed for
parity (SURVEY.md SS5.7) — its longest attention is 1024 spatial tokens.
The analogous TPU-native scaling axis for *this* domain is spatial: restoring
images larger than one chip's HBM/compute budget by sharding the H dimension
of [B, H, W, C] activations over a mesh axis and letting XLA's SPMD
partitioner insert the convolution halo exchanges and the GroupNorm/attention
cross-shard reductions automatically (the "pick a mesh, annotate shardings,
let XLA insert collectives" recipe — no hand-written ring/halo code).

Usage:
    mesh = make_mesh(("sp",))
    batch["input"] = jax.device_put(batch["input"], spatial_sharding(mesh, 4))
    out = engine.test(batch)          # jit propagates the sharding

Every conv in the UNet becomes an H-sharded conv with a 1-row halo
exchange; GroupNorm statistics become cross-shard psums; the bottleneck
attention all-gathers its 32x32 tokens (small). Works composed with the
width-packed level 0 (packing touches only W/C dims).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, ndim: int = 4, axis: str = "sp") -> NamedSharding:
    """NamedSharding placing dim 1 (H of [B,H,W,C]) on ``axis``."""
    spec = [None] * ndim
    spec[1] = axis
    return NamedSharding(mesh, P(*spec))


def shard_spatial(mesh: Mesh, batch: dict, axis: str = "sp") -> dict:
    """device_put the image tensors of a batch with H sharded over ``axis``
    (image tensors = ndim-4 entries; everything else replicated)."""
    out = {}
    rep = NamedSharding(mesh, P())
    for k, v in batch.items():
        nd = getattr(v, "ndim", 0)
        if nd == 4:
            out[k] = jax.device_put(v, spatial_sharding(mesh, nd, axis))
        else:
            out[k] = jax.device_put(v, rep)
    return out
