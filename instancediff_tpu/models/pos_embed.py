"""Position-embedding utilities for the ViT towers.

TPU-native equivalent of the vendored ``models/BiomedCLIP/BiomedCLIP/
pos_embed.py`` (2D sin-cos tables, :20-67; DeiT-style checkpoint
interpolation, :75-96) and of ``big_vision.py:50-61``'s
``resample_abs_pos_embed`` call — loading pretrained ViT weights at a
different input resolution requires resizing the absolute position grid.

Init tables are built host-side in numpy once (they are parameters, not
traced compute); resampling runs through ``jax.image.resize`` so it can sit
inside a jitted conversion pipeline if needed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] interleaved-free sin/cos table
    (standard MAE/ViT formula; reference pos_embed.py:49-67)."""
    assert embed_dim % 2 == 0, "sin-cos embedding needs an even dim"
    omega = 1.0 / 10000.0 ** (np.arange(embed_dim // 2, dtype=np.float64)
                              / (embed_dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """[grid*grid(+1), embed_dim] fixed 2D sin-cos table — half the channels
    encode the H coordinate, half the W coordinate (reference
    pos_embed.py:20-46; ``pos_embed_type='sin_cos_2d'`` in the vendored
    model.py:41). The optional cls row is zeros, as upstream."""
    assert embed_dim % 4 == 0, "2D sin-cos needs embed_dim % 4 == 0"
    gy, gx = np.meshgrid(np.arange(grid_size, dtype=np.float64),
                         np.arange(grid_size, dtype=np.float64),
                         indexing="ij")
    # upstream quirk kept for numerical parity: meshgrid(grid_w, grid_h)
    # with 'xy' indexing makes the FIRST half encode the W coordinate
    # (pos_embed.py:28-29 "here w goes first", despite the emb_h comment)
    emb = np.concatenate([_sincos_1d(embed_dim // 2, gx),
                          _sincos_1d(embed_dim // 2, gy)], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def interpolate_pos_embed(pos, target_len: int, n_prefix: int = 1):
    """Resample a [n_prefix + g*g, D] absolute position table to
    [n_prefix + g'*g', D]: prefix (cls/dist) rows kept unchanged, grid rows
    bicubic-resized over the 2D grid (reference pos_embed.py:75-96 /
    timm ``resample_abs_pos_embed`` via big_vision.py:53).

    Accepts and returns jnp arrays; both grids must be square."""
    pos = jnp.asarray(pos)
    n_old = pos.shape[0] - n_prefix
    n_new = target_len - n_prefix
    if n_old == n_new:
        return pos
    g_old = int(round(float(np.sqrt(n_old))))
    g_new = int(round(float(np.sqrt(n_new))))
    if g_old * g_old != n_old or g_new * g_new != n_new:
        raise ValueError(
            f"non-square position grids: {n_old} -> {n_new} tokens")
    prefix, grid = pos[:n_prefix], pos[n_prefix:]
    grid = grid.reshape(g_old, g_old, -1)
    grid = jax.image.resize(grid, (g_new, g_new, grid.shape[-1]),
                            method="cubic")
    return jnp.concatenate([prefix, grid.reshape(g_new * g_new, -1)], axis=0)


def resize_text_pos_embed(pos, target_len: int):
    """Resample a TEXT position table [L, D] -> [target_len, D] by 1D linear
    interpolation — the analogue of the vendored ``resize_text_pos_embed``
    (reference model.py:541-570: ``F.interpolate(mode='linear',
    align_corners=False)`` over the position axis; width must be unchanged,
    equal lengths are a no-op). ``jax.image.resize(method='linear')`` uses
    the same half-pixel-center convention as torch's align_corners=False,
    so values match the reference op."""
    pos = jnp.asarray(pos)
    if pos.ndim != 2:
        raise ValueError(f"text pos table must be [L, D], got {pos.shape}")
    L = pos.shape[0]
    target_len = int(target_len)
    if L == target_len:
        return pos
    # torch's non-antialiased linear resize: sample at half-pixel centers and
    # lerp the two nearest rows (jax.image.resize antialiases on downscale,
    # which torch's antialias=False does not)
    x = (jnp.arange(target_len, dtype=jnp.float32) + 0.5) * (L / target_len) - 0.5
    x = jnp.clip(x, 0.0, L - 1)
    lo = jnp.floor(x).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, L - 1)
    w = (x - lo)[:, None].astype(pos.dtype)
    return pos[lo] * (1 - w) + pos[hi] * w
