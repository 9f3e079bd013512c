"""Width-packed 3x3 convolution for low-channel-count levels.

The v5e conv emitter runs the UNet's level-0 convs (C=64) at ~16% MXU
utilisation: the 64-channel contraction/output dims fill only half of the
128 MXU lanes (trace + XLA cost model, PERF.md round 2). Packing two
adjacent image columns into the channel axis — ``[B,H,W,C] ->
[B,H,W/2,2C]``, a free row-major view — doubles both contraction and output
channels. The original 3x3 conv becomes a 3x3 conv over packed columns with
a 50%-sparse rearranged kernel: output parity ``po`` at packed column ``J``
(original column ``2J+po``) reads original columns ``2(J+j-1)+pi`` for
packed tap ``j`` and input parity ``pi``, i.e. original dx = ``2j-2+pi-po``,
kept only when ``|dx| <= 1``. Twice the FLOPs, ~4x the per-FLOP rate:
2.1x fewer estimated cycles at [16,256,256,64]->64 (XLA cost model; the
packed conv itself 1.39M vs 2.92M cycles).

Exact: bit-level identical math to ``lax.conv`` SAME padding (zero taps
cover the would-be out-of-range columns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_conv3x3_kernel(w):
    """[3,3,Ci,Co] -> width-packed [3,3,2Ci,2Co] (50% structurally zero)."""
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    wp = jnp.zeros((3, 3, 2 * Ci, 2 * Co), w.dtype)
    for j in range(3):
        for pi in range(2):
            for po in range(2):
                dx = 2 * j - 2 + pi - po
                if -1 <= dx <= 1:
                    wp = wp.at[:, j, pi * Ci:(pi + 1) * Ci,
                               po * Co:(po + 1) * Co].set(w[:, dx + 1])
    return wp


def packed_conv3x3(x, w, b=None):
    """3x3 SAME conv computed width-packed. Falls back to the plain conv
    when the width is odd (packing needs W % 2 == 0)."""
    B, H, W, C = x.shape
    Co = w.shape[-1]
    if W % 2:
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return y if b is None else y + b
    xp = x.reshape(B, H, W // 2, 2 * C)
    wp = pack_conv3x3_kernel(w)
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    yp = jax.lax.conv_general_dilated(xp, wp, (1, 1), "SAME",
                                      dimension_numbers=dn)
    if b is not None:
        yp = yp + jnp.tile(b, 2)
    return yp.reshape(B, H, W, Co)
