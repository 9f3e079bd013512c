"""Fully width-packed level-0 compute for the UNet (TPU).

The flagship UNet's level-0 runs at C=64 on 256px images: the v5e conv
emitter fills only half its 128 MXU lanes (measured ~16% utilisation; the
level-0 blocks are ~44% of sampler step time, PERF.md round 2). Packing two
adjacent image columns into channels — ``[B,H,W,C] -> [B,H,W/2,2C]`` — runs
every level-0 conv, GroupNorm and elementwise op at full lane width.

Per-conv packing loses to relayout copies (measured: 51 copies/step,
16 ms), so level 0 stays packed END-TO-END: the solver state itself is
packed, and all level-0 ops consume/produce packed tensors via exact kernel
transforms. Channel layout is "segment parity-major": a concatenation of
logical segments [C1, C2, ...] is stored as
``[seg1@col0, seg1@col1, seg2@col0, seg2@col1, ...]`` so packed tensors
concatenate directly and consumers account for the order in their kernels.

All transforms are mathematically exact (same taps, zero-filled elsewhere);
tests compare against the plain lax ops bit-for-bit in f32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def pack_w(x):
    """[B,H,W,C] -> packed [B,H,W/2,2C] (free row-major view)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unpack_w(x):
    """packed [B,H,Wp,2C] -> [B,H,2*Wp,C]."""
    B, H, Wp, C2 = x.shape
    return x.reshape(B, H, 2 * Wp, C2 // 2)


def seg_offsets(segments: Sequence[int]):
    offs, base = [], 0
    for c in segments:
        offs.append(base)
        base += c
    return offs, base


def tile_channels(v, segments: Sequence[int]):
    """Logical per-channel vector [sumC] -> packed segment-parity-major
    [2*sumC]: [seg1, seg1, seg2, seg2, ...]."""
    offs, total = seg_offsets(segments)
    assert v.shape[-1] == total, (v.shape, segments)
    parts = []
    for off, c in zip(offs, segments):
        s = v[..., off:off + c]
        parts.extend([s, s])
    return jnp.concatenate(parts, axis=-1)


def _seg_packed_index(off, c, parity, segments):
    """Packed index range of (segment offset off, width c, parity)."""
    offs, _ = seg_offsets(segments)
    i = offs.index(off)
    base = 2 * off
    return base + parity * c


def pack_kernel3x3(w, segments: Sequence[int]):
    """[3,3,sumC,Co] -> packed [3,3,2*sumC,2*Co].

    Output parity po at packed column J (original column 2J+po) reads
    original column 2(J+j-1)+pi => dx = 2j-2+pi-po, kept iff |dx| <= 1."""
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3
    offs, total = seg_offsets(segments)
    assert Ci == total, (Ci, segments)
    wp = jnp.zeros((3, 3, 2 * total, 2 * Co), w.dtype)
    for j in range(3):
        for pi in range(2):
            for po in range(2):
                dx = 2 * j - 2 + pi - po
                if not -1 <= dx <= 1:
                    continue
                for off, c in zip(offs, segments):
                    row = 2 * off + pi * c
                    wp = wp.at[:, j, row:row + c,
                               po * Co:(po + 1) * Co].set(
                                   w[:, dx + 1, off:off + c])
    return wp


def packed_conv3x3(xp, w, b=None, segments: Sequence[int] | None = None,
                   k_split: Sequence[Sequence[int]] | None = None,
                   int8: bool = False, decomp: bool = False):
    """3x3 SAME conv on a packed tensor -> packed [.., 2*Co].

    ``int8``: quantize the transformed kernel (per packed-output-channel) and
    the packed activations (per-tensor dynamic) and contract on the int8 MXU
    path — 2x the bf16 rate on v5e (ops/int8.py; engine.int8_conv).

    ``k_split``: optional grouping of segment indices (e.g. ``[(0, 1), (2,)]``
    for segments (64, 64, 16)); the conv is computed as a SUM of per-group
    convs over channel slices — exact by linearity. Grouping the wide
    segments to a multiple of 64 (128 packed lanes per pair of K-tiles)
    avoids padding the MXU contraction dimension with the thin score-map
    tail (PERF.md round-3 K-tile fragmentation lever).

    ``decomp``: input-grouped decompositions replacing the 2x-FLOPs dense
    transformed kernel — "pair"/ True = two width-2 convs at 1.33x logical
    FLOPs (packed_conv3x3_pair); "tap4" = four convs at exactly 1.0x
    (packed_conv3x3_decomposed; measured LOSS end-to-end, PERF.md). Takes
    precedence over ``k_split``."""
    C2 = xp.shape[-1]
    segments = list(segments) if segments is not None else [C2 // 2]
    if decomp and not int8:
        if decomp == "tap4":
            return packed_conv3x3_decomposed(xp, w, b, segments=segments)
        return packed_conv3x3_pair(xp, w, b, segments=segments)
    if k_split is not None:
        offs, _ = seg_offsets(segments)
        total = None
        for group in k_split:
            g = sorted(group)
            gsegs = [segments[i] for i in g]
            # packed slices of this group's segments (contiguous runs only
            # when the group is a run; general case concatenates slices)
            xs = jnp.concatenate(
                [xp[..., 2 * offs[i]:2 * (offs[i] + segments[i])] for i in g],
                axis=-1)
            ws = jnp.concatenate(
                [w[:, :, offs[i]:offs[i] + segments[i], :] for i in g], axis=2)
            y = packed_conv3x3(xs, ws, None, segments=gsegs, int8=int8)
            total = y if total is None else total + y
        if b is not None:
            total = total + jnp.tile(b, 2)
        return total
    wp = (w if w.ndim == 4 and w.shape[2] == 2 * sum(segments)
          else pack_kernel3x3(w, segments))  # accept pre-packed kernels
    if int8:
        from .int8 import int8_conv

        yp = int8_conv(xp, wp, None, out_dtype=xp.dtype)
    else:
        dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        yp = jax.lax.conv_general_dilated(xp, wp, (1, 1), "SAME",
                                          dimension_numbers=dn)
    if b is not None:
        yp = yp + jnp.tile(b, 2)
    return yp


def pack_kernel1x1(w, segments: Sequence[int]):
    """1x1 kernel [1,1,sumC,Co] or [sumC,Co] -> block-diagonal [2*sumC,2*Co]."""
    offs, total = seg_offsets(segments)
    Ci, Co = w.shape[-2], w.shape[-1]
    assert Ci == total
    w2 = w.reshape(Ci, Co) if w.ndim == 4 else w
    wp = jnp.zeros((2 * total, 2 * Co), w2.dtype)
    for parity in range(2):
        for off, c in zip(offs, segments):
            row = 2 * off + parity * c
            wp = wp.at[row:row + c, parity * Co:(parity + 1) * Co].set(
                w2[off:off + c])
    return wp


def packed_conv1x1(xp, w, b=None, segments: Sequence[int] | None = None):
    """1x1 conv on packed input -> packed output (block-diagonal kernel)."""
    C2 = xp.shape[-1]
    segments = list(segments) if segments is not None else [C2 // 2]
    total = sum(segments)
    wp = (w if w.ndim == 2 and w.shape[0] == 2 * total
          else pack_kernel1x1(w, segments))  # accept pre-packed matrices
    yp = xp @ wp
    if b is not None:
        yp = yp + jnp.tile(b, 2)
    return yp


def packed_conv3x3_decomposed(xp, w, b=None, segments: Sequence[int] | None = None):
    """3x3 SAME conv on a packed tensor at EXACTLY logical FLOPs.

    The dense packed kernel (pack_kernel3x3) runs at 2x logical FLOPs
    (50%-sparse [3,3,2C,2Co]). Grouping the taps by INPUT (column, parity)
    instead removes the zeros:

      output p0 (orig col 2J) reads (J-1,p1)w0, (J,p0)w1, (J,p1)w2
      output p1 (orig col 2J+1) reads (J,p0)w0, (J,p1)w1, (J+1,p0)w2

    so the conv is four [3,1]-kernel convs summed:
      A: xp_p0 with [w1 | w0] -> all 2Co lanes      (full-lane, 1/3 of MACs)
      B: xp_p1 with [w2 | w1] -> all 2Co lanes      (full-lane, 1/3)
      C: xp_p1 shifted -1 col with w0 -> p0 half    (half-lane, 1/6)
      D: xp_p0 shifted +1 col with w2 -> p1 half    (half-lane, 1/6)
    Shifts are expressed as asymmetric (+1,-1)/(-1,+1) W-padding. Exact; the
    MXU cost is ~1.2x logical-time vs the dense kernel's 2x IF per-op
    overheads don't dominate (engine.decomp_l0 — measure end to end)."""
    C2 = xp.shape[-1]
    segments = list(segments) if segments is not None else [C2 // 2]
    offs, total = seg_offsets(segments)
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3 and Ci == total

    # per-parity channel views (segment-parity-major layout)
    xp0 = jnp.concatenate(
        [xp[..., 2 * o:2 * o + c] for o, c in zip(offs, segments)], axis=-1)
    xp1 = jnp.concatenate(
        [xp[..., 2 * o + c:2 * o + 2 * c] for o, c in zip(offs, segments)],
        axis=-1)

    def conv(x, k, wpad):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), wpad), dimension_numbers=dn)

    w0, w1, w2 = w[:, 0:1], w[:, 1:2], w[:, 2:3]  # [3,1,Ci,Co] each
    kA = jnp.concatenate([w1, w0], axis=-1)  # -> [p0 | p1] halves
    kB = jnp.concatenate([w2, w1], axis=-1)
    y = conv(xp0, kA, (0, 0)) + conv(xp1, kB, (0, 0))
    c_half = conv(xp1, w0, (1, -1))  # output col J reads input col J-1
    d_half = conv(xp0, w2, (-1, 1))  # output col J reads input col J+1
    y = y + jnp.concatenate([c_half, d_half], axis=-1)
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


def packed_conv3x3_pair(xp, w, b=None, segments: Sequence[int] | None = None):
    """3x3 SAME conv on a packed tensor as TWO width-2 convs (1.33x logical
    FLOPs vs the dense transformed kernel's 2x).

    Groups the four decomposed taps (packed_conv3x3_decomposed) by input
    parity: all xp0 reads become one [3,2] conv (pad W (0,1)), all xp1 reads
    one [3,2] conv (pad W (1,0)); each kernel is 25% sparse:

      A[:,0] = [w1 | w0], A[:,1] = [0 | w2]   on xp0
      B[:,0] = [w0 | 0 ], B[:,1] = [w2 | w1]  on xp1

    Both emit full 2Co lanes and sum — no output concat, and for a single
    segment the parity views are contiguous channel slices
    (engine.decomp_l0 = "pair")."""
    C2 = xp.shape[-1]
    segments = list(segments) if segments is not None else [C2 // 2]
    offs, total = seg_offsets(segments)
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3 and Ci == total

    if len(segments) == 1:
        xp0, xp1 = xp[..., :total], xp[..., total:]
    else:
        xp0 = jnp.concatenate(
            [xp[..., 2 * o:2 * o + c] for o, c in zip(offs, segments)],
            axis=-1)
        xp1 = jnp.concatenate(
            [xp[..., 2 * o + c:2 * o + 2 * c] for o, c in zip(offs, segments)],
            axis=-1)

    w0, w1, w2 = w[:, 0], w[:, 1], w[:, 2]  # [3,Ci,Co] each
    z = jnp.zeros_like(w0)
    kA = jnp.stack([jnp.concatenate([w1, w0], axis=-1),
                    jnp.concatenate([z, w2], axis=-1)], axis=1)
    kB = jnp.stack([jnp.concatenate([w0, z], axis=-1),
                    jnp.concatenate([w2, w1], axis=-1)], axis=1)

    def conv(x, k, wpad):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), wpad), dimension_numbers=dn)

    y = conv(xp0, kA, (0, 1)) + conv(xp1, kB, (1, 0))
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


def packed_conv3x3_tapsum(xp, w, b=None, segments: Sequence[int] | None = None):
    """3x3 packed conv for TINY output widths (conv_out: 2*out_nc lanes).

    A direct conv with Co2=10 uses 10/128 MXU output lanes (measured
    13 TF/s, profile r3). Stacking all 9 taps' outputs on the lane dim turns
    it into ONE 1x1 matmul ``[.., 2C] @ [2C, 9*Co2]`` (90/128 lanes for the
    flagship) followed by 9 shifted slice-adds on the VPU. Exact
    (engine.tapsum_out)."""
    if w.ndim == 2:  # pre-packed tap-stacked matrix [2C, 9*Co2]
        wmat, Co2 = w, w.shape[1] // 9
    else:
        wp = pack_kernel3x3(w, list(segments) if segments is not None
                            else [xp.shape[-1] // 2])
        kh, kw, C2, Co2 = wp.shape
        wmat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(C2, kh * kw * Co2)
    z = xp @ wmat  # [B, H, Wp, 9*Co2]
    B, H, Wp, _ = z.shape
    y = None
    for dy in range(3):
        for dx in range(3):
            t = (dy * 3 + dx) * Co2
            sl = z[..., t:t + Co2]
            dh, dw = dy - 1, dx - 1  # out[i,j] = z[i+dh, j+dw]
            sl = jnp.pad(sl, ((0, 0), (max(-dh, 0), max(dh, 0)),
                              (max(-dw, 0), max(dw, 0)), (0, 0)))
            sl = sl[:, max(dh, 0):max(dh, 0) + H,
                    max(dw, 0):max(dw, 0) + Wp, :]
            y = sl if y is None else y + sl
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


# --------------------------------------------------------------------- #
# shift-alternating packing: conv pairs at 1.33x physical FLOPs          #
# --------------------------------------------------------------------- #
#
# The dense transformed 3x3 kernel (pack_kernel3x3) is 50% sparse: 2x the
# logical FLOPs. Exact multi-conv decompositions of it lose end to end
# (PERF.md: pair -18%, tap4 -28% — splitting re-reads activations and breaks
# the GN->conv producer fusion). The alternative implemented here keeps ONE
# conv per layer but alternates the packing ALIGNMENT between layers:
#
#   standard packing   col j = (x[2j],   x[2j+1])   [Wp   columns]
#   shifted  packing   col j = (x[2j-1], x[2j])     [Wp+1 columns]
#
# A 3x3 conv from standard input to SHIFTED output needs only input columns
# {j-1, j} per output column — a width-2 packed kernel, 75% dense:
# 1.33x logical FLOPs instead of 2x. The next conv maps shifted back to
# standard, again width-2/1.33x. A ResBlock's conv1/conv2 pair therefore
# runs entirely at 1.33x with NO relayout copies; only the two pad
# half-columns of the shifted tensor ((0, first-half) and (Wp, second-half))
# need masking so GroupNorm statistics and the consuming conv see exact
# zeros (engine.shift_l0).


def pack_kernel3x3_s2s(w, segments: Sequence[int]):
    """[3,3,sumC,Co] -> standard-input/shifted-output kernel [3,2,2*sumC,2*Co].

    Shifted output col j holds (o[2j-1], o[2j]); tap jj reads standard input
    col j-1+jj. First output half ("lo") = odd columns o[2j-1], second
    ("hi") = even o[2j]:
      tap0 (std col j-1): p0->lo w0, p1->lo w1, p1->hi w0
      tap1 (std col j  ): p0->lo w2, p0->hi w1, p1->hi w2
    """
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3
    offs, total = seg_offsets(segments)
    assert Ci == total, (Ci, segments)
    wp = jnp.zeros((3, 2, 2 * total, 2 * Co), w.dtype)
    # (tap, input parity, output half) -> logical kernel column index
    taps = {(0, 0, 0): 0, (0, 1, 0): 1, (0, 1, 1): 0,
            (1, 0, 0): 2, (1, 0, 1): 1, (1, 1, 1): 2}
    for (jj, pi, po), kcol in taps.items():
        for off, c in zip(offs, segments):
            row = 2 * off + pi * c
            wp = wp.at[:, jj, row:row + c, po * Co:(po + 1) * Co].set(
                w[:, kcol, off:off + c])
    return wp


def pack_kernel3x3_shift2std(w):
    """[3,3,C,Co] -> shifted-input/standard-output kernel [3,2,2C,2Co].

    Standard output col j = (y[2j], y[2j+1]); tap jj reads shifted col j+jj
    (= (x[2j+2jj-1], x[2j+2jj])):
      tap0 (shift col j  ): lo->lo w0, hi->lo w1, hi->hi w0
      tap1 (shift col j+1): lo->lo w2, lo->hi w1, hi->hi w2
    """
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3
    wp = jnp.zeros((3, 2, 2 * Ci, 2 * Co), w.dtype)
    taps = {(0, 0, 0): 0, (0, 1, 0): 1, (0, 1, 1): 0,
            (1, 0, 0): 2, (1, 0, 1): 1, (1, 1, 1): 2}
    for (jj, pi, po), kcol in taps.items():
        wp = wp.at[:, jj, pi * Ci:(pi + 1) * Ci, po * Co:(po + 1) * Co].set(
            w[:, kcol])
    return wp


def conv3x3_std_to_shift(xp, w, segments: Sequence[int] | None = None):
    """3x3 SAME conv: standard packed [B,H,Wp,2C] -> shifted [B,H,Wp+1,2Co].

    The two pad half-columns of the output — (col 0, first half) = o[-1] and
    (col Wp, second half) = o[W] — contain garbage (partial kernel taps on
    the zero-padded input) and MUST be masked by the consumer
    (gn_silu_shifted does)."""
    segments = list(segments) if segments is not None else [xp.shape[-1] // 2]
    wp = (w if w.ndim == 4 and w.shape[1] == 2
          else pack_kernel3x3_s2s(w, segments))
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xp, wp, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)


def conv3x3_shift_to_std(qp, w, b=None):
    """3x3 SAME conv: shifted packed [B,H,Wp+1,2C] -> standard [B,H,Wp,2Co].

    Requires the input's two pad half-columns to be exact zeros (they stand
    in for the logical SAME zero-padding at x[-1] / x[W])."""
    wp = (w if w.ndim == 4 and w.shape[1] == 2
          else pack_kernel3x3_shift2std(w))
    dn = jax.lax.conv_dimension_numbers(qp.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(qp, wp, (1, 1), ((1, 1), (0, 0)),
                                     dimension_numbers=dn)
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


def shifted_pad_mask(wp1: int, c2: int, dtype=jnp.float32):
    """[Wp+1, 2C] 0/1 mask zeroing the shifted tensor's two pad
    half-columns: (col 0, first half) and (col Wp, second half)."""
    m = jnp.ones((wp1, c2), dtype)
    m = m.at[0, :c2 // 2].set(0)
    m = m.at[-1, c2 // 2:].set(0)
    return m


def gn_silu_shifted(qp, gamma, beta, num_groups, eps=1e-5, silu=True,
                    fold_mode="matmul"):
    """GroupNorm(+SiLU) on a SHIFTED packed tensor [B,H,Wp+1,2C].

    Masks the two pad half-columns before the statistics (so sums are exact
    over the H*W real pixels) and again after SiLU (so the consuming
    shift->std conv sees exact zero padding)."""
    B, H, Wp1, C2 = qp.shape
    C = C2 // 2
    G = num_groups
    Cg = C // G
    mask = shifted_pad_mask(Wp1, C2, jnp.float32)
    xf = qp.astype(jnp.float32) * mask[None, None]
    psum = jnp.sum(xf, axis=(1, 2))      # [B, 2C]
    psq = jnp.sum(xf * xf, axis=(1, 2))
    colsum = psum[:, :C] + psum[:, C:]
    colsq = psq[:, :C] + psq[:, C:]
    n_el = H * (Wp1 - 1) * 2 * Cg        # real pixels per group
    mean_c, rstd_c = _group_fold(colsum, colsq, n_el, G, eps, fold_mode)
    scale_c = rstd_c * gamma.astype(jnp.float32)[None]
    shift_c = beta.astype(jnp.float32)[None] - mean_c * scale_c
    scale_p = jnp.tile(scale_c, (1, 2))
    shift_p = jnp.tile(shift_c, (1, 2))
    out = xf * scale_p[:, None, None, :] + shift_p[:, None, None, :]
    if silu:
        out = out * jax.nn.sigmoid(out)
    out = out * mask[None, None]
    return out.astype(qp.dtype)


def pack_kernel_down(w):
    """Stride-(2,2) SAME 3x3 conv kernel -> packed-input variant.

    jax SAME with k=3, s=2, in=W pads (0,1), so output col j reads original
    columns 2j, 2j+1, 2j+2 = packed (j,p0),(j,p1),(j+1,p0): width-2 packed
    kernel, stride (2,1), padding ((0,1),(0,1)). Output is UNPACKED."""
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3
    wp = jnp.zeros((3, 2, 2 * Ci, Co), w.dtype)
    wp = wp.at[:, 0, 0 * Ci:1 * Ci].set(w[:, 0])   # (j, p0) <- dx 0
    wp = wp.at[:, 0, 1 * Ci:2 * Ci].set(w[:, 1])   # (j, p1) <- dx 1
    wp = wp.at[:, 1, 0 * Ci:1 * Ci].set(w[:, 2])   # (j+1, p0) <- dx 2
    return wp


def packed_down_conv(xp, w, b=None):
    """Stride-2 3x3 SAME conv consuming a packed tensor, emitting the
    unpacked half-resolution output (the level-0 -> level-1 boundary)."""
    wp = w if w.shape[1] == 2 else pack_kernel_down(w)
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xp, wp, (2, 1), ((0, 1), (0, 1)),
                                     dimension_numbers=dn)
    return y if b is None else y + b


def pack_kernel_up(w):
    """lax.conv_transpose (4,4)/s2 SAME kernel -> packed-OUTPUT variant.

    Probed convention: input col i contributes w[kw] to output col
    c = 2i + 2 - kw (the transpose mirrors the kernel). Packed (J,po):
    c = 2J+po => kw = 2(i-J) + 2 - po. Width-3 window i = J-1+jj:
      po=0: (jj0, kw0), (jj1, kw2);  po=1: (jj1, kw1), (jj2, kw3).
    The H axis keeps transpose semantics: kernel flipped along kh,
    lhs_dilation 2, pad (1,1)."""
    kh, kw_, Ci, Co = w.shape
    assert kh == 4 and kw_ == 4
    # H axis: correlation over the lhs-dilated input gives r = 2i + pl - k;
    # with pad_lo 2 this matches the transpose's r = 2i + 2 - kh at k == kh,
    # so the kernel is used unflipped.
    wp = jnp.zeros((4, 3, Ci, 2 * Co), w.dtype)
    wp = wp.at[:, 0, :, 0 * Co:1 * Co].set(w[:, 0])
    wp = wp.at[:, 1, :, 0 * Co:1 * Co].set(w[:, 2])
    wp = wp.at[:, 1, :, 1 * Co:2 * Co].set(w[:, 1])
    wp = wp.at[:, 2, :, 1 * Co:2 * Co].set(w[:, 3])
    return wp


def packed_up_conv(x, w, b=None):
    """ConvTranspose (4,4)/s2 SAME consuming unpacked half-res input,
    emitting the PACKED full-res output (level-1 -> level-0 boundary)."""
    wp = w if w.shape[1] == 3 else pack_kernel_up(w)
    dn = jax.lax.conv_dimension_numbers(x.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # H: lhs-dilated by 2, pad (2,2) -> r = 2i + 2 - k (see pack_kernel_up)
    yp = jax.lax.conv_general_dilated(
        x, wp, (1, 1), ((2, 2), (1, 1)), lhs_dilation=(2, 1),
        dimension_numbers=dn)
    if b is not None:
        yp = yp + jnp.tile(b, 2)
    return yp


def pack_kernel_up_subpix(w):
    """ConvTranspose (4,4)/s2 SAME kernel -> sub-pixel dense (2,2) kernel.

    The lhs-dilated form executes 16 taps per output of which only 4 land on
    real (non-dilation-zero) pixels. Splitting outputs by (H, W) parity,
    phase (dy, dx) reads exactly a 2x2 input window with taps
    w[2a+dy, 2b+dx] (a, b in {0,1}; from out[r] = sum_k w[k] y[r+k-2] on the
    2x-dilated input, the surviving even offsets). Stacking the four phases
    along output channels gives ONE dense (2,2,Ci,4Co) conv at exactly
    logical FLOPs and 4x the output lanes; the consumer interleaves.
    Phase channel order: p = 2*dy + dx (row-major)."""
    kh, kw_, Ci, Co = w.shape
    assert kh == 4 and kw_ == 4
    wp = jnp.zeros((2, 2, Ci, 4 * Co), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            p = 2 * dy + dx
            for a in (0, 1):
                for c in (0, 1):
                    wp = wp.at[a, c, :, p * Co:(p + 1) * Co].set(
                        w[2 * a + dy, 2 * c + dx])
    return wp


def _subpix_phases(x, w):
    """Shared sub-pixel core: VALID (2,2) conv over the (1,1)-padded input.

    Returns (z, Co, H, W) with z[b, i+dy, j+dx, p*Co:(p+1)*Co] equal to
    out[b, 2i+dy, 2j+dx] of ConvTranspose (4,4)/s2 SAME (p = 2*dy+dx)."""
    wp = w if (w.shape[0] == 2 and w.shape[1] == 2) else pack_kernel_up_subpix(w)
    Co = wp.shape[-1] // 4
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(xp, wp, (1, 1), ((0, 0), (0, 0)),
                                     dimension_numbers=dn)
    return z, Co, H, W


def conv_transpose_subpix(x, w, b=None):
    """ConvTranspose (4,4)/s2 SAME via the sub-pixel dense conv.

    Exact (same taps, reassociated): out[2i+dy, 2j+dx] =
    z[i+dy, j+dx, phase(dy,dx)] interleaved back to [B,2H,2W,Co]."""
    z, Co, H, W = _subpix_phases(x, w)

    def blk(dy, dx):
        p = 2 * dy + dx
        return z[:, dy:H + dy, dx:W + dx, p * Co:(p + 1) * Co]

    r0 = jnp.stack([blk(0, 0), blk(0, 1)], axis=3)  # [B,H,W,2,Co]
    r1 = jnp.stack([blk(1, 0), blk(1, 1)], axis=3)
    y = jnp.stack([r0, r1], axis=2)                 # [B,H,2,W,2,Co]
    y = y.reshape(x.shape[0], 2 * H, 2 * W, Co)
    return y if b is None else y + b


def packed_up_conv_subpix(x, w, b=None):
    """Sub-pixel ConvTranspose emitting the PACKED [B,2H,W,2Co] output
    (level-1 -> level-0 boundary): the W-parity phases ARE the packed
    channel halves, so only the H interleave remains."""
    z, Co, H, W = _subpix_phases(x, w)

    def row(dy):
        p0, p1 = 2 * dy, 2 * dy + 1
        return jnp.concatenate(
            [z[:, dy:H + dy, 0:W, p0 * Co:(p0 + 1) * Co],
             z[:, dy:H + dy, 1:W + 1, p1 * Co:(p1 + 1) * Co]], axis=-1)

    yp = jnp.stack([row(0), row(1)], axis=2).reshape(
        x.shape[0], 2 * H, W, 2 * Co)
    if b is not None:
        yp = yp + jnp.tile(b, 2)
    return yp


def _group_fold(colsum, colsq, n_el, G, eps, fold_mode="matmul"):
    """Per-channel sums [B,C] -> per-channel (mean, rstd) via the group
    reduction. ``matmul``: one-hot [C,G] matmuls (historical default);
    ``reshape``: contiguous [B,G,Cg] reduce + repeat (exact — groups are
    contiguous channel runs; engine.gnfold_l0 measures the difference:
    the tiny dot_generals are launch-overhead-bound in the device trace)."""
    B, C = colsum.shape
    Cg = C // G
    if fold_mode == "reshape":
        mean_g = colsum.reshape(B, G, Cg).sum(-1) / n_el
        var_g = colsq.reshape(B, G, Cg).sum(-1) / n_el - mean_g**2
        mean_c = jnp.repeat(mean_g, Cg, axis=-1)
        rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), Cg, axis=-1)
        return mean_c, rstd_c
    col_g = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // Cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (col_g == grp).astype(jnp.float32)
    mean_g = (colsum @ M) / n_el
    var_g = (colsq @ M) / n_el - mean_g**2
    mean_c = mean_g @ M.T
    rstd_c = jax.lax.rsqrt(var_g + eps) @ M.T
    return mean_c, rstd_c


def gn_silu_packed_parts(parts, gamma, beta, num_groups,
                         segments: Sequence[int], eps=1e-5, silu=True,
                         fold_mode="matmul"):
    """``gn_silu_packed`` over a CONCAT-FREE input: the decoder j==0 blocks'
    [h | skip | smm] concat arrives as separate packed parts (one per
    segment) and is never materialised (VERDICT r3 item 1a). Exact: group
    statistics combine the per-part channel sums; returns normalised parts.
    """
    assert len(parts) == len(segments)
    colsums, colsqs = [], []
    for p, c in zip(parts, segments):
        assert p.shape[-1] == 2 * c, (p.shape, c)
        pf = p.astype(jnp.float32)
        s = jnp.sum(pf, axis=(1, 2))       # [B, 2c]
        q = jnp.sum(pf * pf, axis=(1, 2))
        colsums.append(s[:, :c] + s[:, c:])
        colsqs.append(q[:, :c] + q[:, c:])
    colsum = jnp.concatenate(colsums, axis=-1)  # [B, total] (tiny)
    colsq = jnp.concatenate(colsqs, axis=-1)
    total = sum(segments)
    G = num_groups
    Cg = total // G
    n_el = parts[0].shape[1] * parts[0].shape[2] * 2 * Cg
    mean_c, rstd_c = _group_fold(colsum, colsq, n_el, G, eps, fold_mode)
    scale_c = rstd_c * gamma.astype(jnp.float32)[None]
    shift_c = beta.astype(jnp.float32)[None] - mean_c * scale_c
    outs, off = [], 0
    for p, c in zip(parts, segments):
        sc = jnp.tile(scale_c[:, off:off + c], (1, 2))
        sh = jnp.tile(shift_c[:, off:off + c], (1, 2))
        o = p.astype(jnp.float32) * sc[:, None, None, :] + sh[:, None, None, :]
        if silu:
            o = o * jax.nn.sigmoid(o)
        outs.append(o.astype(p.dtype))
        off += c
    return outs


def conv3x3_tail_matmul(x, w):
    """Thin-K 3x3 SAME conv as ONE im2col matmul.

    The TPU conv emitter pads the contraction dim to a 128-lane K-tile PER
    TAP, so a 16-channel tail segment costs 9 full MXU passes at 12.5% fill
    (the r4 trace's 59-69% concat-conv efficiencies match this model
    exactly). Stacking the 9 shifted views along channels gives K = 9*C
    (e.g. 144 -> 2 passes). Exact: same taps, same summation."""
    B, H, W_, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [p[:, ky:ky + H, kx:kx + W_, :]
            for ky in range(kh) for kx in range(kw)]
    z = jnp.concatenate(cols, axis=-1)
    return z @ w.reshape(kh * kw * C, w.shape[-1])


def conv3x3_s2s_tail_matmul(xp, wp):
    """Thin-K std->shift packed conv as ONE im2col matmul.

    ``wp`` is an s2s-packed kernel slice [3,2,2c,2Co] (pack_kernel3x3_s2s
    layout); output matches conv3x3_std_to_shift's [B,H,Wp+1,2Co] incl. the
    two garbage pad half-columns (masked downstream by gn_silu_shifted)."""
    B, H, Wp, C2 = xp.shape
    p = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [p[:, ky:ky + H, jj:jj + Wp + 1, :]
            for ky in range(3) for jj in range(2)]
    z = jnp.concatenate(cols, axis=-1)
    return z @ wp.reshape(6 * C2, wp.shape[-1])


def conv3x3_std_to_shift_parts(parts, w, segments: Sequence[int],
                               tail_matmul: bool = False):
    """Concat-free ``conv3x3_std_to_shift``: per-segment convs summed.

    Exact — the s2s packed kernel's input-channel rows are segment-major
    (rows [2*off, 2*off+2c) belong to segment (off, c)), so slicing it per
    segment and summing the per-part convs reproduces the concat conv.
    ``tail_matmul``: thin trailing segments (< 64 logical channels) go
    through the im2col matmul instead of a per-tap-padded conv."""
    wp = (w if w.ndim == 4 and w.shape[1] == 2
          else pack_kernel3x3_s2s(w, list(segments)))
    y, off = None, 0
    for p, c in zip(parts, segments):
        ws = wp[:, :, 2 * off:2 * off + 2 * c, :]
        if tail_matmul and c < 64:
            yi = conv3x3_s2s_tail_matmul(p, ws)
        else:
            dn = jax.lax.conv_dimension_numbers(p.shape, ws.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            yi = jax.lax.conv_general_dilated(p, ws, (1, 1), ((1, 1), (1, 1)),
                                              dimension_numbers=dn)
        y = yi if y is None else y + yi
        off += c
    return y


def packed_conv3x3_parts(parts, w, b=None, segments: Sequence[int] | None = None,
                         tail_matmul: bool = False):
    """Concat-free ``packed_conv3x3`` (std->std): per-segment convs summed."""
    segments = list(segments) if segments is not None else [
        p.shape[-1] // 2 for p in parts]
    # pre-packed std->std kernels are [3,3,2*total,2*Co] (vs raw [3,3,total,Co])
    wp = (w if w.ndim == 4 and w.shape[2] == 2 * sum(segments)
          else pack_kernel3x3(w, segments))
    y, off = None, 0
    for p, c in zip(parts, segments):
        ws = wp[:, :, 2 * off:2 * off + 2 * c, :]
        if tail_matmul and c < 64:
            yi = conv3x3_tail_matmul(p, ws)
        else:
            dn = jax.lax.conv_dimension_numbers(p.shape, ws.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            yi = jax.lax.conv_general_dilated(p, ws, (1, 1), "SAME",
                                              dimension_numbers=dn)
        y = yi if y is None else y + yi
        off += c
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


def packed_conv1x1_parts(parts, w, b=None, segments: Sequence[int] | None = None):
    """Concat-free ``packed_conv1x1``: per-segment matmuls summed."""
    segments = list(segments) if segments is not None else [
        p.shape[-1] // 2 for p in parts]
    total = sum(segments)
    wp = (w if w.ndim == 2 and w.shape[0] == 2 * total
          else pack_kernel1x1(w, segments))
    y, off = None, 0
    for p, c in zip(parts, segments):
        yi = p @ wp[2 * off:2 * off + 2 * c]
        y = yi if y is None else y + yi
        off += c
    if b is not None:
        y = y + jnp.tile(b, 2)
    return y


def gn_silu_packed(xp, gamma, beta, num_groups, segments: Sequence[int],
                   eps=1e-5, silu=True, fold_mode="matmul"):
    """GroupNorm(+SiLU) on a packed tensor, exact per-channel statistics.

    Stats: one streaming sum/sumsq over the packed lanes [B, 2*sumC], folded
    back to logical channels; group reduction via ``_group_fold``;
    normalize with segment-parity-tiled coefficients."""
    B = xp.shape[0]
    offs, total = seg_offsets(segments)
    G = num_groups
    Cg = total // G
    xf = xp.astype(jnp.float32)
    psum = jnp.sum(xf, axis=(1, 2))      # [B, 2*total]
    psq = jnp.sum(xf * xf, axis=(1, 2))
    # fold packed -> logical channel order
    def fold(v):
        parts = []
        for off, c in zip(offs, segments):
            base = 2 * off
            parts.append(v[:, base:base + c] + v[:, base + c:base + 2 * c])
        return jnp.concatenate(parts, axis=-1)  # [B, total]
    colsum, colsq = fold(psum), fold(psq)
    n_el = xp.shape[1] * xp.shape[2] * 2 * Cg
    mean_c, rstd_c = _group_fold(colsum, colsq, n_el, G, eps, fold_mode)
    scale_c = rstd_c * gamma.astype(jnp.float32)[None]
    shift_c = beta.astype(jnp.float32)[None] - mean_c * scale_c
    scale_p = tile_channels(scale_c, segments)
    shift_p = tile_channels(shift_c, segments)
    out = xf * scale_p[:, None, None, :] + shift_p[:, None, None, :]
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(xp.dtype)
