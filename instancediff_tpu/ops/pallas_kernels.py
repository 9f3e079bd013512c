"""Pallas TPU kernels for the UNet hot paths.

TPU-native replacements for the reference's fused CUDA substrate
(SURVEY.md SS2.10: cuDNN/ATen conv+norm kernels, flash-attn CUDA kernels at
_modified_BiomedCLIP.py:448-517). Convolutions stay on the XLA/MXU path
(already speed-of-light there); Pallas covers what XLA fuses less well:

  * ``group_norm_silu``: GroupNorm + SiLU (+ optional residual add) in one
    HBM round-trip. A two-phase sequential grid per batch element first
    accumulates per-group sum/sumsq over spatial tiles in VMEM scratch, then
    re-streams the tiles to normalise+activate — 2 reads + 1 write per
    element versus the unfused 3+ passes.
  * ``flash_attention``: blockwise-softmax attention (log-sum-exp running
    max) for the bottleneck spatial self-attention; numerically stable in
    bf16 inputs with fp32 accumulation.

Both kernels have jnp reference implementations used as fallbacks on CPU and
as golden values in tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------- #
# GroupNorm + SiLU                                                             #
# --------------------------------------------------------------------------- #


def group_norm_silu_reference(x, gamma, beta, num_groups, eps=1e-5,
                              residual=None, silu=True):
    """jnp reference: GN over (H,W,Cg) per (B,G), fp32 stats, then affine+SiLU.

    Group statistics are computed via a channel->group one-hot matmul instead
    of reshaping the channel axis — the reshape formulation forces bad TPU
    layouts (lane-dim splits) both in XLA and Mosaic.

    Lane packing: when C < 128 (the VPU lane width), adjacent spatial columns
    are folded into the channel axis — ``[B,H,W,C] -> [B,H,W/p,p*C]`` is a
    bit-level view in row-major layout — so every stats/normalise pass runs
    at full lane utilisation; per-channel sums are recovered by folding the p
    chunks, and gamma/beta/mean/rstd are tiled p times for the elementwise
    side. Values are identical up to f32 summation order."""
    B, H, W, C = x.shape
    G = num_groups
    Cg = C // G

    pack = 1
    while C * pack * 2 <= 128 and W % (pack * 2) == 0:
        pack *= 2

    xp = x.reshape(B, H, W // pack, pack * C)
    xf = xp.astype(jnp.float32)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // Cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (col_g == grp).astype(jnp.float32)  # [C, G]
    # Both reduces MUST consume the same converted array: XLA multi-output-
    # fuses them into one pass over the activation. Splitting them (sum with
    # dtype=f32 + separate sumsq: 49.4 ms/step) or einsum sumsq (1.61 vs
    # 1.81 img/s) doubles the reads — measured on chip, round 2.
    psum = jnp.sum(xf, axis=(1, 2))          # [B, pack*C]
    psq = jnp.sum(xf * xf, axis=(1, 2))      # [B, pack*C]
    colsum = psum.reshape(B, pack, C).sum(axis=1)  # [B, C]
    colsq = psq.reshape(B, pack, C).sum(axis=1)
    n = H * W * Cg
    mean_g = (colsum @ M) / n                # [B, G]
    var_g = (colsq @ M) / n - mean_g**2
    mean_c = mean_g @ M.T                    # [B, C]
    rstd_c = jax.lax.rsqrt(var_g + eps) @ M.T
    if pack > 1:
        mean_c = jnp.tile(mean_c, (1, pack))
        rstd_c = jnp.tile(rstd_c, (1, pack))
    gamma_p = jnp.tile(gamma.astype(jnp.float32), pack)
    beta_p = jnp.tile(beta.astype(jnp.float32), pack)
    out = (xf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    out = out * gamma_p + beta_p
    if silu:
        out = out * jax.nn.sigmoid(out)
    if residual is not None:
        out = out + residual.reshape(xp.shape).astype(jnp.float32)
    return out.astype(x.dtype).reshape(B, H, W, C)


def _gns_kernel(x_ref, gamma_ref, beta_ref, o_ref, acc_ref, *, G, eps, n_tiles, silu):
    """Grid (B, 2, n_tiles): phase 0 accumulates per-group sum/sumsq over
    spatial tiles; phase 1 normalises + activates. TPU grid execution is
    sequential per core, so phase 0 tiles complete before phase 1 reads the
    scratch statistics."""
    phase = pl.program_id(1)
    tile = pl.program_id(2)

    x = x_ref[0].astype(jnp.float32)  # [rows, C]
    rows, C = x.shape
    Cg = C // G

    # channel->group one-hot matrix; group reductions become MXU matmuls
    # (Mosaic cannot split the lane dimension with reshapes)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // Cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (col_g == grp).astype(jnp.float32)  # [C, G]

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        colsum = jnp.sum(x, axis=0, keepdims=True)          # [1, C]
        colsq = jnp.sum(x * x, axis=0, keepdims=True)       # [1, C]
        acc_ref[0:1, :] += jnp.dot(colsum, M, preferred_element_type=jnp.float32)
        acc_ref[1:2, :] += jnp.dot(colsq, M, preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _():
        n = rows * n_tiles * Cg
        mean = acc_ref[0:1, :] / n  # [1, G]
        var = acc_ref[1:2, :] / n - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        mean_c = jnp.dot(mean, M.T, preferred_element_type=jnp.float32)  # [1, C]
        rstd_c = jnp.dot(rstd, M.T, preferred_element_type=jnp.float32)
        out = (x - mean_c) * rstd_c
        out = out * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
        if silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)


def group_norm_silu(x, gamma, beta, num_groups, eps=1e-5, silu=True,
                    tile_rows=None, interpret=None):
    """Fused GroupNorm+SiLU. x: [B,H,W,C] NHWC; gamma/beta: [C].
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    ``tile_rows=None`` auto-sizes the spatial tile to ~1MB of VMEM —
    per-invocation overhead dominates with small tiles (measured 31ms ->
    sub-ms at [8,256,256,64] when the grid shrinks accordingly)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_rows is None:
        tile_rows = max(512, min(4096, (1 << 18) // max(x.shape[-1], 1)))
    B, H, W, C = x.shape
    G = num_groups
    assert C % G == 0, (C, G)
    S = H * W
    x2 = x.reshape(B, S, C)

    # pick a row tile that divides S and keeps the block in VMEM
    tr = min(tile_rows, S)
    while S % tr:
        tr -= 1
    n_tiles = S // tr

    out = pl.pallas_call(
        functools.partial(_gns_kernel, G=G, eps=eps, n_tiles=n_tiles, silu=silu),
        grid=(B, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tr, C), lambda b, p, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            # 2D (1, C) affine params: keeps the last-two-dims block rule
            # satisfied even when the call is vmapped (stacked dual-net path)
            pl.BlockSpec((1, C), lambda b, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, C), lambda b, p, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, G), jnp.float32)],
        interpret=interpret,
    )(x2, gamma.reshape(1, C), beta.reshape(1, C))
    return out.reshape(B, H, W, C)


# --------------------------------------------------------------------------- #
# Flash attention                                                              #
# --------------------------------------------------------------------------- #


def flash_attention_reference(q, k, v, scale=None):
    """jnp reference (fp32 softmax). q/k/v: [B, H, N, D]."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, kv_tiles):
    """Grid (BH, q_tiles, kv_tiles): running-max blockwise softmax."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [tq, D]
    k = k_ref[0].astype(jnp.float32)  # [tk, D]
    v = v_ref[0].astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [tq, tk]
    m_prev = m_ref[...]  # [tq, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32)
    m_ref[...] = m_cur

    @pl.when(kv_idx == kv_tiles - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def flash_attention(q, k, v, scale=None, q_tile=256, kv_tile=256, interpret=None):
    """Blockwise attention. q/k/v: [B, H, N, D] (no mask — the UNet's spatial
    self-attention is unmasked). Falls back to the reference path for ragged
    shapes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hh, N, D = q.shape
    Nk = k.shape[2]
    scale = D**-0.5 if scale is None else scale
    tq = min(q_tile, N)
    tk = min(kv_tile, Nk)
    if N % tq or Nk % tk:
        return flash_attention_reference(q, k, v, scale)
    BH = B * Hh
    qf = q.reshape(BH, N, D)
    kf = k.reshape(BH, Nk, D)
    vf = v.reshape(BH, Nk, D)
    kv_tiles = Nk // tk

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_tiles=kv_tiles),
        grid=(BH, N // tq, kv_tiles),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, Hh, N, D)


# --------------------------------------------------------------------------- #
# Fused GN-normalize + SiLU + 3x3 conv (+ bias/residual epilogues)             #
# --------------------------------------------------------------------------- #
#
# The sampler is HBM-traffic-bound (trace: GN statistics + elementwise
# normalize/add passes ~90% of device time, convs 5%). This kernel collapses
# the ResBlock's normalize->SiLU->conv chain into ONE pass over the
# activation: read x (+1-row halo), normalize+activate in registers, 3x3
# conv as 9 shifted [R*W, C] @ [C, Cout] MXU matmuls with f32 accumulation,
# add per-(B,Cout) bias (conv bias + folded timestep/cross-attn projections)
# and an optional residual, write the result. Group statistics are computed
# beforehand by one cheap streaming pass (gn_channel_affine) so the kernel
# needs only per-(B,C) scale/shift.
#
# HBM passes per ResBlock: 15 unfused -> 7 fused (stats x2, kernel reads
# x/y1/res, writes y1/y2).


def gn_channel_affine(x, gamma, beta, num_groups, eps=1e-5):
    """Per-(B,C) normalize coefficients from group statistics (one read):
    returns (scale, shift) with GN(x)*gamma+beta == x*scale + shift."""
    B, H, W, C = x.shape
    G = num_groups
    Cg = C // G
    xf = x.astype(jnp.float32)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // Cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (col_g == grp).astype(jnp.float32)
    colsum = jnp.sum(xf, axis=(1, 2))
    colsq = jnp.sum(xf * xf, axis=(1, 2))
    n = H * W * Cg
    mean_g = (colsum @ M) / n
    var_g = (colsq @ M) / n - mean_g**2
    mean_c = mean_g @ M.T
    rstd_c = jax.lax.rsqrt(var_g + eps) @ M.T
    scale = rstd_c * gamma.astype(jnp.float32)[None]
    shift = beta.astype(jnp.float32)[None] - mean_c * scale
    return scale, shift


def fused_gn_silu_conv3x3_reference(x, scale_c, shift_c, w, bias_bc,
                                    residual=None):
    """jnp reference (CPU fallback + golden values)."""
    xf = x.astype(jnp.float32) * scale_c[:, None, None, :] + shift_c[:, None, None, :]
    xn = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xn, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = y + bias_bc.astype(jnp.float32)[:, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _fgc_kernel(xp_ref, scale_ref, shift_ref, w_ref, bias_ref, *rest,
                R, S, W_, WP, C, Cout, n_total, has_res):
    if has_res:
        res_ref, o_ref, xbuf, sem = rest
    else:
        o_ref, xbuf, sem = rest
        res_ref = None
    g = pl.program_id(0)
    b = g // S
    i = g - b * S
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(i * R, R + 2)], xbuf.at[slot], sem.at[slot]
        ).start()

    @pl.when(g + 1 < n_total)
    def _():
        g1 = g + 1
        b1 = g1 // S
        i1 = g1 - b1 * S
        pltpu.make_async_copy(
            xp_ref.at[b1, pl.ds(i1 * R, R + 2)], xbuf.at[nslot], sem.at[nslot]
        ).start()

    pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * R, R + 2)], xbuf.at[slot], sem.at[slot]
    ).wait()

    xh = xbuf[slot]  # [R+2, WP, C] (WP = W_+2 rounded up to sublane tiling)
    scale = scale_ref[b].reshape(1, 1, C)
    shift = shift_ref[b].reshape(1, 1, C)
    xf = xh.astype(jnp.float32) * scale + shift
    xn = (xf * jax.nn.sigmoid(xf)).astype(xh.dtype)
    # SAME padding zeros the conv input AFTER normalize; the halo was padded
    # BEFORE, so silu(shift) would leak into border taps — mask it out.
    row_g = jax.lax.broadcasted_iota(jnp.int32, (R + 2, WP, 1), 0) + i * R - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (R + 2, WP, 1), 1)
    valid = ((row_g >= 0) & (row_g < R * S)
             & (col_g >= 1) & (col_g <= W_))
    xn = jnp.where(valid, xn, jnp.zeros_like(xn))

    acc = jnp.zeros((R * W_, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xn[dy:dy + R, dx:dx + W_, :].reshape(R * W_, C)
            acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out = acc.reshape(R, W_, Cout) + bias_ref[b].reshape(1, 1, Cout)
    if res_ref is not None:
        out = out + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_gn_silu_conv3x3(x, scale_c, shift_c, w, bias_bc, residual=None,
                          row_tile=16, interpret=None):
    """One-pass normalize+SiLU+3x3conv(+bias[B,Cout], +residual).

    x [B,H,W,C]; scale_c/shift_c [B,C] f32 (from gn_channel_affine);
    w [3,3,C,Cout]; bias_bc [B,Cout] f32. Output [B,H,W,Cout] in x.dtype.
    Falls back to the jnp reference off-TPU or for awkward shapes."""
    B, H, W_, C = x.shape
    Cout = w.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if interpret is None and not on_tpu:
        return fused_gn_silu_conv3x3_reference(x, scale_c, shift_c, w,
                                               bias_bc, residual)
    R = row_tile
    while R > 1 and H % R:
        R //= 2
    S = H // R
    # Mosaic DMA slices need the sublane (second-to-last) dim aligned to 8
    # and the lane (last) dim aligned to 128: pad the haloed width up to a
    # multiple of 8 and the channel dim up to a multiple of 128. The channel
    # pad costs no HBM traffic — XLA lane-pads these buffers physically
    # anyway (memref inspection: C=64 stored as 128) — and zero scale/shift
    # makes the pad channels exactly 0 after normalize+SiLU, so zero kernel
    # rows null their conv contribution.
    wp = (-(W_ + 2) % 8)
    cp = (-C) % 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wp), (0, cp)))
    if cp:
        scale_c = jnp.pad(scale_c, ((0, 0), (0, cp)))
        shift_c = jnp.pad(shift_c, ((0, 0), (0, cp)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp), (0, 0)))
    C = C + cp
    n_total = B * S

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        # per-(B,C)/(B,Cout) params: whole array in VMEM (tiny), the kernel
        # indexes row b itself — blocked (1, C) specs violate the TPU
        # last-two-dims divisibility rule
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xp, scale_c, shift_c, w.astype(x.dtype), bias_bc]
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec(
            (1, R, W_, Cout), lambda g: (g // S, g % S, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(residual)

    WP = W_ + 2 + wp
    kern = functools.partial(_fgc_kernel, R=R, S=S, W_=W_, WP=WP, C=C,
                             Cout=Cout, n_total=n_total, has_res=has_res)
    return pl.pallas_call(
        kern,
        grid=(n_total,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, W_, Cout), lambda g: (g // S, g % S, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W_, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, R + 2, WP, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=bool(interpret),
    )(*args)
