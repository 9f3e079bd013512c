"""Conditional UNets.

Reconstruction of the reference's missing UNet modules (SURVEY.md SS2.9b/c):
  * ``LearnableForwardUNetMultiScoreMap`` -- ``MSM_degEmb_Unet.
    LearnableForwardUNet_MultiScoreMap``: 4-scale UNet (nf 64,
    ch_mult [1,2,4,4]), timestep embedding, CLIP image-context cross-attention
    in each conv block, and a ScoreMapModule at each skip connection emitting
    (i) a supervised score map and (ii) fused features for the decoder
    (settings at config.yml:106-117; call contract drift_noise_model.py:
    249-268; figure figures/LDD_Overall2.png).
  * ``LearnableForwardUNet`` -- the DDPM-baseline single-map variant
    (config.yml:152-161).

Interpretation pinned for the under-specified parts (documented per SURVEY.md
SS7 'hard parts'): ``out_nc=5`` is one output head per artifact type, gathered
by ``type_idx`` (config.yml type_map_ind) to the [B,H,W,1] loss target; SMM
scale i operates on the encoder skip at resolution H/2^i matching the
supervision pyramid mult=[1,2,4,8].

TPU-first choices: NHWC layout, static prompt-index conditioning (strings are
tokenised on the host, the graph sees int32 ``type_idx``), ``text_fn``
closures so frozen-tower text features can be computed inside the training
step but hoisted out of the 100-step sampling scan.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.packed_conv import packed_conv3x3
from ..ops import packed_l0 as pk
from ..ops.pallas_kernels import (
    fused_gn_silu_conv3x3,
    gn_channel_affine,
    group_norm_silu,
    group_norm_silu_reference,
)
from .scoremap import ScoreMapModule


def timestep_embedding(t, dim, max_period=10000.0):
    """Sinusoidal timestep embedding. t: [B] int/float -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn_groups(c):
    """Largest group count <= 32 that divides the channel count."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


def _gn_silu_parts(parts, scale, bias, num_groups, eps=1e-5):
    """GroupNorm+SiLU over a CONCAT-FREE part list (unpacked NHWC): the
    decoder j==0 [h | skip | smm] concat never materialises — exact group
    statistics from per-part channel sums (VERDICT r3 item 1a). Returns
    normalised parts; value-identical to GN over the concat up to f32
    summation order."""
    colsums, colsqs = [], []
    for p in parts:
        pf = p.astype(jnp.float32)
        colsums.append(jnp.sum(pf, axis=(1, 2)))
        colsqs.append(jnp.sum(pf * pf, axis=(1, 2)))
    colsum = jnp.concatenate(colsums, axis=-1)  # [B, total] (tiny)
    colsq = jnp.concatenate(colsqs, axis=-1)
    C = colsum.shape[-1]
    n_el = parts[0].shape[1] * parts[0].shape[2] * (C // num_groups)
    mean_c, rstd_c = pk._group_fold(colsum, colsq, n_el, num_groups, eps)
    sc = rstd_c * scale.astype(jnp.float32)[None]
    sh = bias.astype(jnp.float32)[None] - mean_c * sc
    outs, off = [], 0
    for p in parts:
        c = p.shape[-1]
        o = (p.astype(jnp.float32) * sc[:, None, None, off:off + c]
             + sh[:, None, None, off:off + c])
        o = o * jax.nn.sigmoid(o)
        outs.append(o.astype(p.dtype))
        off += c
    return outs


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm + SiLU with a static backend switch: the differentiable jnp
    reference (training) or the fused Pallas kernel (sampling on TPU) — both
    share the same parameter names so one param tree serves both instances."""

    num_groups: int
    use_pallas: bool = False
    silu: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if self.use_pallas:
            return group_norm_silu(x, scale, bias, self.num_groups, silu=self.silu)
        return group_norm_silu_reference(x, scale, bias, self.num_groups,
                                         silu=self.silu)


class PackedConv3x3(nn.Module):
    """Drop-in nn.Conv((3,3)) replacement computing the conv width-packed
    (ops/packed_conv.py): identical params and math, ~2x fewer conv cycles
    at low channel counts on TPU. Exact, differentiable."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (3, 3, C, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return packed_conv3x3(x.astype(self.dtype), w.astype(self.dtype),
                              b.astype(self.dtype))


class _GNParams(nn.Module):
    """Param-only stand-in for FusedGroupNormSiLU: declares the identical
    {scale, bias} leaves so the fused-kernel path shares one checkpoint tree
    with the module path."""

    @nn.compact
    def __call__(self, C):
        return (self.param("scale", nn.initializers.ones, (C,)),
                self.param("bias", nn.initializers.zeros, (C,)))


def _deep_dict(d):
    """Nested FrozenDict/dict -> nested mutable dicts (leaves untouched)."""
    if hasattr(d, "items"):
        return {k: _deep_dict(v) for k, v in d.items()}
    return d


class _ConvParams(nn.Module):
    """Param-only stand-in for nn.Conv (3x3): identical {kernel, bias}.

    When ``prepack_params`` added a ``kernel_packed`` sibling (the packed
    transform hoisted out of the sampling scan), it is returned instead of
    the raw kernel — the packed ops shape-sniff either form."""

    out_ch: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_ch):
        k = self.param("kernel", self.kernel_init, (3, 3, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if self.has_variable("params", "kernel_packed"):
            k = self.get_variable("params", "kernel_packed")
        return k, b


class _Conv1x1Params(nn.Module):
    """Param-only stand-in for nn.Conv((1,1)): identical {kernel, bias}."""

    out_ch: int

    @nn.compact
    def __call__(self, in_ch):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if self.has_variable("params", "kernel_packed"):
            k = self.get_variable("params", "kernel_packed")
        return k, b


class _ConvTParams(nn.Module):
    """Param-only stand-in for nn.ConvTranspose((4,4)): {kernel, bias}."""

    out_ch: int

    @nn.compact
    def __call__(self, in_ch):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if self.has_variable("params", "kernel_packed"):
            k = self.get_variable("params", "kernel_packed")
        return k, b


class _XAttnBias(nn.Module):
    """The KV-len-1 cross-attention shortcut reduced to its per-(B,C) bias
    (softmax over one key == 1 => attention == V): same {v, out} param tree
    as ContextCrossAttention's shortcut branch."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context):  # [B, 1, ctx_dim] -> [B, C]
        v = nn.Dense(self.channels, dtype=self.dtype, name="v")(context)
        out = nn.Dense(self.channels, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="out")(v)
        return out[:, 0]


class ContextCrossAttention(nn.Module):
    """Cross-attention from spatial features to context tokens (the
    image-context injection in each conv block, drift_noise_model.py:250-268;
    emb_A flows as a [B,1,512] token)."""

    channels: int
    context_dim: int = 512
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, context):
        B, H, W, C = h.shape
        if context.shape[1] == 1:
            # exact shortcut: with a single KV token the softmax over one key
            # is identically 1, so attention output == V for every query —
            # the q-projection and the full-resolution LayerNorm/attention are
            # mathematically dead. Reduces to a broadcast channel bias
            # (~24% of UNet forward time at 256px before this).
            v = nn.Dense(C, dtype=self.dtype, name="v")(context)  # [B,1,C]
            out = nn.Dense(C, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name="out")(v)
            return h + out[:, None]  # broadcast [B,1,1,C] over H,W
        x = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(nn.LayerNorm(dtype=jnp.float32)(x))
        k = nn.Dense(C, dtype=self.dtype, name="k")(context)
        v = nn.Dense(C, dtype=self.dtype, name="v")(context)
        attn = multi_head_attention(q, k, v, self.heads)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="out")(attn)
        return h + out.reshape(B, H, W, C)


def _ksplit_groups(segments):
    """Group concat-input segments for K-tile-aligned split convolutions:
    the wide (h, skip) run in one conv, the thin score-map-fuse tail in a
    second, summed — exact by linearity. At e.g. K=272 (128+128+16) the MXU
    contraction dim otherwise pads each 3x3 tap's K to the next tile; the
    256-wide group hits exact tiles. Returns [(offset, width), ...] or None
    when there is nothing worth splitting."""
    if len(segments) < 2:
        return None
    main = int(sum(segments[:-1]))
    tail = int(segments[-1])
    if tail >= 64 or main % 64 != 0:
        return None
    return [(0, main), (main, tail)]


class ResBlock(nn.Module):
    """GN + SiLU + 3x3 conv x2 with timestep injection and optional
    image-context cross-attention (the reference conv block,
    SURVEY.md SS2.10 row 1 — the Pallas fusion target)."""

    out_ch: int
    use_context: bool = False
    context_dim: int = 512
    use_pallas_gn: bool = False
    use_fused_gnconv: bool = False  # one-pass GN+SiLU+conv Pallas kernel
    use_packed_conv: bool = False   # width-packed 3x3 convs (low-C levels)
    # static input-segment widths for the fully width-packed path (a FIELD,
    # not a call argument, so nn.remat-wrapped blocks stay traceable)
    packed_segments: Optional[tuple] = None
    # logical widths of conv1's concat input (decoder j==0 blocks) + opt-in
    # K-tile-aligned split of that conv (engine.ksplit_dec)
    concat_widths: Optional[tuple] = None
    ksplit: bool = False
    int8: bool = False  # W8A8 3x3 convs on the int8 MXU path (engine.int8_conv)
    decomp: Any = False  # packed convs via input-grouped decompositions:
    # "pair"/True = two width-2 convs (1.33x logical FLOPs), "tap4" = four
    # convs at 1.0x — vs the dense transformed kernel's 2x
    # (engine.decomp_l0, ops/packed_l0.py)
    shift: bool = False  # shift-alternating packing: conv1 emits the SHIFTED
    # column packing, conv2 maps back — both width-2 kernels at 1.33x
    # physical FLOPs (vs the dense transformed kernel's 2x) while keeping
    # ONE conv per layer and zero relayout copies (engine.shift_l0,
    # ops/packed_l0.py)
    gn_fold: str = "matmul"  # GroupNorm group-fold: "matmul" (one-hot) or
    # "reshape" (contiguous reduce + repeat; engine.gnfold_l0)
    tail_matmul: bool = False  # presum mode "tailmat": thin (<64ch) trailing
    # concat segments via ONE im2col matmul instead of a per-tap-K-padded
    # conv (engine.presum_dec="tailmat"; ops/packed_l0.py)
    dtype: jnp.dtype = jnp.float32

    def _conv3(self, features, name, kernel_init=None):
        kinit = kernel_init or nn.initializers.lecun_normal()
        if self.use_packed_conv and features < 128:
            return PackedConv3x3(features, kernel_init=kinit,
                                 dtype=self.dtype, name=name)
        return nn.Conv(features, (3, 3), dtype=self.dtype,
                       kernel_init=kinit, name=name)

    @nn.compact
    def __call__(self, h, temb, context=None):
        if self.packed_segments is not None:
            return self._packed_body(h, temb, context,
                                     list(self.packed_segments))
        if isinstance(h, (tuple, list)):
            # concat-free decoder j==0 block (engine.presum_dec): the
            # [h | skip | smm] concat arrives as parts and is never
            # materialised — GN stats combine per-part sums, conv1/skip
            # split by input segment and sum (exact by linearity)
            return self._presum_body(list(h), temb, context)
        in_ch = h.shape[-1]
        if self.use_fused_gnconv and (context is None or context.shape[1] == 1):
            return self._fused_body(h, temb, context, in_ch)
        x = FusedGroupNormSiLU(_gn_groups(in_ch), use_pallas=self.use_pallas_gn,
                               name="gns1")(h)
        groups = (_ksplit_groups(list(self.concat_widths))
                  if (self.ksplit and self.concat_widths
                      and sum(self.concat_widths) == in_ch
                      and not self.use_packed_conv) else None)
        if self.int8 and not self.use_packed_conv:
            from ..ops.int8 import int8_conv

            k1, b1 = _ConvParams(self.out_ch, name="conv1")(in_ch)
            x = int8_conv(x.astype(self.dtype), k1.astype(self.dtype),
                          b1, out_dtype=self.dtype)
        elif groups is not None:
            k1, b1 = _ConvParams(self.out_ch, name="conv1")(in_ch)
            xd = x.astype(self.dtype)
            kd = k1.astype(self.dtype)
            dn = jax.lax.conv_dimension_numbers(
                xd.shape, kd.shape, ("NHWC", "HWIO", "NHWC"))
            y = None
            for off, wdt in groups:
                part = jax.lax.conv_general_dilated(
                    xd[..., off:off + wdt], kd[:, :, off:off + wdt, :],
                    (1, 1), "SAME", dimension_numbers=dn)
                y = part if y is None else y + part
            x = y + b1.astype(y.dtype)
        else:
            x = self._conv3(self.out_ch, "conv1")(x.astype(self.dtype))
        x = x + nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(nn.silu(temb))[
            :, None, None
        ]
        x = FusedGroupNormSiLU(_gn_groups(self.out_ch), use_pallas=self.use_pallas_gn,
                               name="gns2")(x)
        if self.int8 and not self.use_packed_conv:
            from ..ops.int8 import int8_conv

            k2, b2 = _ConvParams(self.out_ch, kernel_init=nn.initializers.zeros,
                                 name="conv2")(self.out_ch)
            x = int8_conv(x.astype(self.dtype), k2.astype(self.dtype),
                          b2, out_dtype=self.dtype)
        else:
            x = self._conv3(self.out_ch, "conv2",
                            kernel_init=nn.initializers.zeros)(x.astype(self.dtype))
        if in_ch != self.out_ch:
            h = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(h)
        h = h + x
        if self.use_context and context is not None:
            h = ContextCrossAttention(
                self.out_ch, self.context_dim, dtype=self.dtype, name="xattn"
            )(h, context)
        return h

    def _packed_body(self, hp, temb, context, segments):
        """Width-packed ResBlock (ops/packed_l0.py): input/output are packed
        [B,H,W/2,2*C] tensors; identical param tree via the param-holder
        modules. Inference path (the level-0 blocks are ~44% of sampler
        time at C=64; packed they run at full MXU/VPU lane width).

        ``hp`` may arrive as a per-segment part LIST (engine.presum_dec):
        the decoder concat is then never materialised — GN stats combine
        per-part sums, conv1/skip split per segment and sum (exact)."""
        parts = list(hp) if isinstance(hp, (tuple, list)) else None
        in_ch = sum(segments)
        g1s, g1b = _GNParams(name="gns1")(in_ch)
        k1, b1 = _ConvParams(self.out_ch, name="conv1")(in_ch)
        g2s, g2b = _GNParams(name="gns2")(self.out_ch)
        k2, b2 = _ConvParams(self.out_ch, kernel_init=nn.initializers.zeros,
                             name="conv2")(self.out_ch)
        tb = nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(
            nn.silu(temb))  # [B, out_ch]

        if parts is not None:
            xs = pk.gn_silu_packed_parts(parts, g1s, g1b, _gn_groups(in_ch),
                                         segments, fold_mode=self.gn_fold)
        else:
            x = pk.gn_silu_packed(hp, g1s, g1b, _gn_groups(in_ch), segments,
                                  fold_mode=self.gn_fold)
        if self.shift and not (self.int8 or self.decomp):
            # shift-alternating: conv1 std->shifted, conv2 shifted->std,
            # both 1.33x physical FLOPs (ops/packed_l0.py)
            if parts is not None:
                q = pk.conv3x3_std_to_shift_parts(
                    [p.astype(self.dtype) for p in xs],
                    k1.astype(self.dtype), segments,
                    tail_matmul=self.tail_matmul)
            else:
                q = pk.conv3x3_std_to_shift(x.astype(self.dtype),
                                            k1.astype(self.dtype),
                                            segments=segments)
            bias1 = (jnp.tile(b1, 2)[None] + jnp.tile(tb, (1, 2))).astype(
                q.dtype)
            q = q + bias1[:, None, None, :]
            q = pk.gn_silu_shifted(q, g2s, g2b, _gn_groups(self.out_ch),
                                   fold_mode=self.gn_fold)
            x = pk.conv3x3_shift_to_std(q.astype(self.dtype),
                                        k2.astype(self.dtype),
                                        b2.astype(self.dtype))
        else:
            ks = None
            if self.ksplit and _ksplit_groups(segments) is not None:
                ks = [tuple(range(len(segments) - 1)), (len(segments) - 1,)]
            if parts is not None:
                x = pk.packed_conv3x3_parts(
                    [p.astype(self.dtype) for p in xs],
                    k1.astype(self.dtype), segments=segments,
                    tail_matmul=self.tail_matmul)
            else:
                x = pk.packed_conv3x3(x.astype(self.dtype),
                                      k1.astype(self.dtype),
                                      segments=segments, k_split=ks,
                                      int8=self.int8, decomp=self.decomp)
            # conv1 bias + timestep projection, parity-tiled [B, 2*out_ch]
            bias1 = (jnp.tile(b1, 2)[None] + jnp.tile(tb, (1, 2))).astype(x.dtype)
            x = x + bias1[:, None, None, :]
            x = pk.gn_silu_packed(x, g2s, g2b, _gn_groups(self.out_ch),
                                  [self.out_ch], fold_mode=self.gn_fold)
            x = pk.packed_conv3x3(x.astype(self.dtype), k2.astype(self.dtype),
                                  b2.astype(self.dtype), segments=[self.out_ch],
                                  int8=self.int8, decomp=self.decomp)
        if in_ch == self.out_ch and len(segments) == 1:
            res = hp
        elif parts is not None:
            ks, bs = _Conv1x1Params(self.out_ch, name="skip")(in_ch)
            res = pk.packed_conv1x1_parts(
                [p.astype(self.dtype) for p in parts],
                ks.astype(self.dtype), bs.astype(self.dtype),
                segments=segments)
        else:
            ks, bs = _Conv1x1Params(self.out_ch, name="skip")(in_ch)
            res = pk.packed_conv1x1(hp.astype(self.dtype),
                                    ks.astype(self.dtype),
                                    bs.astype(self.dtype), segments=segments)
        h = res + x
        if self.use_context and context is not None:
            xb = _XAttnBias(self.out_ch, dtype=self.dtype,
                            name="xattn")(context)  # [B, out_ch]
            h = h + jnp.tile(xb, (1, 2))[:, None, None, :]
        return h

    def _presum_body(self, parts, temb, context):
        """Concat-free unpacked ResBlock (decoder j==0 at levels 1..n,
        engine.presum_dec): identical param tree via the param holders;
        GN stats from per-part sums, conv1/skip per-segment and summed.
        Exact by linearity (values match the concat path up to f32
        summation order)."""
        widths = [p.shape[-1] for p in parts]
        in_ch = sum(widths)
        g1s, g1b = _GNParams(name="gns1")(in_ch)
        k1, b1 = _ConvParams(self.out_ch, name="conv1")(in_ch)
        xs = _gn_silu_parts(parts, g1s, g1b, _gn_groups(in_ch))
        y, off = None, 0
        for p in xs:
            c = p.shape[-1]
            kd = k1[:, :, off:off + c, :].astype(self.dtype)
            pd = p.astype(self.dtype)
            if self.tail_matmul and c < 64:
                yi = pk.conv3x3_tail_matmul(pd, kd)
            else:
                dn = jax.lax.conv_dimension_numbers(pd.shape, kd.shape,
                                                    ("NHWC", "HWIO", "NHWC"))
                yi = jax.lax.conv_general_dilated(pd, kd, (1, 1), "SAME",
                                                  dimension_numbers=dn)
            y = yi if y is None else y + yi
            off += c
        x = y + b1.astype(y.dtype)
        x = x + nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(
            nn.silu(temb))[:, None, None]
        x = FusedGroupNormSiLU(_gn_groups(self.out_ch),
                               use_pallas=self.use_pallas_gn, name="gns2")(x)
        x = self._conv3(self.out_ch, "conv2",
                        kernel_init=nn.initializers.zeros)(x.astype(self.dtype))
        ks, bs = _Conv1x1Params(self.out_ch, name="skip")(in_ch)
        res, off = None, 0
        for p in parts:
            c = p.shape[-1]
            ri = p.astype(self.dtype) @ ks[0, 0, off:off + c, :].astype(self.dtype)
            res = ri if res is None else res + ri
            off += c
        h = res + bs.astype(res.dtype) + x
        if self.use_context and context is not None:
            h = ContextCrossAttention(
                self.out_ch, self.context_dim, dtype=self.dtype, name="xattn"
            )(h, context)
        return h

    def _fused_body(self, h, temb, context, in_ch):
        """One HBM pass per conv: normalize coefficients from a cheap stats
        pass, then the Pallas GN+SiLU+conv kernel with the timestep
        projection / cross-attn shortcut / residual folded into its
        epilogue (7 tensor passes vs ~15 unfused — the sampler is
        traffic-bound, PERF.md). Inference only (no custom VJP)."""
        g1s, g1b = _GNParams(name="gns1")(in_ch)
        k1, b1 = _ConvParams(self.out_ch, name="conv1")(in_ch)
        g2s, g2b = _GNParams(name="gns2")(self.out_ch)
        k2, b2 = _ConvParams(self.out_ch, kernel_init=nn.initializers.zeros,
                             name="conv2")(self.out_ch)
        tb = nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(
            nn.silu(temb))  # [B, out_ch]

        scale1, shift1 = gn_channel_affine(h, g1s, g1b, _gn_groups(in_ch))
        bias1 = b1.astype(jnp.float32)[None] + tb.astype(jnp.float32)
        y1 = fused_gn_silu_conv3x3(h, scale1, shift1, k1, bias1)

        scale2, shift2 = gn_channel_affine(y1, g2s, g2b, _gn_groups(self.out_ch))
        res = h if in_ch == self.out_ch else nn.Conv(
            self.out_ch, (1, 1), dtype=self.dtype, name="skip")(h)
        bias2 = jnp.broadcast_to(b2.astype(jnp.float32)[None],
                                 (h.shape[0], self.out_ch))
        if self.use_context and context is not None:
            bias2 = bias2 + _XAttnBias(
                self.out_ch, dtype=self.dtype, name="xattn")(context
                                                             ).astype(jnp.float32)
        return fused_gn_silu_conv3x3(y1, scale2, shift2, k2, bias2, residual=res)


class SelfAttention2D(nn.Module):
    """Spatial self-attention at the bottleneck.

    ``use_flash`` routes the core through the Pallas blockwise-softmax
    kernel (ops/pallas_kernels.py) — at 256px the bottleneck is 1024 tokens
    and the materialised [B,h,1024,1024] softmax is pure HBM traffic
    (~0.8 ms/step in the r3 sampler profile; engine.flash_mid)."""

    heads: int = 4
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        B, H, W, C = h.shape
        x = nn.GroupNorm(num_groups=_gn_groups(C), dtype=jnp.float32)(h).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x)
        if self.use_flash:
            from ..ops.pallas_kernels import flash_attention

            Dh = C // self.heads
            def split(z):
                return z.reshape(B, H * W, self.heads, Dh).transpose(0, 2, 1, 3)
            attn = flash_attention(split(q), split(k), split(v))
            attn = attn.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        else:
            attn = multi_head_attention(q, k, v, self.heads)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="out")(attn)
        return h + out.reshape(B, H, W, C)


class LearnableForwardUNetMultiScoreMap(nn.Module):
    """The dual-conditioned UNet with per-scale score maps.

    Call contract (matching drift_noise_model.py:249-268):
      ``(x_a, x_b, t, type_idx, text_fn, image_context, degra_context,
        text_embs) -> (pred [B,H,W,1], scoremaps: [maps at H/1, H/2, H/4, H/8])``
    ``x_a``/``x_b`` are the two [B,H,W,1] inputs concatenated to ``in_nc=2``;
    ``text_fn(context [n_ctx, token_dim]) -> [K, context_dim]`` wraps the
    frozen text tower; ``text_embs`` (a list of per-scale [K, context_dim])
    overrides ``text_fn`` during sampling so the tower runs outside the scan.
    """

    in_nc: int = 2
    out_nc: int = 5
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    context_dim: int = 512
    text_module: str = "scoremap"
    score_map_chan: int = 16
    if_MultiScoreMap: bool = True
    score_map_ch_mult: Sequence[int] = (1, 1, 2, 4)
    score_map_ngf: int = 64
    use_image_context: bool = False
    use_degra_context: bool = False
    token_embed_dim: int = 512
    num_res_blocks: int = 2
    use_pallas_gn: bool = False
    use_fused_gnconv: bool = False  # Pallas one-pass GN+SiLU+conv (inference)
    use_packed_conv: bool = False   # width-packed 3x3 convs at low-C levels
    packed_l0: bool = False  # fully width-packed level 0 (ops/packed_l0.py,
    # inference): level-0 activations stay packed end-to-end so convs/GN/
    # elementwise run at full 128-lane width with zero relayout copies
    remat: bool = False  # rematerialise ResBlocks (training at 224px+ OOMs
    # HBM without it: measured 16.8G/15.75G at B=4 fp32 on v5e)
    ksplit_dec: bool = False  # K-tile-aligned split of the decoder concat
    # convs (dec_i_0: wide h+skip run and thin score-map tail as two summed
    # convs — exact; engine.ksplit_dec)
    int8_conv: bool = False  # W8A8 ResBlock convs on the int8 MXU path
    # (2x bf16 rate on v5e; engine.int8_conv — quality must be validated
    # per checkpoint, ops/int8.py)
    decomp_l0: Any = False  # packed level-0 ResBlock convs via exact
    # input-grouped decompositions ("pair" = 1.33x logical FLOPs two-conv,
    # "tap4" = 1.0x four-conv; dense transformed kernel is 2x;
    # engine.decomp_l0, ops/packed_l0.py)
    tapsum_out: bool = False  # packed conv_out as one tap-stacked matmul
    # (90/128 MXU lanes vs 10/128 direct; engine.tapsum_out)
    subpix_up: bool = False  # ConvTranspose upsampling as ONE dense (2,2)
    # sub-pixel conv (4x output lanes, exactly logical FLOPs vs the
    # lhs-dilated form's 4x zero taps) + phase interleave (exact;
    # engine.subpix_up, ops/packed_l0.py)
    shift_l0: bool = False  # level-0 ResBlock conv pairs via shift-
    # alternating packing (1.33x physical FLOPs vs the dense transformed
    # kernel's 2x; engine.shift_l0, ops/packed_l0.py)
    flash_mid: bool = False  # bottleneck self-attention via the Pallas
    # blockwise-softmax kernel (no materialised [N,N] logits;
    # engine.flash_mid)
    presum_dec: Any = False  # concat-free decoder j==0 blocks: the
    # [h | skip | smm] concat is never materialised — GN stats combine
    # per-part sums, conv1/skip split per input segment and sum (exact;
    # engine.presum_dec, VERDICT r3 item 1a). Value "tailmat" additionally
    # computes the thin smm tail segment as ONE im2col matmul — the conv
    # emitter pads K to a 128-lane tile PER TAP, so the 16-channel tail
    # otherwise costs 9 (6 shifted) nearly-empty MXU passes (r4 trace).
    # Value "smmtail" = the same thin-tail im2col WITHOUT the conv_in
    # im2col that "tailmat" also applies (conv_in's conv form keeps its
    # GN-stat fusion, which the matmul form broke at −22%). Measured
    # −4.7% end-to-end — the tail z-tensor's HBM amplification loses even
    # with conv_in's fusion intact (PERF.md r4); all presum_dec values
    # stay opt-in documentation of measured dead ends
    gnfold_l0: bool = False  # packed GroupNorm group-fold via contiguous
    # reshape-reduce instead of the one-hot matmuls (exact;
    # engine.gnfold_l0)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n_levels = len(self.ch_mult)
        RB = nn.remat(ResBlock) if self.remat else ResBlock
        self.temb_dense0 = nn.Dense(self.nf * 4, dtype=self.dtype)
        self.temb_dense1 = nn.Dense(self.nf * 4, dtype=self.dtype)
        if self.packed_l0:
            self.conv_in = _ConvParams(self.nf)
        elif self.use_packed_conv and self.nf < 128:
            self.conv_in = PackedConv3x3(self.nf, dtype=self.dtype)
        else:
            self.conv_in = nn.Conv(self.nf, (3, 3), dtype=self.dtype)

        enc = []
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                enc.append(
                    RB(
                        self.nf * mult,
                        use_context=self.use_image_context or self.use_degra_context,
                        context_dim=self.context_dim,
                        use_pallas_gn=self.use_pallas_gn,
                        use_fused_gnconv=self.use_fused_gnconv,
                        use_packed_conv=self.use_packed_conv,
                        packed_segments=((self.nf,) if (self.packed_l0 and i == 0)
                                         else None),
                        int8=self.int8_conv,
                        decomp=self.decomp_l0,
                        shift=self.shift_l0,
                        gn_fold="reshape" if self.gnfold_l0 else "matmul",
                        dtype=self.dtype,
                        name=f"enc_{i}_{j}",
                    )
                )
        self.enc_blocks = enc
        self.down = [
            (_ConvParams(self.nf * self.ch_mult[i], name=f"down_{i}")
             if (self.packed_l0 and i == 0) else
             nn.Conv(self.nf * self.ch_mult[i], (3, 3), strides=(2, 2),
                     dtype=self.dtype, name=f"down_{i}"))
            for i in range(n_levels - 1)
        ]

        mid_ch = self.nf * self.ch_mult[-1]
        self.mid1 = RB(mid_ch,
                       use_context=self.use_image_context or self.use_degra_context,
                             context_dim=self.context_dim,
                             use_pallas_gn=self.use_pallas_gn,
                        use_fused_gnconv=self.use_fused_gnconv,
                        use_packed_conv=self.use_packed_conv,
                        int8=self.int8_conv,
                             dtype=self.dtype, name="mid1")
        self.mid_attn = SelfAttention2D(use_flash=self.flash_mid,
                                        dtype=self.dtype, name="mid_attn")
        self.mid2 = RB(mid_ch,
                       use_context=self.use_image_context or self.use_degra_context,
                             context_dim=self.context_dim,
                             use_pallas_gn=self.use_pallas_gn,
                        use_fused_gnconv=self.use_fused_gnconv,
                        use_packed_conv=self.use_packed_conv,
                        int8=self.int8_conv,
                             dtype=self.dtype, name="mid2")

        if self.text_module == "scoremap":
            if self.if_MultiScoreMap:
                self.smms = [
                    ScoreMapModule(
                        visual_dim=self.score_map_ngf * self.score_map_ch_mult[i],
                        token_embed_dim=self.token_embed_dim,
                        embed_dim=self.context_dim,
                        dtype=self.dtype,
                        name=f"smm_{i}",
                    )
                    for i in range(n_levels)
                ]
            else:
                self.smms = [
                    ScoreMapModule(
                        visual_dim=self.score_map_ngf,
                        token_embed_dim=self.token_embed_dim,
                        embed_dim=self.context_dim,
                        dtype=self.dtype,
                        name="smm_0",
                    )
                ]
            self.smm_fuse = [
                (_Conv1x1Params(self.score_map_chan, name=f"smm_fuse_{i}")
                 if (self.packed_l0 and i == 0) else
                 nn.Conv(self.score_map_chan, (1, 1), dtype=self.dtype,
                         name=f"smm_fuse_{i}"))
                for i in range(len(self.smms))
            ]

        dec = []
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks + 1):
                if self.packed_l0 and i == 0:
                    seg = ((self.nf, self.nf, self.score_map_chan) if j == 0
                           else (self.nf,))
                else:
                    seg = None
                # logical widths of the j==0 concat input [h, skip(, smm)]
                has_smm = (self.text_module == "scoremap"
                           and (self.if_MultiScoreMap or i == 0))
                cw = None
                if j == 0:
                    cw = ((self.nf * mult, self.nf * mult, self.score_map_chan)
                          if has_smm else (self.nf * mult, self.nf * mult))
                dec.append(
                    RB(
                        self.nf * mult,
                        use_context=self.use_image_context or self.use_degra_context,
                        context_dim=self.context_dim,
                        use_pallas_gn=self.use_pallas_gn,
                        use_fused_gnconv=self.use_fused_gnconv,
                        use_packed_conv=self.use_packed_conv,
                        packed_segments=seg,
                        concat_widths=cw,
                        ksplit=self.ksplit_dec,
                        int8=self.int8_conv,
                        decomp=self.decomp_l0,
                        shift=self.shift_l0,
                        gn_fold="reshape" if self.gnfold_l0 else "matmul",
                        tail_matmul=(self.presum_dec in ("tailmat", "smmtail")),
                        dtype=self.dtype,
                        name=f"dec_{i}_{j}",
                    )
                )
        self.dec_blocks = dec
        # ConvTranspose upsampling: nearest-resize+conv wins in isolation
        # (0.12 vs 0.42 ms) but LOSES ~9% end-to-end — the resize gather
        # breaks producer fusion inside the scan body (measured both ways)
        self.up = [
            (_ConvTParams(self.nf * self.ch_mult[i], name=f"up_{i}")
             if (self.packed_l0 and (i == 0 or self.subpix_up)) else
             nn.ConvTranspose(self.nf * self.ch_mult[i], (4, 4), strides=(2, 2),
                              dtype=self.dtype, name=f"up_{i}"))
            for i in range(n_levels - 1)
        ]
        if self.use_fused_gnconv or self.packed_l0:
            # param-only stand-ins: the out head runs through the fused
            # Pallas kernel / packed path with the identical checkpoint tree
            self.norm_out = _GNParams()
            self.conv_out = _ConvParams(self.out_nc,
                                        kernel_init=nn.initializers.zeros)
        else:
            self.norm_out = FusedGroupNormSiLU(_gn_groups(self.nf),
                                               use_pallas=self.use_pallas_gn,
                                               name="norm_out")
            if self.use_packed_conv:
                self.conv_out = PackedConv3x3(
                    self.out_nc, kernel_init=nn.initializers.zeros,
                    dtype=self.dtype)
            else:
                self.conv_out = nn.Conv(
                    self.out_nc, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out"
                )

    def get_smm_contexts(self):
        """Expose each SMM's learnable context so the owning model can run the
        frozen text tower outside the sampling scan."""
        return [smm.get_context() for smm in self.smms]

    def __call__(
        self,
        x_a,
        x_b,
        t,
        type_idx,
        text_fn: Optional[Callable] = None,
        image_context=None,
        degra_context=None,
        text_embs: Optional[Sequence[jnp.ndarray]] = None,
    ):
        B = x_a.shape[0]
        n_levels = len(self.ch_mult)
        x = jnp.concatenate([x_a, x_b], axis=-1)

        temb = timestep_embedding(t, self.nf).astype(self.dtype)
        temb = self.temb_dense1(nn.silu(self.temb_dense0(temb)))

        context = None
        if self.use_image_context and image_context is not None:
            context = image_context.astype(self.dtype)  # [B, n_tok, context_dim]
        if self.use_degra_context and degra_context is not None:
            d = degra_context.astype(self.dtype)
            context = d if context is None else jnp.concatenate([context, d], axis=1)

        if self.packed_l0:
            if (x_a.shape[2] % 2 == 0
                    and (context is None or context.shape[1] == 1)
                    and self.text_module == "scoremap"):
                return self._packed_forward(x_a, x_b, temb, context, type_idx,
                                            text_fn, text_embs)
            # the unpacked path below cannot run: conv_in/down/up/conv_out
            # are param-only holders under packed_l0 — fail with the reason
            # instead of a cryptic trace error (the engines guard these
            # conditions; a direct clone(packed_l0=True) may not)
            raise ValueError(
                "packed_l0 forward requires an even image width, at most "
                "one context token (use_degra_context adds a second) and "
                "text_module='scoremap'; got width "
                f"{x_a.shape[2]}, context tokens "
                f"{None if context is None else context.shape[1]}, "
                f"text_module={self.text_module!r}")

        h = self.conv_in(x.astype(self.dtype))
        skips = []
        bi = 0
        for i in range(n_levels):
            for _ in range(self.num_res_blocks):
                h = self.enc_blocks[bi](h, temb, context)
                bi += 1
            skips.append(h)
            if i < n_levels - 1:
                h = self.down[i](h)

        h = self.mid1(h, temb, context)
        h = self.mid_attn(h)
        h = self.mid2(h, temb, context)

        scoremaps = [None] * n_levels
        bi = len(self.dec_blocks)
        for i in reversed(range(n_levels)):
            skip = skips[i]
            if self.text_module == "scoremap" and (self.if_MultiScoreMap or i == 0):
                smm_i = i if self.if_MultiScoreMap else 0
                if text_embs is not None:
                    te = text_embs[smm_i]
                elif text_fn is not None:
                    te = text_fn(self.smms[smm_i].get_context())
                else:
                    raise ValueError("scoremap mode needs text_fn or text_embs")
                maps = self.smms[smm_i](skip, te)  # [B,h,w,K]
                sup = jnp.take_along_axis(
                    maps, type_idx.reshape(B, 1, 1, 1).astype(jnp.int32), axis=-1
                )
                scoremaps[i] = sup
                fused = self.smm_fuse[smm_i](maps)
                if self.presum_dec and self.presum_dec != "inmat":
                    skip = (skip, fused)
                else:
                    skip = jnp.concatenate([skip, fused], axis=-1)
            if self.presum_dec and self.presum_dec != "inmat":
                h = ((h,) + skip if isinstance(skip, tuple) else (h, skip))
            else:
                h = jnp.concatenate([h, skip], axis=-1)
            bi -= self.num_res_blocks + 1
            for j in range(self.num_res_blocks + 1):
                h = self.dec_blocks[bi + j](h, temb, context)
            if i > 0:
                up = self.up[i - 1]
                if isinstance(up, _ConvTParams):
                    ku, bu = up(h.shape[-1])
                    h = pk.conv_transpose_subpix(
                        h.astype(self.dtype), ku.astype(self.dtype),
                        bu.astype(self.dtype))
                else:
                    h = up(h)

        if self.use_fused_gnconv:
            gs, gb = self.norm_out(self.nf)
            ko, bo = self.conv_out(self.nf)
            scale, shift = gn_channel_affine(h, gs, gb, _gn_groups(self.nf))
            bias = jnp.broadcast_to(bo.astype(jnp.float32)[None],
                                    (h.shape[0], self.out_nc))
            out = fused_gn_silu_conv3x3(h, scale, shift, ko, bias)
        else:
            h = self.norm_out(h)  # fused GN+SiLU
            out = self.conv_out(h.astype(self.dtype))  # [B,H,W,out_nc]
        if self.out_nc > 1:
            pred = jnp.take_along_axis(
                out, type_idx.reshape(B, 1, 1, 1).astype(jnp.int32), axis=-1
            )
        else:
            pred = out
        if self.text_module == "scoremap":
            return pred, [m for m in scoremaps if m is not None]
        return pred

    def prepack_params(self, variables):
        """Pre-transform the level-0 conv kernels into their packed forms.

        The packed ops (ops/packed_l0.py) build transformed kernels from the
        raw checkpoint leaves at trace time; inside the sampling ``lax.scan``
        XLA does NOT hoist those scatter/update-slice chains out of the while
        body (measured ~0.5 ms/step of transform ops in the r3 device
        trace). Calling this ONCE per sample invocation — outside the scan —
        hands the ops pre-packed kernels, which they shape-sniff and use
        as-is. Pure function of the param tree; sampling only (training
        needs gradients w.r.t. the raw kernels)."""
        if (not self.packed_l0 or self.int8_conv or self.decomp_l0
                or self.ksplit_dec):
            return variables
        from ..ops import packed_l0 as pk

        var = {k: v for k, v in variables.items()}
        params = _deep_dict(var.get("params", {}))
        var["params"] = params
        nf, smc = self.nf, self.score_map_chan
        shift = self.shift_l0

        def tx(path, fn):
            """Store fn(kernel) as a ``kernel_packed`` SIBLING (flax
            validates declared param shapes, so the raw leaf stays; the
            holders prefer the packed sibling and XLA DCEs the raw fetch)."""
            d = params
            for p in path[:-1]:
                if not isinstance(d, dict) or p not in d:
                    return
                d = d[p]
            if isinstance(d, dict) and path[-1] in d:
                d["kernel_packed" if path[-1] == "kernel" else
                  path[-1] + "_packed"] = fn(d[path[-1]])

        tx(("conv_in", "kernel"), lambda k: pk.pack_kernel3x3(k, [1, 1]))

        def block(name, segments):
            segs = list(segments)
            if shift:
                tx((name, "conv1", "kernel"),
                   lambda k: pk.pack_kernel3x3_s2s(k, segs))
                tx((name, "conv2", "kernel"), pk.pack_kernel3x3_shift2std)
            else:
                tx((name, "conv1", "kernel"),
                   lambda k: pk.pack_kernel3x3(k, segs))
                tx((name, "conv2", "kernel"),
                   lambda k: pk.pack_kernel3x3(k, [k.shape[-2]]))
            tx((name, "skip", "kernel"),
               lambda k: pk.pack_kernel1x1(k, segs))

        for j in range(self.num_res_blocks):
            block(f"enc_0_{j}", [nf])
        for j in range(self.num_res_blocks + 1):
            block(f"dec_0_{j}", [nf, nf, smc] if j == 0 else [nf])
        tx(("down_0", "kernel"), pk.pack_kernel_down)
        if self.subpix_up:
            for i in range(len(self.ch_mult) - 1):
                tx((f"up_{i}", "kernel"), pk.pack_kernel_up_subpix)
        else:
            tx(("up_0", "kernel"), pk.pack_kernel_up)
        tx(("smm_fuse_0", "kernel"),
           lambda k: pk.pack_kernel1x1(k, [k.shape[-2]]))
        tx(("smm_0", "vis_in", "kernel"),
           lambda k: pk.pack_kernel1x1(k, [k.shape[0]]))
        if self.tapsum_out:
            def tapmat(k):
                wp = pk.pack_kernel3x3(k, [nf])
                kh, kw, C2, Co2 = wp.shape
                return jnp.transpose(wp, (2, 0, 1, 3)).reshape(
                    C2, kh * kw * Co2)
            tx(("conv_out", "kernel"), tapmat)
        else:
            tx(("conv_out", "kernel"),
               lambda k: pk.pack_kernel3x3(k, [k.shape[-2]]))
        if self.dtype != jnp.float32:
            # pre-cast conv/dense weights to the compute dtype: inside the
            # scan every `.astype(bf16)` of a weight is a separate tiny copy
            # op with fixed dispatch overhead (the r3 trace shows ~0.5
            # ms/step of such copies). GroupNorm/LayerNorm {scale, bias}
            # stay fp32 (their math runs in fp32 islands) — only dicts that
            # hold a `kernel` are cast.
            def cast(d):
                if not isinstance(d, dict):
                    return d
                if "kernel" in d or "kernel_packed" in d:
                    return {k: (v.astype(self.dtype)
                                if k in ("kernel", "kernel_packed", "bias")
                                and not isinstance(v, dict) else cast(v))
                            for k, v in d.items()}
                return {k: cast(v) for k, v in d.items()}
            var["params"] = cast(var["params"])
        return var

    def _packed_forward(self, x_a, x_b, temb, context, type_idx, text_fn,
                        text_embs):
        """Fully width-packed level-0 forward (ops/packed_l0.py): level-0
        activations stay packed [B,H,W/2,2C] end-to-end — convs via exact
        transformed kernels, GN via folded stats, SMM block-diagonal —
        so no relayout copies appear. Levels 1..n unchanged. Valid for
        training too: all ops are exact and differentiable, and the level-0
        supervision map is emitted (unpacked) for the pyramid loss — XLA
        dead-code-eliminates it in the sampler, which discards score maps."""
        B = x_a.shape[0]
        n_levels = len(self.ch_mult)
        dt = self.dtype

        xp = jnp.concatenate(
            [pk.pack_w(x_a.astype(dt)), pk.pack_w(x_b.astype(dt))], axis=-1)
        kin, bin_ = self.conv_in(self.in_nc)
        if self.presum_dec in ("tailmat", "inmat"):
            # conv_in has 4 packed input channels: as a conv the emitter pads
            # K to a 128-lane tile PER TAP (9 passes at 3% fill — measured
            # 7% MXU efficiency in the r4 trace); as ONE im2col matmul it is
            # a single K=36 pass. Exact.
            kp = kin if kin.shape[-2] == 2 * self.in_nc else \
                pk.pack_kernel3x3(kin, [1, 1])
            h = (pk.conv3x3_tail_matmul(xp, kp.astype(dt))
                 + jnp.tile(bin_.astype(dt), 2))
        else:
            h = pk.packed_conv3x3(xp, kin.astype(dt), bin_.astype(dt),
                                  segments=[1, 1])

        skips = []
        bi = 0
        for i in range(n_levels):
            for _ in range(self.num_res_blocks):
                h = self.enc_blocks[bi](h, temb, context)
                bi += 1
            skips.append(h)
            if i < n_levels - 1:
                if i == 0:
                    kd, bd = self.down[0](self.nf * self.ch_mult[0])
                    h = pk.packed_down_conv(h.astype(dt), kd.astype(dt),
                                            bd.astype(dt))
                else:
                    h = self.down[i](h)

        h = self.mid1(h, temb, context)
        h = self.mid_attn(h)
        h = self.mid2(h, temb, context)

        scoremaps = [None] * n_levels
        bi = len(self.dec_blocks)
        for i in reversed(range(n_levels)):
            skip = skips[i]
            if self.if_MultiScoreMap or i == 0:
                smm_i = i if self.if_MultiScoreMap else 0
                if text_embs is not None:
                    te = text_embs[smm_i]
                elif text_fn is not None:
                    te = text_fn(self.smms[smm_i].get_context())
                else:
                    raise ValueError("scoremap mode needs text_fn or text_embs")
                if i == 0:
                    maps_p = self.smms[smm_i](skip, te, packed=True)
                    K = maps_p.shape[-1] // 2
                    # supervised channel, gathered from both parities then
                    # unpacked (training loss target; DCE'd when sampling)
                    sup_idx = jnp.stack([type_idx, type_idx + K], axis=-1)
                    sup_p = jnp.take_along_axis(
                        maps_p, sup_idx.reshape(B, 1, 1, 2).astype(jnp.int32),
                        axis=-1)
                    scoremaps[i] = pk.unpack_w(sup_p)
                    kf, bf = self.smm_fuse[smm_i](K)
                    fused = pk.packed_conv1x1(
                        maps_p.astype(dt), kf.astype(dt), bf.astype(dt),
                        segments=[K])
                    skip = ((skip, fused)
                            if self.presum_dec and self.presum_dec != "inmat"
                            else jnp.concatenate([skip, fused], axis=-1))
                else:
                    maps = self.smms[smm_i](skip, te)
                    sup = jnp.take_along_axis(
                        maps, type_idx.reshape(B, 1, 1, 1).astype(jnp.int32),
                        axis=-1)
                    scoremaps[i] = sup
                    fused = self.smm_fuse[smm_i](maps)
                    skip = ((skip, fused)
                            if self.presum_dec and self.presum_dec != "inmat"
                            else jnp.concatenate([skip, fused], axis=-1))
            # at i == 0, h arrives packed from packed_up_conv; segments
            # follow the logical concat [h(nf), skip(nf), smm(score_map_chan)]
            if self.presum_dec and self.presum_dec != "inmat":
                h = ((h,) + skip if isinstance(skip, tuple) else (h, skip))
            else:
                h = jnp.concatenate([h, skip], axis=-1)
            bi -= self.num_res_blocks + 1
            for j in range(self.num_res_blocks + 1):
                h = self.dec_blocks[bi + j](h, temb, context)
            if i > 0:
                if i == 1:
                    ku, bu = self.up[0](h.shape[-1])
                    up_fn = (pk.packed_up_conv_subpix if self.subpix_up
                             else pk.packed_up_conv)
                    h = up_fn(h.astype(dt), ku.astype(dt), bu.astype(dt))
                elif self.subpix_up:
                    ku, bu = self.up[i - 1](h.shape[-1])
                    h = pk.conv_transpose_subpix(h.astype(dt), ku.astype(dt),
                                                 bu.astype(dt))
                else:
                    h = self.up[i - 1](h)

        gs, gb = self.norm_out(self.nf)
        h = pk.gn_silu_packed(h, gs, gb, _gn_groups(self.nf), [self.nf],
                              fold_mode="reshape" if self.gnfold_l0
                              else "matmul")
        ko, bo = self.conv_out(self.nf)
        conv_fn = (pk.packed_conv3x3_tapsum if self.tapsum_out
                   else pk.packed_conv3x3)
        out_p = conv_fn(h.astype(dt), ko.astype(dt), bo.astype(dt),
                        segments=[self.nf])  # [B,H,Wp,2*out_nc]
        if self.out_nc > 1:
            idx = jnp.stack([type_idx, type_idx + self.out_nc], axis=-1)
            pred_p = jnp.take_along_axis(
                out_p, idx.reshape(B, 1, 1, 2).astype(jnp.int32), axis=-1)
        else:
            pred_p = out_p
        pred = pk.unpack_w(pred_p)  # [B,H,W,1]
        return pred, [m for m in scoremaps if m is not None]


class LearnableForwardUNet(LearnableForwardUNetMultiScoreMap):
    """Single-score-map DDPM-baseline UNet (``LearnableFDUnet.
    LearnableForwardUNet``, config.yml:152-161): identical body with
    ``if_MultiScoreMap=False``."""

    if_MultiScoreMap: bool = False
