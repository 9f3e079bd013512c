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
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.pallas_kernels import group_norm_silu, group_norm_silu_reference
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


class ResBlock(nn.Module):
    """GN + SiLU + 3x3 conv x2 with timestep injection and optional
    image-context cross-attention (the reference conv block,
    SURVEY.md SS2.10 row 1 — the Pallas fusion target)."""

    out_ch: int
    use_context: bool = False
    context_dim: int = 512
    use_pallas_gn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, temb, context=None):
        in_ch = h.shape[-1]
        x = FusedGroupNormSiLU(_gn_groups(in_ch), use_pallas=self.use_pallas_gn,
                               name="gns1")(h)
        x = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = x + nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(nn.silu(temb))[
            :, None, None
        ]
        x = FusedGroupNormSiLU(_gn_groups(self.out_ch), use_pallas=self.use_pallas_gn,
                               name="gns2")(x)
        x = nn.Conv(
            self.out_ch, (3, 3), dtype=self.dtype, kernel_init=nn.initializers.zeros, name="conv2"
        )(x.astype(self.dtype))
        if in_ch != self.out_ch:
            h = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(h)
        h = h + x
        if self.use_context and context is not None:
            h = ContextCrossAttention(
                self.out_ch, self.context_dim, dtype=self.dtype, name="xattn"
            )(h, context)
        return h


class SelfAttention2D(nn.Module):
    """Spatial self-attention at the bottleneck."""

    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        B, H, W, C = h.shape
        x = nn.GroupNorm(num_groups=_gn_groups(C), dtype=jnp.float32)(h).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x)
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
    remat: bool = False  # rematerialise ResBlocks (training at 224px+ OOMs
    # HBM without it: measured 16.8G/15.75G at B=4 fp32 on v5e)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n_levels = len(self.ch_mult)
        RB = nn.remat(ResBlock) if self.remat else ResBlock
        self.temb_dense0 = nn.Dense(self.nf * 4, dtype=self.dtype)
        self.temb_dense1 = nn.Dense(self.nf * 4, dtype=self.dtype)
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
                        dtype=self.dtype,
                        name=f"enc_{i}_{j}",
                    )
                )
        self.enc_blocks = enc
        self.down = [
            nn.Conv(self.nf * self.ch_mult[i], (3, 3), strides=(2, 2), dtype=self.dtype,
                    name=f"down_{i}")
            for i in range(n_levels - 1)
        ]

        mid_ch = self.nf * self.ch_mult[-1]
        self.mid1 = RB(mid_ch, use_context=self.use_image_context,
                             context_dim=self.context_dim,
                             use_pallas_gn=self.use_pallas_gn,
                             dtype=self.dtype, name="mid1")
        self.mid_attn = SelfAttention2D(dtype=self.dtype, name="mid_attn")
        self.mid2 = RB(mid_ch, use_context=self.use_image_context,
                             context_dim=self.context_dim,
                             use_pallas_gn=self.use_pallas_gn,
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
                nn.Conv(self.score_map_chan, (1, 1), dtype=self.dtype, name=f"smm_fuse_{i}")
                for i in range(len(self.smms))
            ]

        dec = []
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks + 1):
                dec.append(
                    RB(
                        self.nf * mult,
                        use_context=self.use_image_context or self.use_degra_context,
                        context_dim=self.context_dim,
                        use_pallas_gn=self.use_pallas_gn,
                        dtype=self.dtype,
                        name=f"dec_{i}_{j}",
                    )
                )
        self.dec_blocks = dec
        # ConvTranspose upsampling: nearest-resize+conv wins in isolation
        # (0.12 vs 0.42 ms) but LOSES ~9% end-to-end — the resize gather
        # breaks producer fusion inside the scan body (measured both ways)
        self.up = [
            nn.ConvTranspose(self.nf * self.ch_mult[i], (4, 4), strides=(2, 2),
                             dtype=self.dtype, name=f"up_{i}")
            for i in range(n_levels - 1)
        ]
        self.norm_out = FusedGroupNormSiLU(_gn_groups(self.nf),
                                           use_pallas=self.use_pallas_gn,
                                           name="norm_out")
        self.conv_out = nn.Conv(
            self.out_nc, (3, 3), dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="conv_out"
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
                skip = jnp.concatenate([skip, self.smm_fuse[smm_i](maps)], axis=-1)
            h = jnp.concatenate([h, skip], axis=-1)
            bi -= self.num_res_blocks + 1
            for j in range(self.num_res_blocks + 1):
                h = self.dec_blocks[bi + j](h, temb, context)
            if i > 0:
                h = self.up[i - 1](h)

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


class LearnableForwardUNet(LearnableForwardUNetMultiScoreMap):
    """Single-score-map DDPM-baseline UNet (``LearnableFDUnet.
    LearnableForwardUNet``, config.yml:152-161): identical body with
    ``if_MultiScoreMap=False``."""

    if_MultiScoreMap: bool = False
