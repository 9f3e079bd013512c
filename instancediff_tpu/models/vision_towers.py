"""Dense CLIP vision towers and context decoders.

Capability parity with the DenseCLIP-style classes of reference
_modified_BiomedCLIP.py that survive upstream but sit outside the main
training path (SURVEY.md SS2.6): ``Bottleneck``/``CLIPResNetWithAttention``
(:38-311, multi-scale ResNet with attention pooling), ``AttentionPool2d``,
``CLIPVisionTransformer`` with FPN necks (:593-726), and the
``ContextDecoder`` family (:1194-1399) whose scaled-decoder layer is already
the ScoreMapModule's building block (scoremap.py).

These make the full conditioning-encoder surface available for model
variants: dense per-pixel visual embeddings at multiple scales for
score-map-style heads.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .scoremap import ScaledDecoderLayer


class Bottleneck(nn.Module):
    """CLIP-ResNet bottleneck block (1x1 -> 3x3 -> avgpool-downsample -> 1x1
    x4), reference :38-111 behaviour in NHWC."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h))
        h = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h))
        if self.stride > 1:  # CLIP's anti-aliased avg-pool downsample
            h = nn.avg_pool(h, (self.stride, self.stride),
                            strides=(self.stride, self.stride))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h)
        if self.stride > 1 or x.shape[-1] != out_ch:
            x = nn.avg_pool(x, (self.stride, self.stride),
                            strides=(self.stride, self.stride)) if self.stride > 1 else x
            x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="downsample")(x)
            x = nn.GroupNorm(num_groups=1, dtype=jnp.float32)(x)
        return nn.relu(h + x)


class AttentionPool2d(nn.Module):
    """Global attention pooling (reference :113-176): mean token as query over
    spatial tokens + positional embedding; returns (pooled, tokens)."""

    embed_dim: int
    heads: int = 8
    out_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean = tokens.mean(axis=1, keepdims=True)
        seq = jnp.concatenate([mean, tokens], axis=1)  # [B, 1+HW, C]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (H * W + 1, C))
        seq = seq + pos[None].astype(seq.dtype)
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(seq)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(seq)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(seq)
        attn = multi_head_attention(q, k, v, self.heads)
        out = nn.Dense(self.out_dim or self.embed_dim, dtype=self.dtype,
                       name="c_proj")(attn)
        return out[:, 0], out[:, 1:]


class CLIPResNetWithAttention(nn.Module):
    """Multi-scale CLIP ResNet (reference :179-311): 3-conv stem + 4 stages,
    returns the 4 stage feature maps plus the attention-pooled embedding."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 512
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        h = nn.Conv(w // 2, (3, 3), strides=(2, 2), use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.relu(nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h))
        h = nn.Conv(w // 2, (3, 3), use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h))
        h = nn.Conv(w, (3, 3), use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(nn.GroupNorm(num_groups=1, dtype=jnp.float32)(h))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        outs = []
        planes = w
        for si, n_blocks in enumerate(self.layers):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{si}_{bi}")(h)
            outs.append(h)
            planes *= 2
        pooled, _ = AttentionPool2d(self.width * 8, heads=self.heads,
                                    out_dim=self.output_dim, dtype=self.dtype,
                                    name="attnpool")(h)
        return outs, pooled


class ModifiedResNet(nn.Module):
    """open_clip visual ResNet (BiomedCLIP/modified_resnet.py:95-181): the
    same 3-conv anti-aliased stem + CLIP bottleneck stages as
    `CLIPResNetWithAttention`, but with the open_clip tower contract —
    only the attention-pooled embedding is returned."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 512
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, pooled = CLIPResNetWithAttention(
            layers=self.layers, width=self.width, output_dim=self.output_dim,
            heads=self.heads, dtype=self.dtype, name="trunk")(x)
        return pooled


class CLIPDenseVisionTransformer(nn.Module):
    """Dense ViT tower with FPN necks (reference :593-726): patch tokens are
    reshaped to a feature map and projected to a 4-scale pyramid
    (upsample x4, x2, identity, downsample x2)."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    fpn_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from .clip_vit import OPENAI_MEAN, OPENAI_STD
        from .text_encoder import TransformerBlock

        B, H, W, C = images.shape
        x01 = (images + 1.0) / 2.0
        if C == 1:
            x01 = jnp.repeat(x01, 3, axis=-1)
        xin = (x01 - jnp.asarray(OPENAI_MEAN, x01.dtype)) / jnp.asarray(
            OPENAI_STD, x01.dtype)
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(xin.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(B, gh * gw, self.width)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw, self.width))
        tokens = tokens + pos[None].astype(tokens.dtype)
        for i in range(self.layers):
            tokens = TransformerBlock(self.width, self.heads, act="gelu",
                                      dtype=self.dtype, name=f"block_{i}")(tokens)
        fmap = tokens.reshape(B, gh, gw, self.width)

        # FPN necks (reference :619-656): 4 scales from the final map
        up4 = jax.image.resize(fmap, (B, gh * 4, gw * 4, self.width), "bilinear")
        up2 = jax.image.resize(fmap, (B, gh * 2, gw * 2, self.width), "bilinear")
        dn2 = nn.avg_pool(fmap, (2, 2), strides=(2, 2))
        pyramid = []
        for i, f in enumerate((up4, up2, fmap, dn2)):
            pyramid.append(nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype,
                                   name=f"fpn_{i}")(f))
        return pyramid


class ContextDecoder(nn.Module):
    """Text-query <-> visual-memory cross-attention decoder (reference
    :1194-1257): stacked scaled decoder layers over a single memory."""

    dim: int = 512
    layers: int = 3
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memory):
        q = queries
        for i in range(self.layers):
            q = ScaledDecoderLayer(self.dim, self.heads, dtype=self.dtype,
                                   name=f"layer_{i}")(q, memory)
        return q


class ContextDecoderHierarchical(nn.Module):
    """Hierarchical variant (reference :1258-1399): per-scale memory
    projections; ``ContextDecoder_Hierachical_Agregate`` upstream builds 4
    projections but uses scale 0 only (:1391-1399) — here all provided scales
    are aggregated (concatenated along the token axis) before decoding."""

    dim: int = 512
    layers: int = 3
    heads: int = 4
    n_scales: int = 4
    use_scales: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, memories):
        mems = []
        for i in self.use_scales:
            if i < len(memories):
                mems.append(nn.Dense(self.dim, dtype=self.dtype,
                                     name=f"mem_proj_{i}")(memories[i]))
        memory = jnp.concatenate(mems, axis=1)
        q = queries
        for i in range(self.layers):
            q = ScaledDecoderLayer(self.dim, self.heads, dtype=self.dtype,
                                   name=f"layer_{i}")(q, memory)
        return q
