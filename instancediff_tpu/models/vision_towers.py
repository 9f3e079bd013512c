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


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: a per-channel affine from stored running
    statistics — the EXACT function the reference's frozen towers compute
    (every BN consumer here is a frozen conditioning encoder; torch eval BN
    never updates stats). Cheaper than any data-dependent norm on TPU and
    bit-faithful to converted checkpoints."""

    eps: float = 1e-5  # torch BatchNorm2d default

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        x32 = x.astype(jnp.float32)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class Bottleneck(nn.Module):
    """CLIP-ResNet bottleneck block (1x1 -> 3x3 -> avgpool-downsample -> 1x1
    x4), reference :38-82 in NHWC with frozen (eval) BatchNorm."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(name="bn2")(h))
        if self.stride > 1:  # CLIP's anti-aliased avg-pool downsample
            h = nn.avg_pool(h, (self.stride, self.stride),
                            strides=(self.stride, self.stride))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(name="bn3")(h)
        if self.stride > 1 or x.shape[-1] != out_ch:
            x = nn.avg_pool(x, (self.stride, self.stride),
                            strides=(self.stride, self.stride)) if self.stride > 1 else x
            x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="downsample")(x)
            x = FrozenBatchNorm(name="downsample_bn")(x)
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
        # explicit torch-style padding: SAME at stride 2 pads (0,1) while
        # torch's padding=1 pads (1,1) and floor-drops the tail row
        h = nn.Conv(w // 2, (3, 3), strides=(2, 2), use_bias=False,
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(name="bn1")(h))
        h = nn.Conv(w // 2, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(name="bn2")(h))
        h = nn.Conv(w, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = nn.relu(FrozenBatchNorm(name="bn3")(h))
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
        # embed_dim = final stage channels (width*8 planes x expansion 4):
        # the reference's q/k/v projections are SQUARE at this width
        # (:84-95 embed_dim == input C; was width*8 — a non-square deviation)
        pooled, _ = AttentionPool2d(self.width * 32, heads=self.heads,
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
    # accept [-1,1] 1|3-channel images and apply the OpenAI eval transform
    # on device (tower contract of clip_vit.CLIPVisionTower)
    openai_normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.openai_normalize:
            from .clip_vit import OPENAI_MEAN, OPENAI_STD

            x01 = (x + 1.0) / 2.0
            if x01.shape[-1] == 1:
                x01 = jnp.repeat(x01, 3, axis=-1)
            x = (x01 - jnp.asarray(OPENAI_MEAN, x01.dtype)) / jnp.asarray(
                OPENAI_STD, x01.dtype)
        _, pooled = CLIPResNetWithAttention(
            layers=self.layers, width=self.width, output_dim=self.output_dim,
            heads=self.heads, dtype=self.dtype, name="trunk")(x)
        return pooled


class CLIPDenseVisionTransformer(nn.Module):
    """Reference-exact dense ViT tower (``CLIPVisionTransformer``,
    :593-726): OpenAI-flavour blocks (QuickGELU, ln_pre), runtime-bilinear
    positional embedding, intermediate-block taps at ``out_indices``, and
    the patch-size-keyed GN/deconv/maxpool FPN necks. Preserves the
    reference quirk that the class token receives ``class_embedding``
    twice (:644-698: once in the token cat, once folded into cls_pos).

    Returns ``[fpn1..fpn4]`` feature maps (NHWC) and, with
    ``get_embeddings=True``, appends ``[global_emb, visual_emb]``."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    out_indices: Sequence[int] = (3, 5, 7, 11)
    get_embeddings: bool = False
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
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(xin.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        tokens = x.reshape(B, gh * gw, self.width)

        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        side = self.image_size // self.patch_size
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (side * side + 1, self.width))
        # :644-646 cat [class_embedding, tokens]; :697 cls_pos adds it AGAIN
        cls_tok = jnp.broadcast_to(cls.astype(tokens.dtype),
                                   (B, 1, self.width))
        spatial_pos = pos[1:].reshape(side, side, self.width)
        if (gh, gw) != (side, side):  # runtime bilinear interp (:698-700)
            # antialias=False: torch F.interpolate has no antialias (:698)
            spatial_pos = jax.image.resize(
                spatial_pos, (gh, gw, self.width), "bilinear",
                antialias=False)
        cls_pos = (pos[0] + cls)[None, None]
        full_pos = jnp.concatenate(
            [cls_pos, spatial_pos.reshape(1, gh * gw, self.width)], axis=1)
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)
        tokens = tokens + full_pos.astype(tokens.dtype)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="ln_pre")(tokens)

        taps = []
        for i in range(self.layers):
            tokens = TransformerBlock(self.width, self.heads,
                                      act="quick_gelu", ln_eps=1e-5,
                                      dtype=self.dtype,
                                      name=f"block_{i}")(tokens)
            if i in tuple(self.out_indices):
                taps.append(tokens[:, 1:].reshape(B, gh, gw, self.width))

        def gn(name):
            return nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                dtype=jnp.float32, name=name)

        def deconv(name):
            return nn.ConvTranspose(self.width, (2, 2), strides=(2, 2),
                                    dtype=self.dtype, name=name)

        feats = []
        if self.patch_size == 16:  # :619-638
            h = deconv("fpn1_deconv1")(gn("fpn1_gn")(taps[0]))
            h = FrozenBatchNorm(name="fpn1_bn")(h)  # SyncBN, frozen tower
            h = jax.nn.gelu(h, approximate=False)
            feats.append(deconv("fpn1_deconv2")(h))
            feats.append(deconv("fpn2_deconv")(gn("fpn2_gn")(taps[1])))
            feats.append(gn("fpn3_gn")(taps[2]))
            feats.append(nn.max_pool(gn("fpn4_gn")(taps[3]), (2, 2),
                                     strides=(2, 2)))
        else:  # patch_size == 8, :640-656
            feats.append(deconv("fpn1_deconv")(gn("fpn1_gn")(taps[0])))
            feats.append(gn("fpn2_gn")(taps[1]))
            feats.append(nn.max_pool(gn("fpn3_gn")(taps[2]), (2, 2),
                                     strides=(2, 2)))
            feats.append(nn.max_pool(gn("fpn4_gn")(taps[3]), (4, 4),
                                     strides=(4, 4)))

        if self.get_embeddings:  # :715-724
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="ln_post")(tokens)
            proj = self.param("proj",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.output_dim))
            out = out @ proj.astype(out.dtype)
            feats.append([out[:, 0], out[:, 1:].reshape(B, gh, gw, -1)])
        return feats


def load_torch_dense_vit_weights(params, state_dict, prefix="visual."):
    """Map a torch ``CLIPVisionTransformer`` (reference :593-726 /
    OpenAI-jit visual) state dict onto ``CLIPDenseVisionTransformer`` params
    — trunk always; FPN-neck keys when present (real CLIP checkpoints don't
    carry necks; the reference loads them misaligned-random, :658-685)."""
    import numpy as np

    sd = {k[len(prefix):] if k.startswith(prefix) else k: np.asarray(v)
          for k, v in state_dict.items()}
    p = jax.tree_util.tree_map(np.asarray, params)

    p["patch_embed"]["kernel"] = sd["conv1.weight"].transpose(2, 3, 1, 0)
    p["class_embedding"] = sd["class_embedding"]
    pos = sd["positional_embedding"]
    if pos.shape != p["positional_embedding"].shape:  # :670-681 load interp
        side_src = int(round((pos.shape[0] - 1) ** 0.5))
        side_dst = int(round((p["positional_embedding"].shape[0] - 1) ** 0.5))
        # antialias=False matches the reference's load-time F.interpolate
        grid = np.asarray(jax.image.resize(
            jnp.asarray(pos[1:].reshape(side_src, side_src, -1)),
            (side_dst, side_dst, pos.shape[-1]), "bilinear",
            antialias=False))
        pos = np.concatenate([pos[:1], grid.reshape(side_dst * side_dst, -1)])
    p["positional_embedding"] = pos
    for ln in ("ln_pre", "ln_post"):
        if f"{ln}.weight" in sd and ln in p:
            p[ln]["scale"] = sd[f"{ln}.weight"]
            p[ln]["bias"] = sd[f"{ln}.bias"]
    if "proj" in sd and "proj" in p:
        p["proj"] = sd["proj"]
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd and f"block_{i}" in p:
        blk, R = p[f"block_{i}"], f"transformer.resblocks.{i}"
        for ours, theirs in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            blk[ours]["scale"] = sd[f"{R}.{theirs}.weight"]
            blk[ours]["bias"] = sd[f"{R}.{theirs}.bias"]
        w, b = sd[f"{R}.attn.in_proj_weight"], sd[f"{R}.attn.in_proj_bias"]
        for name, wp, bp in zip(("q_proj", "k_proj", "v_proj"),
                                np.split(w, 3, axis=0), np.split(b, 3, axis=0)):
            blk[name]["kernel"], blk[name]["bias"] = wp.T, bp
        blk["out_proj"]["kernel"] = sd[f"{R}.attn.out_proj.weight"].T
        blk["out_proj"]["bias"] = sd[f"{R}.attn.out_proj.bias"]
        blk["fc"]["kernel"] = sd[f"{R}.mlp.c_fc.weight"].T
        blk["fc"]["bias"] = sd[f"{R}.mlp.c_fc.bias"]
        blk["proj"]["kernel"] = sd[f"{R}.mlp.c_proj.weight"].T
        blk["proj"]["bias"] = sd[f"{R}.mlp.c_proj.bias"]
        i += 1

    def neck_gn(dst, key):
        if f"{key}.weight" in sd and dst in p:
            p[dst]["scale"] = sd[f"{key}.weight"]
            p[dst]["bias"] = sd[f"{key}.bias"]

    def neck_deconv(dst, key):
        if f"{key}.weight" in sd and dst in p:
            # torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out]
            # + SPATIAL FLIP: torch computes the conv gradient (flipped
            # kernel); lax.conv_transpose uses the kernel as-is
            w = sd[f"{key}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
            p[dst]["kernel"] = np.ascontiguousarray(w)
            p[dst]["bias"] = sd[f"{key}.bias"]

    if "fpn1_deconv1" in p:  # patch 16 necks (torch Sequential indices)
        neck_gn("fpn1_gn", "fpn1.0")
        neck_deconv("fpn1_deconv1", "fpn1.1")
        if "fpn1.2.weight" in sd:
            p["fpn1_bn"]["scale"] = sd["fpn1.2.weight"]
            p["fpn1_bn"]["bias"] = sd["fpn1.2.bias"]
            p["fpn1_bn"]["mean"] = sd["fpn1.2.running_mean"]
            p["fpn1_bn"]["var"] = sd["fpn1.2.running_var"]
        neck_deconv("fpn1_deconv2", "fpn1.4")
        neck_gn("fpn2_gn", "fpn2.0")
        neck_deconv("fpn2_deconv", "fpn2.1")
        neck_gn("fpn3_gn", "fpn3")
        neck_gn("fpn4_gn", "fpn4.0")
    else:  # patch 8 necks
        neck_gn("fpn1_gn", "fpn1.0")
        neck_deconv("fpn1_deconv", "fpn1.1")
        neck_gn("fpn2_gn", "fpn2")
        neck_gn("fpn3_gn", "fpn3.0")
        neck_gn("fpn4_gn", "fpn4.0")
    return p


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


class RefAttention(nn.Module):
    """The reference's standalone ``Attention`` module
    (_modified_BiomedCLIP.py:448-479): separate bias-free q/k/v projections
    (``qkv_bias=False`` default) + biased output projection."""

    dim: int
    heads: int = 4
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        qq = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="q_proj")(q)
        kk = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="k_proj")(k)
        vv = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="v_proj")(v)
        out = multi_head_attention(qq, kk, vv, self.heads)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class RefDecoderLayer(nn.Module):
    """Reference-exact decoder layer: ``TransformerDecoderLayer``
    (:520-549) and, with ``scaled=True``, ``TransformerDecoderLayer_scaled``
    (:552-590 — per-branch learned gammas init 0.1):

        x += [g_sa *] self_attn(norm1(x) as q,k,v)
        x += [g_ca *] cross_attn(norm2(x), mem, mem)   # mem NOT re-normed
        x += [g_mlp *] mlp(norm3(x))

    (ScoreMapModule keeps the leaner cross-attn-only ``ScaledDecoderLayer``
    reconstruction for the missing upstream SMM; this class exists for exact
    behavioural parity with the surviving reference source, golden-tested
    against it in tests/test_context_decoder_golden.py.)"""

    dim: int
    heads: int = 4
    scaled: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem):
        def gamma(name):
            if not self.scaled:
                return 1.0
            return self.param(name, nn.initializers.constant(0.1),
                              (1, 1, self.dim)).astype(x.dtype)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + gamma("gamma_sa") * RefAttention(
            self.dim, self.heads, dtype=self.dtype, name="self_attn")(h, h, h)
        q = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + gamma("gamma_ca") * RefAttention(
            self.dim, self.heads, dtype=self.dtype, name="cross_attn")(
                q, mem, mem)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="proj")(h)
        return x + gamma("gamma_mlp") * h


class ContextDecoderRef(nn.Module):
    """Reference-exact ``ContextDecoder`` (:1194-1245; ``scaled=False``) and
    the *used* forward of ``ContextDecoder_Hierachical(_Agregate)``
    (:1246-1399; ``scaled=True`` — upstream builds 4 memory projections but
    its shipping forward consumes scale 0 only, :1391-1399, so one
    memory_proj is the behavioural surface):

        visual -> memory_proj (LN, Linear, LN)
        text   -> text_proj   (LN, Linear)
        L x RefDecoderLayer(x, visual)
        out_proj (LN, Linear)
    """

    width: int = 256
    heads: int = 4
    layers: int = 6
    visual_dim: int = 512
    text_dim: int = 512
    out_dim: int = 512
    scaled: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, visual):
        m = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="mem_ln0")(visual)
        m = nn.Dense(self.width, dtype=self.dtype, name="mem_fc")(m)
        m = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="mem_ln1")(m)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="text_ln")(text)
        x = nn.Dense(self.width, dtype=self.dtype, name="text_fc")(x)
        for i in range(self.layers):
            x = RefDecoderLayer(self.width, self.heads, scaled=self.scaled,
                                dtype=self.dtype, name=f"layer_{i}")(x, m)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_ln")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out_fc")(x)


def load_torch_context_decoder_weights(params, state_dict, layers):
    """Map a torch ``ContextDecoder``/``ContextDecoder_Hierachical`` state
    dict onto ``ContextDecoderRef`` params (hierarchical dicts: scale-0
    memory projection ``memory_proj_0``; extra scales are dead in the
    reference forward and skipped)."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    mp = "memory_proj_0" if "memory_proj_0.0.weight" in sd else "memory_proj"
    p = jax.tree_util.tree_map(np.asarray, params)

    def put(dst, name, w, transpose=False):
        dst[name] = w.T if transpose else w

    put(p["mem_ln0"], "scale", sd[f"{mp}.0.weight"])
    put(p["mem_ln0"], "bias", sd[f"{mp}.0.bias"])
    put(p["mem_fc"], "kernel", sd[f"{mp}.1.weight"], True)
    put(p["mem_fc"], "bias", sd[f"{mp}.1.bias"])
    put(p["mem_ln1"], "scale", sd[f"{mp}.2.weight"])
    put(p["mem_ln1"], "bias", sd[f"{mp}.2.bias"])
    put(p["text_ln"], "scale", sd["text_proj.0.weight"])
    put(p["text_ln"], "bias", sd["text_proj.0.bias"])
    put(p["text_fc"], "kernel", sd["text_proj.1.weight"], True)
    put(p["text_fc"], "bias", sd["text_proj.1.bias"])
    for i in range(layers):
        lp = p[f"layer_{i}"]
        t = f"decoder.{i}"
        for ln in ("norm1", "norm2", "norm3"):
            put(lp[ln], "scale", sd[f"{t}.{ln}.weight"])
            put(lp[ln], "bias", sd[f"{t}.{ln}.bias"])
        for attn in ("self_attn", "cross_attn"):
            for proj in ("q_proj", "k_proj", "v_proj"):
                put(lp[attn][proj], "kernel", sd[f"{t}.{attn}.{proj}.weight"],
                    True)
                if f"{t}.{attn}.{proj}.bias" in sd:
                    put(lp[attn][proj], "bias", sd[f"{t}.{attn}.{proj}.bias"])
            put(lp[attn]["proj"], "kernel", sd[f"{t}.{attn}.proj.weight"], True)
            put(lp[attn]["proj"], "bias", sd[f"{t}.{attn}.proj.bias"])
        put(lp["fc"], "kernel", sd[f"{t}.mlp.0.weight"], True)
        put(lp["fc"], "bias", sd[f"{t}.mlp.0.bias"])
        put(lp["proj"], "kernel", sd[f"{t}.mlp.3.weight"], True)
        put(lp["proj"], "bias", sd[f"{t}.mlp.3.bias"])
        for g in ("gamma_sa", "gamma_ca", "gamma_mlp"):
            if f"{t}.{g}" in sd:
                put(lp, g, sd[f"{t}.{g}"])
    put(p["out_ln"], "scale", sd["out_proj.0.weight"])
    put(p["out_ln"], "bias", sd["out_proj.0.bias"])
    put(p["out_fc"], "kernel", sd["out_proj.1.weight"], True)
    put(p["out_fc"], "bias", sd["out_proj.1.bias"])
    return p


def load_torch_clip_resnet_weights(params, state_dict, prefix="visual."):
    """Map an OpenAI-CLIP / open_clip ``ModifiedResNet`` visual state dict
    (reference CLIPResNet(_WithAttention) :113-311 / the vendored
    modified_resnet.py) onto ``CLIPResNetWithAttention``/``ModifiedResNet``
    params.

    BatchNorms land on :class:`FrozenBatchNorm` (weight/bias/running_mean/
    running_var -> scale/bias/mean/var — exact eval-mode parity). The
    attention-pool positional embedding is bilinearly resampled when the
    checkpoint grid differs from the model's (the reference interpolates at
    every forward, :101-108)."""
    import numpy as np

    sd = {k[len(prefix):] if k.startswith(prefix) else k: np.asarray(v)
          for k, v in state_dict.items()}
    if "trunk" in params:  # ModifiedResNet wraps the trunk
        inner = load_torch_clip_resnet_weights(params["trunk"], sd, prefix="")
        out = dict(params)
        out["trunk"] = inner
        return out
    p = jax.tree_util.tree_map(np.asarray, params)

    def conv(dst, key):
        p[dst]["kernel"] = sd[key].transpose(2, 3, 1, 0)

    def bn(dst, key):
        p[dst]["scale"] = sd[f"{key}.weight"]
        p[dst]["bias"] = sd[f"{key}.bias"]
        p[dst]["mean"] = sd[f"{key}.running_mean"]
        p[dst]["var"] = sd[f"{key}.running_var"]

    for i in (1, 2, 3):  # stem
        conv(f"conv{i}", f"conv{i}.weight")
        bn(f"bn{i}", f"bn{i}")
    si = 0
    while f"layer{si}_0" in p:
        bi = 0
        while f"layer{si}_{bi}" in p:
            blk = p[f"layer{si}_{bi}"]
            t = f"layer{si + 1}.{bi}"
            for i in (1, 2, 3):
                blk[f"conv{i}"]["kernel"] = sd[
                    f"{t}.conv{i}.weight"].transpose(2, 3, 1, 0)
                for fx, tk in (("scale", "weight"), ("bias", "bias"),
                               ("mean", "running_mean"), ("var", "running_var")):
                    blk[f"bn{i}"][fx] = sd[f"{t}.bn{i}.{tk}"]
            if "downsample" in blk:
                blk["downsample"]["kernel"] = sd[
                    f"{t}.downsample.0.weight"].transpose(2, 3, 1, 0)
                for fx, tk in (("scale", "weight"), ("bias", "bias"),
                               ("mean", "running_mean"), ("var", "running_var")):
                    blk["downsample_bn"][fx] = sd[f"{t}.downsample.1.{tk}"]
            bi += 1
        si += 1

    ap = p["attnpool"]
    pos = sd["attnpool.positional_embedding"]
    want = ap["positional_embedding"].shape
    if pos.shape != want:  # grid mismatch: bilinear like the reference fwd
        side_src = int(round((pos.shape[0] - 1) ** 0.5))
        side_dst = int(round((want[0] - 1) ** 0.5))
        grid = pos[1:].reshape(side_src, side_src, -1)
        # antialias=False matches the reference's F.interpolate (:101-108)
        grid = np.asarray(jax.image.resize(
            jnp.asarray(grid), (side_dst, side_dst, grid.shape[-1]),
            "bilinear", antialias=False))
        pos = np.concatenate([pos[:1], grid.reshape(side_dst * side_dst, -1)])
    ap["positional_embedding"] = pos
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        ap[name]["kernel"] = sd[f"attnpool.{name}.weight"].T
        ap[name]["bias"] = sd[f"attnpool.{name}.bias"]
    return p
