"""TPU-native CoCa (Contrastive Captioner) analogue.

The reference vendors open_clip's CoCa — CLIP towers plus a causal
multimodal text decoder with per-layer cross-attention over attention-pooled
image tokens, and a torch ``generate()`` captioning loop
(models/BiomedCLIP/BiomedCLIP/coca_model.py:79-299, transformer.py:165-185
``AttentionalPooler``, :711-803 ``MultimodalTransformer``). It is dead code
on the reference's own call path (BiomedCLIP_config.json selects
``CustomTextCLIP``); rebuilt here for inventory completeness, redesigned
TPU-first rather than translated:

* all towers are flax modules reusing this repo's pre-LN
  ``TransformerBlock`` / ``multi_head_attention`` primitives;
* ``generate`` is a jittable **fixed-shape** ``lax.scan`` (static
  ``seq_len``; EOS handled by a finished-mask + pad fill) instead of the
  reference's dynamic-length Python while loop (coca_model.py:267-294) —
  data-dependent shapes do not compile on TPU;
* beam search keeps the reference's HF group semantics
  (``num_beam_groups`` with the default ``diversity_penalty=0`` makes the
  groups independent searches, coca_model.py:301-448) by running an
  independent fixed-length beam scan per group.

Weight conversion from open_clip CoCa checkpoints (coca_ViT-B-32 et al.,
pretrained.py:279-286) is `load_torch_coca_weights`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention
from .clip_vit import OPENAI_MEAN, OPENAI_STD
from .text_encoder import TransformerBlock, quick_gelu

NEG_INF = -1e9  # additive-mask -inf stand-in (finite: keeps softmax NaN-free)


class AttentionalPooler(nn.Module):
    """Learnable-query cross-attention pooling (transformer.py:165-185).

    ``__call__(x [B, N, context_dim]) -> [B, n_queries, d_model]``."""

    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        q0 = self.param("query", nn.initializers.normal(1.0),
                        (self.n_queries, self.d_model))
        q = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_q")(q0)
        k = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_k")(x)
        qh = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(
            jnp.broadcast_to(q[None], (B,) + q.shape))
        kh = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k)
        vh = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(k)
        out = multi_head_attention(qh, kh, vh, self.n_head)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class CrossAttentionBlock(nn.Module):
    """Pre-LN residual cross-attention block
    (ResidualAttentionBlock(is_cross_attention=True), transformer.py:188-215)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv):
        if self.act == "quick_gelu":
            act = quick_gelu
        else:  # open_clip uses torch nn.GELU — the exact erf form
            act = lambda h: jax.nn.gelu(h, approximate=False)  # noqa: E731
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        hk = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1_kv")(kv)
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(hk)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(hk)
        attn = multi_head_attention(q, k, v, self.heads)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     name="fc")(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="proj")(act(h))
        return x


class MultimodalDecoder(nn.Module):
    """Causal text decoder with per-layer image cross-attention
    (MultimodalTransformer, transformer.py:711-803): for each layer a causal
    self-attention resblock then a cross-attention resblock over the image
    tokens; final LN + projection to the vocabulary."""

    width: int
    heads: int
    layers: int
    vocab_size: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embs, text_embs):
        L = text_embs.shape[1]
        causal = jnp.where(jnp.tril(jnp.ones((L, L), dtype=bool)),
                           0.0, NEG_INF)[None]
        x = text_embs
        for i in range(self.layers):
            x = TransformerBlock(self.width, self.heads,
                                 mlp_ratio=self.mlp_ratio, act=self.act,
                                 dtype=self.dtype, name=f"block_{i}")(
                x, mask=causal)
            x = CrossAttentionBlock(self.width, self.heads,
                                    mlp_ratio=self.mlp_ratio, act=self.act,
                                    dtype=self.dtype, name=f"cross_{i}")(
                x, image_embs)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        return nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                        name="text_projection")(x)


class CoCaTextTower(nn.Module):
    """TextTransformer with an appended CLS token (embed_cls=True,
    transformer.py:672-706): causal mask + pad-key masking, pooled = last
    (CLS) position -> ln_final -> projection; the per-token embeddings
    (without CLS, un-normalised) feed the multimodal decoder."""

    vocab_size: int
    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    pad_id: int = 0
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        B, L = ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(ids)
        cls = self.param("cls_emb", nn.initializers.normal(0.01),
                         (self.width,))
        x = jnp.concatenate(
            [tok, jnp.broadcast_to(cls[None, None], (B, 1, self.width)
                                   ).astype(tok.dtype)], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length + 1, self.width))
        x = x + pos[None, : L + 1].astype(x.dtype)

        # causal + the reference's exact cls mask (build_cls_mask,
        # transformer.py:663-670): the pad mask is applied ONLY to the
        # appended-CLS query row (F.pad top-pads L all-True rows), with the
        # key axis left-padded by one True (so key j+1 carries token j's
        # pad bit and the final CLS key inherits token L-1's)
        causal = jnp.where(jnp.tril(jnp.ones((L + 1, L + 1), dtype=bool)),
                           0.0, NEG_INF)
        keep_shift = jnp.concatenate([jnp.ones((B, 1), dtype=bool),
                                      ids != self.pad_id], axis=1)
        cls_row = jnp.where(keep_shift, 0.0, NEG_INF)  # [B, L+1]
        pad_rows = jnp.concatenate(
            [jnp.zeros((B, L, L + 1), cls_row.dtype), cls_row[:, None, :]],
            axis=1)
        mask = causal[None] + pad_rows
        for i in range(self.layers):
            x = TransformerBlock(self.width, self.heads, act=self.act,
                                 dtype=self.dtype, name=f"block_{i}")(
                x, mask=mask)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="ln_final")(x[:, -1])
        latent = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                          name="text_projection")(pooled)
        return latent, x[:, :-1]


class CoCaVisionTower(nn.Module):
    """open_clip VisionTransformer with attentional pooling
    (transformer.py:395-433,502-546): ln_pre trunk, 256-query attentional
    pool, ln_post; pooled = query 0 -> proj (image latent), queries 1..n-1
    are the decoder's cross-attention memory."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    n_queries: int = 256
    attn_pooler_heads: int = 8
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B, H, W, C = images.shape
        x01 = (images + 1.0) / 2.0
        if C == 1:
            x01 = jnp.repeat(x01, 3, axis=-1)
        mean = jnp.asarray(OPENAI_MEAN, x01.dtype)
        std = jnp.asarray(OPENAI_STD, x01.dtype)
        x = (x01 - mean) / std

        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=True,
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(B, -1, self.width)
        cls = self.param("class_token", nn.initializers.normal(0.02),
                         (1, 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)).astype(x.dtype), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(self.layers):
            x = TransformerBlock(self.width, self.heads, act=self.act,
                                 dtype=self.dtype, name=f"block_{i}")(x)
        x = AttentionalPooler(self.embed_dim, self.width,
                              n_head=self.attn_pooler_heads,
                              n_queries=self.n_queries, dtype=self.dtype,
                              name="attn_pool")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        latent = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                          name="proj")(pooled)
        return latent, tokens


class CoCa(nn.Module):
    """Contrastive captioner (coca_model.py:79-176). ``__call__`` mirrors the
    reference forward's return dict; the towers are reachable via
    ``apply(..., method=...)`` for encode-only calls."""

    embed_dim: int = 512
    vocab_size: int = 49408
    context_length: int = 76
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    mm_width: int = 512
    mm_heads: int = 8
    mm_layers: int = 12
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    n_queries: int = 256
    pad_id: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = CoCaVisionTower(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.vision_width, layers=self.vision_layers,
            heads=self.vision_heads, embed_dim=self.embed_dim,
            n_queries=self.n_queries, dtype=self.dtype)
        self.text = CoCaTextTower(
            vocab_size=self.vocab_size, context_length=self.context_length,
            width=self.text_width, heads=self.text_heads,
            layers=self.text_layers, embed_dim=self.embed_dim,
            pad_id=self.pad_id, dtype=self.dtype)
        self.text_decoder = MultimodalDecoder(
            width=self.mm_width, heads=self.mm_heads, layers=self.mm_layers,
            vocab_size=self.vocab_size, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda _: jnp.asarray(np.log(1.0 / 0.07),
                                                 jnp.float32))

    def _normalize(self, x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-8)

    def encode_image(self, images, normalize: bool = True):
        latent, embs = self.visual(images)
        return (self._normalize(latent) if normalize else latent), embs

    def encode_text(self, ids, normalize: bool = True):
        latent, tokens = self.text(ids)
        return (self._normalize(latent) if normalize else latent), tokens

    def decode(self, image_embs, ids):
        """Token logits [B, L, vocab] for ``ids`` given pooled image tokens."""
        _, token_embs = self.text(ids)
        return self.text_decoder(image_embs, token_embs)

    def __call__(self, images, ids: Optional[jnp.ndarray] = None,
                 image_latent=None, image_embs=None):
        if image_latent is None or image_embs is None:
            image_latent, image_embs = self.encode_image(images)
        if ids is None:
            return {"image_features": image_latent, "image_embs": image_embs}
        text_latent, token_embs = self.encode_text(ids)
        logits = self.text_decoder(image_embs, token_embs)
        return {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "labels": ids[:, -token_embs.shape[1]:],
            "logit_scale": jnp.exp(self.logit_scale),
        }


def build_coca(tiny: bool = False, dtype=jnp.float32, **kwargs) -> CoCa:
    """Factory; ``tiny`` shrinks every tower for tests/CPU."""
    if tiny:
        kwargs = dict(
            embed_dim=16, vocab_size=64, context_length=12, text_width=16,
            text_heads=2, text_layers=2, mm_width=16, mm_heads=2, mm_layers=2,
            image_size=16, patch_size=8, vision_width=16, vision_layers=2,
            vision_heads=2, n_queries=5, **kwargs)
    return CoCa(dtype=dtype, **kwargs)


# ---------------------------------------------------------------------------
# generation (fixed-shape, jittable)
# ---------------------------------------------------------------------------

SOT_ID = 49406  # reference defaults (coca_model.py:204-205)
EOS_ID = 49407


def _process_logits(logits, out, cur_len, eos_id, min_seq_len,
                    repetition_penalty, vocab_size):
    """MinLength + RepetitionPenalty logits processors
    (coca_model.py:207-212; HF semantics: divide positive scores / multiply
    negative scores of already-generated tokens by the penalty)."""
    if repetition_penalty != 1.0:
        L = out.shape[1]
        seen = jnp.zeros((out.shape[0], vocab_size), bool)
        valid = jnp.arange(L)[None] < cur_len
        seen = seen.at[jnp.arange(out.shape[0])[:, None], out].max(
            jnp.broadcast_to(valid, out.shape))
        pen = jnp.where(logits > 0, logits / repetition_penalty,
                        logits * repetition_penalty)
        logits = jnp.where(seen, pen, logits)
    logits = jnp.where(
        (cur_len < min_seq_len)
        & (jnp.arange(vocab_size)[None] == eos_id), NEG_INF, logits)
    return logits


def _warp_logits(logits, generation_type, top_k, top_p):
    """TopK / TopP logits warpers (coca_model.py:242-247)."""
    if generation_type == "top_k":
        kth = jnp.sort(logits, axis=-1)[:, -max(int(top_k), 1)][:, None]
        return jnp.where(logits < kth, NEG_INF, logits)
    if generation_type == "top_p":
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds 1 - top_p... HF keeps the
        # smallest set with cum > (1 - remove); reference passes top_p as the
        # kept quantile (docstring coca_model.py:186)
        cutoff_mask = cum - probs > top_p
        thresh = jnp.where(cutoff_mask, NEG_INF, sorted_logits).min(
            axis=-1, keepdims=True)
        return jnp.where(logits < thresh, NEG_INF, logits)
    raise ValueError(f"generation_type {generation_type!r} not in "
                     "{'top_k','top_p','beam_search'}")


def generate(model: CoCa, params, images, key, seq_len: int = 30,
             generation_type: str = "top_k", top_k: int = 1,
             top_p: float = 0.1, temperature: float = 1.0,
             min_seq_len: int = 5, repetition_penalty: float = 1.0,
             sot_token_id: int = SOT_ID, eos_token_id: int = EOS_ID,
             pad_token_id: Optional[int] = None, num_beams: int = 6,
             num_beam_groups: int = 3):
    """Caption ``images`` -> token ids [B, seq_len].

    Functional analogue of ``CoCa.generate`` (coca_model.py:178-299) as a
    fixed-shape ``lax.scan``: always returns ``seq_len`` tokens (the
    reference's ``fixed_output_length=True`` contract), padding after EOS.
    The last position is forced to EOS exactly like the reference
    (:284-287). ``beam_search`` dispatches to `generate_beamsearch`."""
    if generation_type == "beam_search":
        return generate_beamsearch(
            model, params, images, seq_len=seq_len, num_beams=num_beams,
            num_beam_groups=num_beam_groups, min_seq_len=min_seq_len,
            sot_token_id=sot_token_id, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id, repetition_penalty=repetition_penalty)
    pad_id = model.pad_id if pad_token_id is None else pad_token_id
    B = images.shape[0]
    _, image_embs = model.apply(params, images, method=CoCa.encode_image)

    out0 = jnp.full((B, seq_len), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(sot_token_id)

    def step(carry, i):
        out, finished, k = carry
        logits = model.apply(params, image_embs, out,
                             method=CoCa.decode)
        logits = jax.lax.dynamic_index_in_dim(
            logits, i - 1, axis=1, keepdims=False).astype(jnp.float32)
        logits = _process_logits(logits, out, i, eos_token_id, min_seq_len,
                                 repetition_penalty, model.vocab_size)
        logits = _warp_logits(logits, generation_type, top_k, top_p)
        k, sub = jax.random.split(k)
        sample = jax.random.categorical(sub, logits / temperature, axis=-1)
        sample = jnp.where(i == seq_len - 1, eos_token_id, sample)
        sample = jnp.where(finished, pad_id, sample).astype(jnp.int32)
        out = jax.lax.dynamic_update_index_in_dim(
            out, sample, i, axis=1)
        # a sampled PAD also terminates the row (reference :272 masks on
        # eos OR pad)
        finished = finished | (sample == eos_token_id) | (sample == pad_id)
        return (out, finished, k), None

    (out, _, _), _ = jax.lax.scan(
        step, (out0, jnp.zeros((B,), bool), key),
        jnp.arange(1, seq_len))
    return out


def generate_beamsearch(model: CoCa, params, images, seq_len: int = 30,
                        num_beams: int = 6, num_beam_groups: int = 3,
                        min_seq_len: int = 5,
                        sot_token_id: int = SOT_ID,
                        eos_token_id: int = EOS_ID,
                        pad_token_id: Optional[int] = None,
                        repetition_penalty: float = 1.0):
    """Fixed-length beam search (coca_model.py:301-448).

    The reference drives HF's grouped ``BeamSearchScorer``; with its default
    ``diversity_penalty=0`` the groups are independent searches, so each
    group runs its own ``num_beams // num_beam_groups``-beam scan and the
    best beam across groups wins. Finished beams continue with PAD at no
    score change; length-normalised scores (HF ``length_penalty=1``)."""
    assert num_beams % num_beam_groups == 0
    pad_id = model.pad_id if pad_token_id is None else pad_token_id
    G, Bm = num_beam_groups, num_beams // num_beam_groups
    B = images.shape[0]
    _, image_embs = model.apply(params, images, method=CoCa.encode_image)
    M, D = image_embs.shape[1], image_embs.shape[2]

    # [B*G*Bm, ...] flattened beams; all groups identical init (penalty 0
    # diversity comes only from sampling none — groups differ by their beam
    # init: beam 0 scores 0, others -inf, identical across groups, so groups
    # converge; kept for contract shape, documented).
    embs = jnp.broadcast_to(image_embs[:, None],
                            (B, G * Bm, M, D)).reshape(B * G * Bm, M, D)
    out0 = jnp.full((B * G * Bm, seq_len), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(sot_token_id)
    scores0 = jnp.tile(
        jnp.where(jnp.arange(Bm) == 0, 0.0, NEG_INF)[None].repeat(G, 0)
        .reshape(G * Bm), (B,)).reshape(B, G, Bm)

    def step(carry, i):
        out, scores, finished, length = carry
        logits = model.apply(params, embs, out, method=CoCa.decode)
        logits = jax.lax.dynamic_index_in_dim(
            logits, i - 1, axis=1, keepdims=False).astype(jnp.float32)
        logits = _process_logits(logits, out, i, eos_token_id, min_seq_len,
                                 repetition_penalty, model.vocab_size)
        logp = jax.nn.log_softmax(logits, axis=-1)
        V = logp.shape[-1]
        # finished beams: only PAD continues, score unchanged
        pad_only = jnp.where(jnp.arange(V)[None] == pad_id, 0.0, NEG_INF)
        logp = jnp.where(finished[:, None], pad_only, logp)
        logp = logp.reshape(B, G, Bm, V)
        cand = scores[..., None] + logp  # [B, G, Bm, V]
        top_v, top_i = jax.lax.top_k(cand.reshape(B, G, Bm * V), Bm)
        beam_idx, tok = top_i // V, (top_i % V).astype(jnp.int32)
        # gather parent beams
        flat_parent = (jnp.arange(B)[:, None, None] * (G * Bm)
                       + jnp.arange(G)[None, :, None] * Bm
                       + beam_idx).reshape(-1)
        out = out[flat_parent]
        finished = finished[flat_parent]
        length = length[flat_parent]
        tokf = tok.reshape(-1)
        tokf = jnp.where(i == seq_len - 1,
                         jnp.where(finished, pad_id, eos_token_id), tokf)
        tokf = jnp.where(finished, pad_id, tokf)
        out = jax.lax.dynamic_update_index_in_dim(out, tokf, i, axis=1)
        now_finished = finished | (tokf == eos_token_id)
        # hypothesis length at first EOS = i+1 tokens (HF BeamHypotheses.add
        # normalises by the full sequence length incl. SOT and EOS)
        length = jnp.where(now_finished & ~finished, i + 1, length)
        return (out, top_v, now_finished, length), None

    (out, scores, _, length), _ = jax.lax.scan(
        step, (out0, scores0, jnp.zeros((B * G * Bm,), bool),
               jnp.full((B * G * Bm,), seq_len, jnp.int32)),
        jnp.arange(1, seq_len))
    # best beam over groups x beams per batch element, by the HF
    # length_penalty=1 normalised score (raw sums would systematically
    # prefer early-EOS beams)
    norm = scores.reshape(B, G * Bm) / length.reshape(B, G * Bm)
    best = jnp.argmax(norm, axis=-1)
    return out.reshape(B, G * Bm, seq_len)[jnp.arange(B), best]


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def _to_np(t):
    if hasattr(t, "detach"):
        return jnp.asarray(t.detach().cpu().float().numpy())
    return jnp.asarray(np.asarray(t, dtype=np.float32))


def _map_resblock(sd, prefix, blk, cross: bool = False):
    """torch ResidualAttentionBlock state -> flax TransformerBlock/
    CrossAttentionBlock subtree (same layout as the CLIP text converter)."""
    if prefix + "attn.in_proj_weight" in sd:
        w = _to_np(sd[prefix + "attn.in_proj_weight"])
        b = _to_np(sd[prefix + "attn.in_proj_bias"])
        C = w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            blk[name]["kernel"] = w[j * C:(j + 1) * C].T
            blk[name]["bias"] = b[j * C:(j + 1) * C]
    for t_name, f_name in (("attn.out_proj", "out_proj"),
                           ("mlp.c_fc", "fc"), ("mlp.c_proj", "proj")):
        if prefix + t_name + ".weight" in sd:
            blk[f_name]["kernel"] = _to_np(sd[prefix + t_name + ".weight"]).T
            blk[f_name]["bias"] = _to_np(sd[prefix + t_name + ".bias"])
    lns = ("ln_1", "ln_1_kv", "ln_2") if cross else ("ln_1", "ln_2")
    for ln in lns:
        if prefix + ln + ".weight" in sd:
            blk[ln]["scale"] = _to_np(sd[prefix + ln + ".weight"])
            blk[ln]["bias"] = _to_np(sd[prefix + ln + ".bias"])


def _map_attn_pool(sd, prefix, sub):
    """torch AttentionalPooler -> flax. nn.MultiheadAttention with
    kdim != embed_dim stores separate q/k/v projection weights."""
    if prefix + "query" in sd:
        sub["query"] = _to_np(sd[prefix + "query"])
    for ln in ("ln_q", "ln_k"):
        if prefix + ln + ".weight" in sd:
            sub[ln]["scale"] = _to_np(sd[prefix + ln + ".weight"])
            sub[ln]["bias"] = _to_np(sd[prefix + ln + ".bias"])
    A = prefix + "attn."
    if A + "q_proj_weight" in sd:  # kdim != embed_dim layout
        wq, wk, wv = (_to_np(sd[A + n]) for n in
                      ("q_proj_weight", "k_proj_weight", "v_proj_weight"))
        E = wq.shape[0]
        b = (_to_np(sd[A + "in_proj_bias"]) if A + "in_proj_bias" in sd
             else jnp.zeros(3 * E))
        for (w, bb, name) in ((wq, b[:E], "q_proj"), (wk, b[E:2 * E], "k_proj"),
                              (wv, b[2 * E:], "v_proj")):
            sub[name]["kernel"] = w.T
            sub[name]["bias"] = bb
    elif A + "in_proj_weight" in sd:  # uniform-dim layout
        w = _to_np(sd[A + "in_proj_weight"])
        b = _to_np(sd[A + "in_proj_bias"])
        E = w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sub[name]["kernel"] = w[j * E:(j + 1) * E].T
            sub[name]["bias"] = b[j * E:(j + 1) * E]
    if A + "out_proj.weight" in sd:
        sub["out_proj"]["kernel"] = _to_np(sd[A + "out_proj.weight"]).T
        sub["out_proj"]["bias"] = _to_np(sd[A + "out_proj.bias"])


def load_torch_coca_weights(params, checkpoint_path_or_sd):
    """Convert an open_clip CoCa checkpoint (coca_ViT-B-32 family,
    pretrained.py:279-286) onto the `CoCa` flax tree. Accepts a path or an
    in-memory state dict; returns the updated tree."""
    import os

    if isinstance(checkpoint_path_or_sd, (str, os.PathLike)):
        if not os.path.isfile(checkpoint_path_or_sd):
            raise FileNotFoundError(checkpoint_path_or_sd)
        import torch

        sd = torch.load(checkpoint_path_or_sd, map_location="cpu")
        sd = sd.get("state_dict", sd)
    else:
        sd = checkpoint_path_or_sd
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    new = jax.tree.map(lambda x: x, params)
    inner = new["params"]

    vis = inner["visual"]
    if "visual.conv1.weight" in sd:
        vis["patch_embed"]["kernel"] = _to_np(
            sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)
        if "visual.conv1.bias" in sd:
            vis["patch_embed"]["bias"] = _to_np(sd["visual.conv1.bias"])
        else:
            vis["patch_embed"]["bias"] = jnp.zeros_like(
                vis["patch_embed"]["bias"])
    if "visual.class_embedding" in sd:
        vis["class_token"] = _to_np(
            sd["visual.class_embedding"]).reshape(1, 1, -1)
    if "visual.positional_embedding" in sd:
        vis["pos_embed"] = _to_np(sd["visual.positional_embedding"])
    for t_ln, f_ln in (("ln_pre", "ln_pre"), ("ln_post", "ln_post")):
        if f"visual.{t_ln}.weight" in sd:
            vis[f_ln]["scale"] = _to_np(sd[f"visual.{t_ln}.weight"])
            vis[f_ln]["bias"] = _to_np(sd[f"visual.{t_ln}.bias"])
    if "visual.proj" in sd:
        vis["proj"]["kernel"] = _to_np(sd["visual.proj"])
    i = 0
    while f"block_{i}" in vis:
        _map_resblock(sd, f"visual.transformer.resblocks.{i}.",
                      vis[f"block_{i}"])
        i += 1
    _map_attn_pool(sd, "visual.attn_pool.", vis["attn_pool"])

    txt = inner["text"]
    if "text.token_embedding.weight" in sd:
        txt["token_embedding"]["embedding"] = _to_np(
            sd["text.token_embedding.weight"])
    if "text.cls_emb" in sd:
        txt["cls_emb"] = _to_np(sd["text.cls_emb"])
    if "text.positional_embedding" in sd:
        txt["positional_embedding"] = _to_np(sd["text.positional_embedding"])
    if "text.ln_final.weight" in sd:
        txt["ln_final"]["scale"] = _to_np(sd["text.ln_final.weight"])
        txt["ln_final"]["bias"] = _to_np(sd["text.ln_final.bias"])
    if "text.text_projection" in sd:
        txt["text_projection"]["kernel"] = _to_np(sd["text.text_projection"])
    i = 0
    while f"block_{i}" in txt:
        _map_resblock(sd, f"text.transformer.resblocks.{i}.",
                      txt[f"block_{i}"])
        i += 1

    dec = inner["text_decoder"]
    if "text_decoder.ln_final.weight" in sd:
        dec["ln_final"]["scale"] = _to_np(sd["text_decoder.ln_final.weight"])
        dec["ln_final"]["bias"] = _to_np(sd["text_decoder.ln_final.bias"])
    if "text_decoder.text_projection" in sd:
        dec["text_projection"]["kernel"] = _to_np(
            sd["text_decoder.text_projection"])
    i = 0
    while f"block_{i}" in dec:
        _map_resblock(sd, f"text_decoder.resblocks.{i}.", dec[f"block_{i}"])
        _map_resblock(sd, f"text_decoder.cross_attn.{i}.", dec[f"cross_{i}"],
                      cross=True)
        i += 1

    if "logit_scale" in sd:
        inner["logit_scale"] = _to_np(sd["logit_scale"]).reshape(())
    return new
