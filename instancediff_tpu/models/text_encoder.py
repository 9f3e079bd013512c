"""Frozen text towers with learnable-context splicing.

TPU-native equivalents of the reference conditioning encoders
(_modified_BiomedCLIP.py):
  * ``CLIPTextContextEncoder`` (:798-883): CLIP text transformer (width 512,
    12 layers, 8 heads, context_length 42) that splices learnable context
    tokens after <SOT>, runs causally masked self-attention, and projects the
    <EOT> token state to the 512-d embedding.
  * ``HFContextTextEncoder`` (:885-1015): PubMedBERT-base tower (hidden 768,
    12 layers) splicing context after [CLS] (token_embedding, :951-958), with
    an attention mask over [CLS]+context+text (:960-991), CLS pooling and an
    MLP projection 768->512 (:934-940).

Both towers are *frozen*: their parameters are initialised once (optionally
from converted open_clip/HF checkpoints via ``load_*_weights``) and held
outside the optimizer. Only the per-ScoreMapModule context tokens receive
gradients, flowing through these towers.

Design delta vs the reference: the towers are pure flax modules taking
pre-tokenised int32 ids, so the 5 fixed prompts are tokenised once on the
host and the tower runs inside (training) or *outside* (sampling — hoisted
from the scan) the jitted step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import drop_path, multi_head_attention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (ResidualAttentionBlock analogue,
    _modified_BiomedCLIP.py:371-433).

    ``drop_path_rate`` is the reference's per-block stochastic depth
    (DropPath :328-340, linear decay handled by the caller per the Transformer
    decay rule :424); active only with ``deterministic=False`` and a
    ``drop_path`` rng. ``qkv_clamp`` mirrors the Attention_flash fp16
    overflow clamp (:509-513). ``ls_init`` enables per-branch LayerScale
    gammas (vendored transformer.py:39-47 ``LayerScale``; wired as
    ``ls_init_value`` into ResidualAttentionBlock :203,214 — branch order is
    ``x + drop_path(ls(branch(ln(x))))``). All default off — the reference's
    shipped settings."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    act: str = "quick_gelu"
    # torch nn.LayerNorm default (OpenAI CLIP); timm ViT towers pass 1e-6
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    drop_path_rate: float = 0.0
    qkv_clamp: Optional[float] = None
    ls_init: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        if self.act == "quick_gelu":
            act = quick_gelu
        else:  # timm/HF towers use the EXACT erf GELU (torch nn.GELU default)
            act = lambda h: jax.nn.gelu(h, approximate=False)  # noqa: E731

        def branch(h, ls_name):
            if self.ls_init is not None:
                gamma = self.param(ls_name, nn.initializers.constant(self.ls_init),
                                   (self.width,))
                h = h * gamma.astype(h.dtype)
            if self.drop_path_rate > 0.0 and not deterministic:
                return drop_path(self.make_rng("drop_path"), h,
                                 self.drop_path_rate)
            return h

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="ln_1")(x)
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(h)
        attn = multi_head_attention(q, k, v, self.heads, mask=mask,
                                    qkv_clamp=self.qkv_clamp)
        x = x + branch(nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn),
                       "ls_1")
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype, name="fc")(h)
        h = act(h)
        x = x + branch(nn.Dense(self.width, dtype=self.dtype, name="proj")(h), "ls_2")
        return x


class CLIPTextContextEncoder(nn.Module):
    """CLIP text tower with context splicing (reference :798-883).

    ``__call__(ids [K, L], context [n_ctx, width] | None) -> [K, embed_dim]``
    The spliced sequence is [SOT, context..., tokens...] truncated back to L;
    the EOT pooling index shifts by n_ctx accordingly (:881)."""

    context_length: int = 42
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, context: Optional[jnp.ndarray] = None):
        K, L = ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")(ids)
        if context is not None:
            n_ctx = context.shape[0]
            ctx = jnp.broadcast_to(context[None], (K, n_ctx, self.width)).astype(tok.dtype)
            x = jnp.concatenate([tok[:, :1], ctx, tok[:, 1 : L - n_ctx]], axis=1)
            eos_pos = jnp.minimum(jnp.argmax(ids, axis=-1) + n_ctx, L - 1)
        else:
            x = tok
            eos_pos = jnp.argmax(ids, axis=-1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)

        # causal mask (reference :849-855)
        causal = jnp.where(
            jnp.tril(jnp.ones((L, L), dtype=bool)), 0.0, -jnp.inf
        )[None]
        for i in range(self.layers):
            x = TransformerBlock(
                self.width, self.heads, act="quick_gelu", dtype=self.dtype, name=f"block_{i}"
            )(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        pooled = x[jnp.arange(K), eos_pos]  # EOT-position pooling (:881)
        out = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="text_projection")(
            pooled
        )
        return out


def exact_gelu(x):
    """erf-based GELU (HF BERT 'gelu' / torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


class PostLNBertLayer(nn.Module):
    """Post-LN BERT encoder layer — standard HF BertLayer semantics, which is
    what the reference's ``modified_BertModel`` runs (its forward delegates to
    the stock BertEncoder; the modified-embeddings override is commented out,
    _modified_BiomedCLIP.py:1077-1080):

      x = LayerNorm(x + out_proj(attn(x)))     # attention.output.LayerNorm
      x = LayerNorm(x + proj(gelu(fc(x))))     # output.LayerNorm

    eps=1e-12 (HF BertConfig default; roberta-family configs default to
    1e-5 — set ``ln_eps``), exact erf GELU, fp32 softmax."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)
        attn = multi_head_attention(q, k, v, self.heads, mask=mask)
        h = nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="attn_ln")(x + h)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype, name="fc")(x)
        h = exact_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="proj")(h)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="ffn_ln")(x + h)
        return x


def mean_pooler(hidden, mask):
    """Masked mean pooling (hf_model.py MeanPooler, :45-51)."""
    m = mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(axis=1) / m.sum(axis=1).clip(1e-8)


def max_pooler(hidden, mask):
    """Masked max pooling (hf_model.py MaxPooler, :54-60). The vendored copy
    fills the *valid* positions with -inf (``masked_fill(attention_mask...)``
    without the upstream ``== 0``) — an upstream open_clip regression never
    exercised (BiomedCLIP uses CLS pooling); this implements the intended
    semantics of masking the padding."""
    return jnp.where(mask[..., None] > 0, hidden, -jnp.inf).max(axis=1)


def cls_pooler(hidden, mask):
    """[CLS]-position pooling (hf_model.py ClsPooler/
    ClsLastHiddenStatePooler, :63-93; equivalent with
    use_pooler_output=False)."""
    del mask
    return hidden[:, 0]


# snake-cased registry mirroring open_clip's ``_POOLERS`` (hf_model.py:34-42)
POOLERS = {
    "mean_pooler": mean_pooler,
    "max_pooler": max_pooler,
    "cls_pooler": cls_pooler,
    "cls_last_hidden_state_pooler": cls_pooler,
}


class HFContextTextEncoder(nn.Module):
    """PubMedBERT text tower with context splicing (reference :885-1015).

    ``__call__(ids [K, L], attn_mask [K, L], context [n_ctx, hidden] | None)
    -> [K, proj_dim]``. Post-LN BERT encoder (``modified_BertModel`` is stock
    HF BertModel — see PostLNBertLayer). Context embeddings are inserted after
    [CLS], *extending* the sequence to L+n_ctx (token_embedding, :951-958 —
    no truncation, unlike the CLIP tower); the attention mask is
    [mask[CLS], ones(n_ctx), mask[text 1:]] (:968-971); pooling takes the
    [CLS] last hidden state (ClsLastHiddenStatePooler) and projects 768 -> 512
    through a bias-free GELU MLP (:934-940)."""

    context_length: int = 256
    vocab_size: int = 30522
    hidden: int = 768
    heads: int = 12
    layers: int = 12
    proj_dim: int = 512
    max_position: int = 512
    pooler_type: str = "cls_last_hidden_state_pooler"  # POOLERS key
    # Roberta-family embeddings offset positions by padding_idx+1 (HF
    # create_position_ids_from_input_ids): valid token i reads pos row
    # i + position_offset (2 for roberta/xlm-roberta; see hf_configs.py).
    # Exact for unpadded/right-padded input — pad rows are attention-masked
    # and pooler-masked, so their (clamped) position rows never contribute.
    position_offset: int = 0
    ln_eps: float = 1e-12  # 1e-5 for roberta-family configs
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, attn_mask=None, context: Optional[jnp.ndarray] = None):
        K, L = ids.shape
        if attn_mask is None:
            attn_mask = jnp.ones((K, L), dtype=jnp.int32)
        tok = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype, name="word_embeddings")(ids)
        if context is not None:
            n_ctx = context.shape[0]
            ctx = jnp.broadcast_to(context[None], (K, n_ctx, self.hidden)).astype(tok.dtype)
            # reference extends to L+n_ctx: [CLS, context..., text...] (:957)
            x = jnp.concatenate([tok[:, :1], ctx, tok[:, 1:]], axis=1)
            mask = jnp.concatenate(
                [
                    attn_mask[:, :1],
                    jnp.ones((K, n_ctx), attn_mask.dtype),
                    attn_mask[:, 1:],
                ],
                axis=1,
            )
        else:
            x, mask = tok, attn_mask
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.max_position, self.hidden),
        )
        ttype = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02), (2, self.hidden)
        )
        off = min(self.position_offset, self.max_position - x.shape[1])
        x = (x + pos[None, off: off + x.shape[1]].astype(x.dtype)
             + ttype[0][None, None].astype(x.dtype))
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="embeddings_ln")(x)

        # additive mask: [K, 1(q), L(k)] broadcast over heads
        add_mask = jnp.where(mask[:, None, :] > 0, 0.0, -jnp.inf)
        for i in range(self.layers):
            x = PostLNBertLayer(
                self.hidden, self.heads, ln_eps=self.ln_eps,
                dtype=self.dtype, name=f"layer_{i}"
            )(x, mask=add_mask)
        cls = POOLERS[self.pooler_type](x, mask)  # default: CLS last hidden
        # state (:934-940); mean/max variants via pooler_type
        h = nn.Dense((self.hidden + self.proj_dim) // 2, use_bias=False,
                     dtype=self.dtype, name="proj_fc1")(cls)
        h = exact_gelu(h)
        out = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype, name="proj_fc2")(h)
        return out


def build_text_encoder(clip_type: str, embed_dim: int = 512, dtype=jnp.float32,
                       tiny: bool = False):
    """Factory mirroring the CLIP_Type switch at drift_noise_model.py:71-90.
    Returns (module, token_embed_dim, tokenizer_kind). ``embed_dim`` is the
    projected text-embedding size (== the UNet ``context_dim``); ``tiny``
    shrinks the tower for tests."""
    if clip_type == "BiomedCLIP":
        if tiny:
            mod = HFContextTextEncoder(hidden=48, heads=4, layers=2, proj_dim=embed_dim,
                                       vocab_size=512, context_length=32, max_position=64,
                                       dtype=dtype)
            return mod, 48, "bert"
        return HFContextTextEncoder(proj_dim=embed_dim, dtype=dtype), 768, "bert"
    if tiny:
        mod = CLIPTextContextEncoder(width=48, heads=4, layers=2, embed_dim=embed_dim,
                                     vocab_size=512, context_length=16, dtype=dtype)
        return mod, 48, "clip"
    return CLIPTextContextEncoder(embed_dim=embed_dim, dtype=dtype), 512, "clip"


def load_torch_bert_weights(params, checkpoint_path_or_sd, prefix="text."):
    """Convert a torch BiomedCLIP/HF BERT state dict into the
    HFContextTextEncoder param tree (the reference loads ``text.*`` keys from
    ``open_clip_pytorch_model.bin`` via init_weights,
    _modified_BiomedCLIP.py:942-948; weights unreleased upstream — this hook
    activates when the asset exists). Accepts a path or an in-memory state
    dict (for tests). Returns the updated param tree."""
    import os

    if isinstance(checkpoint_path_or_sd, (str, os.PathLike)):
        if not os.path.isfile(checkpoint_path_or_sd):
            raise FileNotFoundError(checkpoint_path_or_sd)
        import torch

        sd = torch.load(checkpoint_path_or_sd, map_location="cpu")
    else:
        sd = checkpoint_path_or_sd

    def to_np(t):
        import numpy as _np

        if hasattr(t, "detach"):
            return jnp.asarray(t.detach().cpu().float().numpy())
        return jnp.asarray(_np.asarray(t, dtype=_np.float32))

    new = jax.tree.map(lambda x: x, params)
    inner = new["params"]
    P = prefix + "transformer."  # open_clip HFTextEncoder namespace

    def get(*names):
        for n in names:
            if n in sd:
                return sd[n]
        return None

    emb = get(P + "embeddings.word_embeddings.weight")
    if emb is not None:
        inner["word_embeddings"]["embedding"] = to_np(emb)
    pos = get(P + "embeddings.position_embeddings.weight")
    if pos is not None:
        pos = to_np(pos)
        want = inner["position_embeddings"].shape[0]
        if pos.shape[0] != want:
            # cross-max_position load: same 1D linear resample as the CLIP
            # text table (resize_text_pos_embed analogue, model.py:541-570)
            from .pos_embed import resize_text_pos_embed

            pos = resize_text_pos_embed(pos, want)
        inner["position_embeddings"] = pos
    tt = get(P + "embeddings.token_type_embeddings.weight")
    if tt is not None:
        tt = to_np(tt)
        want = inner["token_type_embeddings"].shape[0]
        if tt.shape[0] < want:  # roberta ships a single type row
            tt = jnp.concatenate(
                [tt, jnp.zeros((want - tt.shape[0], tt.shape[1]), tt.dtype)])
        inner["token_type_embeddings"] = tt
    ln = get(P + "embeddings.LayerNorm.weight")
    if ln is not None:
        inner["embeddings_ln"]["scale"] = to_np(ln)
        inner["embeddings_ln"]["bias"] = to_np(sd[P + "embeddings.LayerNorm.bias"])

    i = 0
    while f"layer_{i}" in inner:
        L = P + f"encoder.layer.{i}."
        blk = inner[f"layer_{i}"]
        for hf, ours in (("attention.self.query", "q_proj"),
                         ("attention.self.key", "k_proj"),
                         ("attention.self.value", "v_proj"),
                         ("attention.output.dense", "out_proj"),
                         ("intermediate.dense", "fc"),
                         ("output.dense", "proj")):
            w = get(L + hf + ".weight")
            if w is not None:
                blk[ours]["kernel"] = to_np(w).T
                blk[ours]["bias"] = to_np(sd[L + hf + ".bias"])
        # exact post-LN mapping: PostLNBertLayer mirrors HF BertLayer
        for hf, ours in (("attention.output.LayerNorm", "attn_ln"),
                         ("output.LayerNorm", "ffn_ln")):
            w = get(L + hf + ".weight")
            if w is not None:
                blk[ours]["scale"] = to_np(w)
                blk[ours]["bias"] = to_np(sd[L + hf + ".bias"])
        i += 1

    # projection head (open_clip 'proj' mlp: text.proj.0 / text.proj.2,
    # bias-free Linears — _modified_BiomedCLIP.py:936-940)
    w = get(prefix + "proj.0.weight")
    if w is not None:
        inner["proj_fc1"]["kernel"] = to_np(w).T
    w = get(prefix + "proj.2.weight")
    if w is not None:
        inner["proj_fc2"]["kernel"] = to_np(w).T
    return new


def load_torch_clip_text_weights(params, checkpoint_path_or_sd,
                                 pos_embed_mode="auto"):
    """Convert an OpenAI/open_clip CLIP checkpoint's text tower into the
    CLIPTextContextEncoder param tree.

    The reference initialises its CLIP text encoder from ``ViT-B-32.pt`` via
    ``CLIPTextContextEncoder.init_weights`` (_modified_BiomedCLIP.py:828-847):
    it ``torch.jit.load``s the archive, keeps ``transformer.*``,
    ``token_embedding*``, ``positional_embedding`` (truncated from 77 to
    context_length), ``ln_final*`` and ``text_projection``, and loads them
    non-strictly. This converter performs the same selection/truncation onto
    the flax tree. Accepts a path (torch.jit archive or plain state dict) or
    an in-memory dict (for tests). Returns the updated tree.

    ``pos_embed_mode`` handles a checkpoint whose context_length differs
    from the model's:
      * ``"auto"`` (default): truncate when the checkpoint is longer (the
        active path's :841-843 semantics), linear-resample when shorter
        (truncation cannot apply);
      * ``"interpolate"``: always linear-resample — the vendored loader's
        ``resize_text_pos_embed`` (reference model.py:541-570) exactly
        (1D ``F.interpolate(mode='linear', align_corners=False)``)."""
    import os

    if isinstance(checkpoint_path_or_sd, (str, os.PathLike)):
        if not os.path.isfile(checkpoint_path_or_sd):
            raise FileNotFoundError(checkpoint_path_or_sd)
        import torch

        try:  # ViT-B-32.pt ships as a torch.jit archive (reference :831)
            sd = torch.jit.load(checkpoint_path_or_sd, map_location="cpu").float().state_dict()
        except RuntimeError:
            sd = torch.load(checkpoint_path_or_sd, map_location="cpu")
            sd = sd.get("state_dict", sd)
    else:
        sd = checkpoint_path_or_sd

    def to_np(t):
        import numpy as _np

        if hasattr(t, "detach"):
            return jnp.asarray(t.detach().cpu().float().numpy())
        return jnp.asarray(_np.asarray(t, dtype=_np.float32))

    new = jax.tree.map(lambda x: x, params)
    inner = new["params"]

    if "token_embedding.weight" in sd:
        inner["token_embedding"]["embedding"] = to_np(sd["token_embedding.weight"])
    if "positional_embedding" in sd:
        from .pos_embed import resize_text_pos_embed

        pos = to_np(sd["positional_embedding"])
        L = inner["positional_embedding"].shape[0]
        if pos.shape[1] != inner["positional_embedding"].shape[1]:
            raise ValueError("text pos_embed width changed!")  # model.py:554
        if pos_embed_mode == "auto" and pos.shape[0] >= L:
            inner["positional_embedding"] = pos[:L]  # 77 -> ctx_len (:841-843)
        else:
            # cross-length load: linear-resample the table (the vendored
            # loader's resize_text_pos_embed, reference model.py:541-570;
            # no-op at equal lengths)
            inner["positional_embedding"] = resize_text_pos_embed(pos, L)
    if "ln_final.weight" in sd:
        inner["ln_final"]["scale"] = to_np(sd["ln_final.weight"])
        inner["ln_final"]["bias"] = to_np(sd["ln_final.bias"])
    if "text_projection" in sd:
        # reference pools then does ``x @ text_projection`` (:881) — identical
        # to a bias-free Dense, kernel taken as-is
        inner["text_projection"]["kernel"] = to_np(sd["text_projection"])

    i = 0
    while f"block_{i}" in inner:
        R = f"transformer.resblocks.{i}."
        blk = inner[f"block_{i}"]
        if R + "attn.in_proj_weight" in sd:
            w = to_np(sd[R + "attn.in_proj_weight"])  # [3C, C], rows q|k|v
            b = to_np(sd[R + "attn.in_proj_bias"])
            C = w.shape[1]
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                blk[name]["kernel"] = w[j * C:(j + 1) * C].T
                blk[name]["bias"] = b[j * C:(j + 1) * C]
        for t_name, f_name, transpose in (
            ("attn.out_proj", "out_proj", True),
            ("mlp.c_fc", "fc", True),
            ("mlp.c_proj", "proj", True),
        ):
            if R + t_name + ".weight" in sd:
                w = to_np(sd[R + t_name + ".weight"])
                blk[f_name]["kernel"] = w.T if transpose else w
                blk[f_name]["bias"] = to_np(sd[R + t_name + ".bias"])
        for t_name, f_name in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            if R + t_name + ".weight" in sd:
                blk[f_name]["scale"] = to_np(sd[R + t_name + ".weight"])
                blk[f_name]["bias"] = to_np(sd[R + t_name + ".bias"])
        i += 1
    return new
