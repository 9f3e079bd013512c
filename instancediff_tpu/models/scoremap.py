"""Score Map Module (SMM): text-conditioned per-scale score maps.

Reconstruction of the reference's missing ``ScoreMapModule`` (constructed at
drift_noise_model.py:104-139 with ``visual_dim = score_map_ngf *
score_map_ch_mult[i]`` and ``token_embed_dim`` set by the CLIP type; invoked
inside the UNet per SURVEY.md SS2.9b). Its building blocks survive upstream as
the ``ContextDecoder*`` family (_modified_BiomedCLIP.py:1194-1399) and
``TransformerDecoderLayer_scaled`` (:580-589, learned per-branch gamma scales
initialised to 0.1), which this module follows:

  1. learnable context tokens (the only trained text-side parameters;
     the frozen text tower is invoked *with* them by the owning model),
  2. a scaled cross-attention decoder: text-prompt queries attend to the
     scale's visual tokens (memory), refining the K=5 per-artifact-type
     embeddings with spatial evidence,
  3. a bilinear score head: per-class score maps from (visual embedding x
     refined text embedding) similarity, unbounded so they can regress the
     drift-residual / std-noise supervision targets
     (drift_noise_model.py:234-240, 277-281).

Layout is NHWC; all attention runs through ops.attention (XLA MXU path).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention


class ScaledDecoderLayer(nn.Module):
    """Cross-attention decoder layer with learned branch scales gamma init 0.1
    (after TransformerDecoderLayer_scaled, _modified_BiomedCLIP.py:580-589).

    Reconstruction note: this is the SMM's building block — upstream ships no
    SMM source, so this layer keeps only the branches the score-map decoder
    needs (cross-attn + MLP; a self-attn branch over the <=5 prompt queries
    adds nothing at K this small). The reference-EXACT three-branch layer
    (self-attn gamma_sa included, torch-golden-tested) is
    ``vision_towers.RefDecoderLayer`` / ``ContextDecoderRef``."""

    dim: int
    heads: int = 4
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, memory):
        g1 = self.param("gamma1", nn.initializers.constant(0.1), (self.dim,))
        g2 = self.param("gamma2", nn.initializers.constant(0.1), (self.dim,))
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_q")(q)
        m = nn.LayerNorm(dtype=jnp.float32, name="ln_m")(memory)
        qq = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(h)
        kk = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(m)
        vv = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(m)
        attn = multi_head_attention(qq, kk, vv, self.heads)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(attn)
        q = q + g1.astype(q.dtype) * attn
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_mlp")(q)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="proj")(h)
        return q + g2.astype(q.dtype) * h


class ScoreMapModule(nn.Module):
    """Per-scale SMM. ``__call__(vis [B,h,w,C], text_emb [K,E]) ->
    score_maps [B,h,w,K]`` — per-artifact-type maps; the owning UNet gathers
    the supervised channel by ``type_idx`` and fuses all K into decoder
    features."""

    visual_dim: int
    token_embed_dim: int = 512  # context-token space (512 CLIP / 768 BiomedCLIP)
    embed_dim: int = 512  # text-embedding space after tower projection
    n_ctx: int = 8
    decoder_layers: int = 3
    heads: int = 4
    # DenseCLIP-style pooled memory: the cross-attention decoder reads the
    # scale's features average-pooled to <= max_mem_hw^2 tokens. Without this
    # the K/V projections at full resolution (65k tokens x 512d x 3 layers)
    # dominate the whole model's FLOPs — measured 840 GFLOP/step at 256px.
    max_mem_hw: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # learnable context tokens, spliced into the frozen tower by the model
        self.context = self.param(
            "context", nn.initializers.normal(0.02), (self.n_ctx, self.token_embed_dim)
        )
        self.vis_in = nn.Dense(self.visual_dim, dtype=self.dtype, name="vis_in")
        self.mem_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="mem_proj")
        self.decoder = [
            ScaledDecoderLayer(self.embed_dim, self.heads, dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.decoder_layers)
        ]
        # score head: the bilinear form <W2 W1 vis_p, q_k> is computed by
        # projecting the K refined text queries DOWN into visual space
        # instead of lifting every pixel up to embed_dim — algebraically the
        # same family, but avoids materialising a [B, HW, embed_dim]
        # intermediate (1.1 GB at 256px/512d; profiled as the sampler's
        # dominant HBM traffic). LayerNorm moves to the (tiny) query side.
        self.q_ln = nn.LayerNorm(dtype=jnp.float32, name="q_ln")
        self.q_to_vis = nn.Dense(self.visual_dim, dtype=self.dtype, name="q_to_vis")
        self.scale = self.param(
            "logit_scale", nn.initializers.constant(self.visual_dim**-0.5), ()
        )
        self.bias = self.param("score_bias", nn.initializers.zeros, ())

    def get_context(self):
        return self.context

    def __call__(self, vis, text_emb, packed=False):
        """``packed=True``: ``vis`` is the width-packed [B,h,w/2,2C] view
        (ops/packed_l0.py) and the returned score maps are packed
        [B,h,w/2,2K] — all projections run block-diagonally so no relayout
        copies appear (the level-0 fast path; values identical)."""
        if packed:
            return self._packed_call(vis, text_emb)
        B, h, w, _ = vis.shape
        K = text_emb.shape[0]
        # pooled memory for the decoder (see max_mem_hw note above)
        if h > self.max_mem_hw or w > self.max_mem_hw:
            ph, pw = h // self.max_mem_hw, w // self.max_mem_hw
            pooled = nn.avg_pool(vis, (ph, pw), strides=(ph, pw))
        else:
            pooled = vis
        mh, mw = pooled.shape[1], pooled.shape[2]
        mem_tokens = self.vis_in(pooled.reshape(B, mh * mw, -1))
        memory = self.mem_proj(mem_tokens)  # [B, <=max_mem_hw^2, E]
        q = jnp.broadcast_to(text_emb[None], (B, K, self.embed_dim)).astype(vis.dtype)
        for layer in self.decoder:
            q = layer(q, memory)
        # full-resolution pixel features stay in visual space (see setup note)
        tokens = self.vis_in(vis.reshape(B, h * w, -1))  # [B, hw, V]
        q_vis = self.q_to_vis(self.q_ln(q).astype(vis.dtype))  # [B, K, V]
        score = (
            jnp.einsum("bpv,bkv->bpk", tokens, q_vis) * self.scale.astype(vis.dtype)
            + self.bias.astype(vis.dtype)
        )
        return score.reshape(B, h, w, K)

    def _packed_call(self, visp, text_emb):
        from ..ops.packed_l0 import packed_conv1x1

        B, h, wp, C2 = visp.shape
        C = C2 // 2
        K = text_emb.shape[0]
        w = 2 * wp
        # pooled memory: pool the packed view with half-width windows, then
        # average the two parity halves — exact for mean pooling
        if h > self.max_mem_hw or w > self.max_mem_hw:
            ph, pw = h // self.max_mem_hw, w // self.max_mem_hw
            assert pw % 2 == 0, (pw, "packed SMM needs even pool width")
            pooled2 = nn.avg_pool(visp, (ph, pw // 2), strides=(ph, pw // 2))
            pooled = 0.5 * (pooled2[..., :C] + pooled2[..., C:])
        else:
            # no pooling: the memory is the full token grid — unpack (small
            # tensor, <= max_mem_hw^2 tokens; exactness over packing here)
            pooled = visp.reshape(B, h, wp * 2, C)
        mh, mw = pooled.shape[1], pooled.shape[2]
        mem_tokens = self.vis_in(pooled.reshape(B, mh * mw, -1))
        memory = self.mem_proj(mem_tokens)
        q = jnp.broadcast_to(text_emb[None], (B, K, self.embed_dim)).astype(visp.dtype)
        for layer in self.decoder:
            q = layer(q, memory)
        # block-diagonal vis_in on the packed full-res features (prefer the
        # pre-packed matrix when prepack_params hoisted the transform)
        vis_vars = self.vis_in.variables["params"]
        w_in = vis_vars.get("kernel_packed", vis_vars["kernel"])
        b_in = vis_vars["bias"]
        tokens = packed_conv1x1(visp.astype(self.dtype),
                                w_in.astype(self.dtype),
                                b_in.astype(self.dtype),
                                segments=[C])  # [B,h,wp,2V]
        q_vis = self.q_to_vis(self.q_ln(q).astype(visp.dtype))  # [B, K, V]
        V = q_vis.shape[-1]
        q2 = jnp.zeros((B, 2 * K, 2 * V), q_vis.dtype)
        q2 = q2.at[:, :K, :V].set(q_vis).at[:, K:, V:].set(q_vis)
        score = (
            jnp.einsum("bhwv,bkv->bhwk", tokens, q2) * self.scale.astype(visp.dtype)
            + self.bias.astype(visp.dtype)
        )
        return score  # packed [B,h,wp,2K]
