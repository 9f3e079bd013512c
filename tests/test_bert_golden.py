"""Golden parity test: HFContextTextEncoder vs the reference's torch tower.

The reference text tower (``/root/reference/models/_modified_BiomedCLIP.py``
``HFContextTextEncoder`` :885-1015) is a stock HF ``BertModel`` —
``modified_BertModel.forward`` (:1082-1191) delegates verbatim to
``BertModel``'s encoder and the modified-embeddings override is commented out
(:1080) — wrapped with:
  * context splicing after [CLS] via ``inputs_embeds``
    (``token_embedding`` :951-958, sequence extends to N1+N2),
  * an attention mask [mask_t[CLS], ones(N2), mask_t[1:]] (:968-971),
  * ClsLastHiddenStatePooler ([CLS] last hidden state) and a bias-free
    Linear/GELU/Linear projection to 512 (:934-940).

The reference file itself imports timm (absent here), so this test rebuilds
that exact call path on a stock ``transformers.BertModel`` (the very class the
reference subclasses without behavioural change) and asserts the flax tower,
fed through ``load_torch_bert_weights``, matches end-to-end and layerwise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.text_encoder import (  # noqa: E402
    HFContextTextEncoder,
    load_torch_bert_weights,
)

HIDDEN, HEADS, LAYERS, PROJ, VOCAB, MAXPOS = 32, 4, 2, 16, 64, 48


def _torch_reference_tower(seed=0):
    """BertModel + the reference's exact wrapper math (eval mode, fp64)."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=HIDDEN * 4,
        max_position_embeddings=MAXPOS, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        type_vocab_size=2, pad_token_id=0,
    )
    torch.manual_seed(seed)
    bert = BertModel(cfg, add_pooling_layer=False).eval()
    proj = torch.nn.Sequential(
        torch.nn.Linear(HIDDEN, (HIDDEN + PROJ) // 2, bias=False),
        torch.nn.GELU(),
        torch.nn.Linear((HIDDEN + PROJ) // 2, PROJ, bias=False),
    ).eval()
    return bert, proj, cfg


def _torch_forward(bert, proj, ids_t, context_t):
    """Reference HFContextTextEncoder.forward (:951-991) on stock BertModel."""
    with torch.no_grad():
        emb = bert.embeddings.word_embeddings(ids_t)  # [K, N1, C]
        K, N1, C = emb.shape
        if context_t is not None:
            N2 = context_t.shape[0]
            ctx = context_t.unsqueeze(0).expand(K, N2, C)
            spliced = torch.cat([emb[:, 0:1], ctx, emb[:, 1:]], dim=1)
            mask_t = (ids_t != 0).long()
            attn = torch.ones((K, N2 + N1), dtype=torch.long)
            attn[:, 0:1] = mask_t[:, 0:1]
            attn[:, N2 + 1:] = mask_t[:, 1:]
        else:
            spliced = emb
            attn = (ids_t != 0).long()
        out = bert(inputs_embeds=spliced, attention_mask=attn,
                   output_hidden_states=True)
        pooled = out.last_hidden_state[:, 0]  # ClsLastHiddenStatePooler
        return proj(pooled), out.hidden_states


def _flax_tower_params(bert, proj):
    sd = {"text.transformer." + k: v for k, v in bert.state_dict().items()}
    sd["text.proj.0.weight"] = proj[0].weight
    sd["text.proj.2.weight"] = proj[2].weight
    te = HFContextTextEncoder(hidden=HIDDEN, heads=HEADS, layers=LAYERS,
                              proj_dim=PROJ, vocab_size=VOCAB,
                              context_length=16, max_position=MAXPOS)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = te.init(jax.random.key(0), ids0, None, None)
    return te, load_torch_bert_weights(params, sd)


@pytest.mark.parametrize("with_context", [False, True])
def test_bert_tower_matches_reference_torch(with_context):
    bert, proj, _ = _torch_reference_tower()
    te, params = _flax_tower_params(bert, proj)

    rng = np.random.default_rng(3)
    K, L, NCTX = 5, 12, 8
    ids = rng.integers(1, VOCAB, size=(K, L)).astype(np.int64)
    ids[:, -3:] = 0  # padding tail (pad_token_id = 0)
    ctx = rng.standard_normal((NCTX, HIDDEN)).astype(np.float32) * 0.2

    ids_t = torch.from_numpy(ids)
    ctx_t = torch.from_numpy(ctx) if with_context else None
    ref_out, _ = _torch_forward(bert, proj, ids_t, ctx_t)

    mask = (ids != 0).astype(np.int32)
    got = te.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask),
                   jnp.asarray(ctx) if with_context else None)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_bert_tower_layerwise_match():
    """Per-layer hidden states match — catches any residual/LN misplacement."""
    bert, proj, _ = _torch_reference_tower(seed=1)
    te, params = _flax_tower_params(bert, proj)

    rng = np.random.default_rng(7)
    K, L = 3, 10
    ids = rng.integers(1, VOCAB, size=(K, L)).astype(np.int64)
    ids_t = torch.from_numpy(ids)
    _, hs = _torch_forward(bert, proj, ids_t, None)  # hs[0]=embeddings, hs[i]=layer i

    # re-run the flax tower capturing intermediates
    inner = params["params"]
    mask = jnp.ones((K, L), jnp.int32)
    from instancediff_tpu.models.text_encoder import PostLNBertLayer

    tok = inner["word_embeddings"]["embedding"][np.asarray(ids)]
    x = (tok + inner["position_embeddings"][None, :L]
         + inner["token_type_embeddings"][0][None, None])
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-12)
    x = ln.apply({"params": inner["embeddings_ln"]}, x)
    np.testing.assert_allclose(np.asarray(x), hs[0].numpy(), atol=1e-5, rtol=1e-5)
    add_mask = jnp.where(mask[:, None, :] > 0, 0.0, -jnp.inf)
    for i in range(LAYERS):
        blk = PostLNBertLayer(HIDDEN, HEADS)
        x = blk.apply({"params": inner[f"layer_{i}"]}, x, mask=add_mask)
        np.testing.assert_allclose(np.asarray(x), hs[i + 1].numpy(),
                                   atol=1e-5, rtol=1e-5)
