"""CoCa analogue tests (models/coca.py): forward contract, decoder
causality, fixed-shape generation, beam search, torch weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.models.coca import (
    CoCa,
    build_coca,
    generate,
    generate_beamsearch,
    load_torch_coca_weights,
)


@pytest.fixture(scope="module")
def coca_and_params():
    model = build_coca(tiny=True)
    imgs = jax.random.uniform(jax.random.key(0), (2, 16, 16, 1)) * 2 - 1
    ids = jnp.array([[1, 5, 9, 3, 0, 0, 0, 0],
                     [1, 7, 2, 8, 4, 6, 0, 0]], jnp.int32)
    params = model.init(jax.random.key(1), imgs, ids)
    return model, params, imgs, ids


def test_forward_contract(coca_and_params):
    """Return dict mirrors the reference forward (coca_model.py:151-176)."""
    model, params, imgs, ids = coca_and_params
    out = model.apply(params, imgs, ids)
    B, L = ids.shape
    assert out["logits"].shape == (B, L, model.vocab_size)
    assert out["image_features"].shape == (B, model.embed_dim)
    assert out["text_features"].shape == (B, model.embed_dim)
    np.testing.assert_array_equal(np.asarray(out["labels"]), np.asarray(ids))
    assert float(out["logit_scale"]) == pytest.approx(1 / 0.07, rel=1e-4)
    # latents are L2-normalised
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        atol=1e-5)
    # image-only call returns features + embs (coca_model.py:165-166)
    out2 = model.apply(params, imgs)
    assert set(out2) == {"image_features", "image_embs"}
    assert out2["image_embs"].shape == (B, model.n_queries - 1,
                                        model.embed_dim)


def test_decoder_causality(coca_and_params):
    """Logits at position i must not depend on tokens > i (causal mask in
    both the text tower and the multimodal decoder)."""
    model, params, imgs, ids = coca_and_params
    base = model.apply(params, imgs, ids)["logits"]
    ids2 = ids.at[:, 5].set(13)  # mutate a late token
    pert = model.apply(params, imgs, ids2)["logits"]
    np.testing.assert_allclose(np.asarray(base[:, :5]),
                               np.asarray(pert[:, :5]), atol=1e-5)
    assert np.abs(np.asarray(base[:, 5:]) - np.asarray(pert[:, 5:])).max() > 1e-6


def test_generate_topk_fixed_shape(coca_and_params):
    model, params, imgs, _ = coca_and_params
    seq_len = 10
    out = generate(model, params, imgs, jax.random.key(3), seq_len=seq_len,
                   generation_type="top_k", top_k=1, min_seq_len=2,
                   sot_token_id=1, eos_token_id=2, pad_token_id=0)
    out = np.asarray(out)
    assert out.shape == (2, seq_len)
    assert (out[:, 0] == 1).all()
    # fixed_output_length contract: after the first EOS-or-PAD (both
    # terminate, reference :272) only PAD follows; unfinished rows get a
    # forced EOS at the last position (:284-287)
    for row in out:
        stop = np.where((row[1:] == 2) | (row[1:] == 0))[0]
        assert len(stop) >= 1
        assert ((row[1:][stop[0] + 1:] == 0)).all()
    # greedy (top_k=1) is deterministic
    out_b = np.asarray(generate(model, params, imgs, jax.random.key(99),
                                seq_len=seq_len, generation_type="top_k",
                                top_k=1, min_seq_len=2, sot_token_id=1,
                                eos_token_id=2, pad_token_id=0))
    np.testing.assert_array_equal(out, out_b)


def test_generate_topp_runs(coca_and_params):
    model, params, imgs, _ = coca_and_params
    out = generate(model, params, imgs, jax.random.key(4), seq_len=8,
                   generation_type="top_p", top_p=0.5, min_seq_len=2,
                   sot_token_id=1, eos_token_id=2, pad_token_id=0)
    assert np.asarray(out).shape == (2, 8)


def test_generate_min_seq_len(coca_and_params):
    """The MinLength processor must block EOS before min_seq_len
    (coca_model.py:207-210)."""
    model, params, imgs, _ = coca_and_params
    out = np.asarray(generate(
        model, params, imgs, jax.random.key(5), seq_len=12,
        generation_type="top_k", top_k=3, min_seq_len=6,
        sot_token_id=1, eos_token_id=2, pad_token_id=0))
    for row in out:
        eos_pos = np.where(row == 2)[0]
        if len(eos_pos):  # PAD-termination rows carry no EOS (:272)
            assert eos_pos[0] >= 6


def test_beam_search(coca_and_params):
    """Beam output is a valid fixed-shape caption; a single-beam search
    reduces to greedy argmax decoding (up to the first stop token, where
    the two paths' termination semantics separate)."""
    model, params, imgs, _ = coca_and_params
    beam = np.asarray(generate_beamsearch(
        model, params, imgs, seq_len=8, num_beams=4, num_beam_groups=2,
        min_seq_len=2, sot_token_id=1, eos_token_id=2, pad_token_id=0))
    assert beam.shape == (2, 8)
    assert (beam[:, 0] == 1).all()
    beam1 = np.asarray(generate_beamsearch(
        model, params, imgs, seq_len=8, num_beams=1, num_beam_groups=1,
        min_seq_len=2, sot_token_id=1, eos_token_id=2, pad_token_id=0))
    greedy = np.asarray(generate(
        model, params, imgs, jax.random.key(0), seq_len=8,
        generation_type="top_k", top_k=1, min_seq_len=2, sot_token_id=1,
        eos_token_id=2, pad_token_id=0))
    for b_row, g_row in zip(beam1, greedy):
        stops = np.where((b_row == 2) | (b_row == 0) | (g_row == 2)
                         | (g_row == 0))[0]
        upto = stops[0] if len(stops) else len(b_row)
        np.testing.assert_array_equal(b_row[:upto], g_row[:upto])


def test_torch_weight_conversion(coca_and_params):
    """Synthetic open_clip-layout state dict lands on the right leaves with
    the right transposes (same pattern as tests/test_biomedclip.py)."""
    model, params, _, _ = coca_and_params
    rng = np.random.default_rng(0)
    W = model.text_width
    E = model.embed_dim
    VW = model.vision_width

    sd = {
        "text.token_embedding.weight": rng.normal(size=(model.vocab_size, W)),
        "text.cls_emb": rng.normal(size=(W,)),
        "text.positional_embedding": rng.normal(
            size=(model.context_length + 1, W)),
        "text.ln_final.weight": rng.normal(size=(W,)),
        "text.ln_final.bias": rng.normal(size=(W,)),
        "text.text_projection": rng.normal(size=(W, E)),
        "text.transformer.resblocks.0.attn.in_proj_weight": rng.normal(
            size=(3 * W, W)),
        "text.transformer.resblocks.0.attn.in_proj_bias": rng.normal(
            size=(3 * W,)),
        "text.transformer.resblocks.0.attn.out_proj.weight": rng.normal(
            size=(W, W)),
        "text.transformer.resblocks.0.attn.out_proj.bias": rng.normal(
            size=(W,)),
        "text_decoder.cross_attn.0.ln_1_kv.weight": rng.normal(size=(W,)),
        "text_decoder.cross_attn.0.ln_1_kv.bias": rng.normal(size=(W,)),
        "text_decoder.text_projection": rng.normal(size=(W, model.vocab_size)),
        "visual.class_embedding": rng.normal(size=(VW,)),
        "visual.proj": rng.normal(size=(E, E)),
        "visual.attn_pool.query": rng.normal(size=(model.n_queries, E)),
        "visual.attn_pool.attn.q_proj_weight": rng.normal(size=(E, E)),
        "visual.attn_pool.attn.k_proj_weight": rng.normal(size=(E, VW)),
        "visual.attn_pool.attn.v_proj_weight": rng.normal(size=(E, VW)),
        "visual.attn_pool.attn.in_proj_bias": rng.normal(size=(3 * E,)),
        "visual.attn_pool.attn.out_proj.weight": rng.normal(size=(E, E)),
        "visual.attn_pool.attn.out_proj.bias": rng.normal(size=(E,)),
        "logit_scale": np.asarray(0.5),
    }
    new = load_torch_coca_weights(params, sd)
    inner = new["params"]
    np.testing.assert_allclose(
        np.asarray(inner["text"]["token_embedding"]["embedding"]),
        sd["text.token_embedding.weight"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(inner["text"]["cls_emb"]),
                               sd["text.cls_emb"], atol=1e-6)
    # in_proj rows q|k|v land transposed in q/k/v kernels
    np.testing.assert_allclose(
        np.asarray(inner["text"]["block_0"]["k_proj"]["kernel"]),
        sd["text.transformer.resblocks.0.attn.in_proj_weight"][W:2 * W].T,
        atol=1e-6)
    # separate-kdim attn pool layout
    np.testing.assert_allclose(
        np.asarray(inner["visual"]["attn_pool"]["k_proj"]["kernel"]),
        sd["visual.attn_pool.attn.k_proj_weight"].T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inner["text_decoder"]["cross_0"]["ln_1_kv"]["scale"]),
        sd["text_decoder.cross_attn.0.ln_1_kv.weight"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inner["text_decoder"]["text_projection"]["kernel"]),
        sd["text_decoder.text_projection"], atol=1e-6)
    assert float(inner["logit_scale"]) == pytest.approx(0.5)
    # converted params still run
    imgs = jax.random.uniform(jax.random.key(7), (1, 16, 16, 1)) * 2 - 1
    ids = jnp.array([[1, 5, 9, 0]], jnp.int32)
    out = model.apply(new, imgs, ids)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_registry_rows():
    from instancediff_tpu.models.pretrained import get_pretrained_cfg

    cfg = get_pretrained_cfg("coca_ViT-B-32", "laion2b_s13b_b90k")
    assert cfg["converter"] == "coca.load_torch_coca_weights"
