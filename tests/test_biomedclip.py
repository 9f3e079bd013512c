import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.models.biomedclip import BiomedCLIP, get_BiomedCLIP


@pytest.fixture(scope="module")
def model():
    return BiomedCLIP(clip_type="BiomedCLIP", embed_dim=16, tiny=True, seed=0)


def test_encode_image_normalized(model):
    imgs = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    emb = model.encode_image(imgs)
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0, rtol=1e-5)


def test_encode_text_and_logits(model):
    texts = ["speckle in OCT", "Gaussian noise in MRI"]
    emb = model.encode_text(texts)
    assert emb.shape == (2, 16)
    imgs = np.random.default_rng(1).uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32)
    logits = model(imgs, texts)
    assert logits.shape == (3, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_get_biomedclip_uses_reference_vocab_when_present():
    m = get_BiomedCLIP(tiny=True)
    emb = m.encode_text(["noise in low dose CT"])
    assert emb.shape == (1, 512)  # default shared-space dim


def test_clip_variant():
    m = BiomedCLIP(clip_type="CLIP", embed_dim=16, tiny=True, seed=1)
    emb = m.encode_text(["speckle in ultra sound"])
    assert emb.shape == (1, 16)


def test_bert_weight_conversion_mapping():
    """Synthetic torch-style state dict converts into the tower's tree with
    values landing in the right leaves."""
    import numpy as np

    from instancediff_tpu.models.text_encoder import (
        HFContextTextEncoder,
        load_torch_bert_weights,
    )
    import jax
    import jax.numpy as jnp

    te = HFContextTextEncoder(hidden=16, heads=2, layers=1, proj_dim=8,
                              vocab_size=32, context_length=8, max_position=16)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = te.init(jax.random.key(0), ids, None, None)

    rng = np.random.default_rng(0)
    P = "text.transformer."
    sd = {
        P + "embeddings.word_embeddings.weight": rng.standard_normal((32, 16)),
        P + "embeddings.position_embeddings.weight": rng.standard_normal((16, 16)),
        P + "embeddings.token_type_embeddings.weight": rng.standard_normal((2, 16)),
        P + "embeddings.LayerNorm.weight": rng.standard_normal(16),
        P + "embeddings.LayerNorm.bias": rng.standard_normal(16),
        P + "encoder.layer.0.attention.self.query.weight": rng.standard_normal((16, 16)),
        P + "encoder.layer.0.attention.self.query.bias": rng.standard_normal(16),
        "text.proj.0.weight": rng.standard_normal((12, 16)),
        "text.proj.0.bias": rng.standard_normal(12),
        "text.proj.2.weight": rng.standard_normal((8, 12)),
        "text.proj.2.bias": rng.standard_normal(8),
    }
    new = load_torch_bert_weights(params, sd)
    inner = new["params"]
    np.testing.assert_allclose(
        np.asarray(inner["word_embeddings"]["embedding"]),
        sd[P + "embeddings.word_embeddings.weight"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inner["layer_0"]["q_proj"]["kernel"]),
        sd[P + "encoder.layer.0.attention.self.query.weight"].T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inner["proj_fc2"]["kernel"]),
        sd["text.proj.2.weight"].T, atol=1e-6)
    # untouched leaves remain valid and the tower still runs
    out = te.apply(new, ids, None, None)
    assert out.shape == (1, 8)


# ---------------------------------------------------------------------- #
# precision strings (reference model.py:86-101, __init__.py:156-179)      #
# ---------------------------------------------------------------------- #

def test_get_cast_and_input_dtype_mappings():
    from instancediff_tpu.models.biomedclip import (get_cast_dtype,
                                                    get_input_dtype)

    assert get_cast_dtype("bf16") == jnp.bfloat16
    assert get_cast_dtype("fp16") == jnp.float16
    assert get_cast_dtype("fp32") is None
    assert get_cast_dtype("pure_bf16") is None  # model.py:86-92 exactly
    assert get_input_dtype("bf16") == jnp.bfloat16
    assert get_input_dtype("pure_bf16") == jnp.bfloat16
    assert get_input_dtype("fp16") == jnp.float16
    assert get_input_dtype("pure_fp16") == jnp.float16
    assert get_input_dtype("fp32") is None


def _leaf_dtypes(tree):
    import jax

    return {x.dtype for x in jax.tree.leaves(tree)
            if jnp.issubdtype(x.dtype, jnp.floating)}


def test_precision_bf16_keeps_fp32_master_params():
    """'bf16' = low-precision compute with fp32 master weights (the JAX
    analogue of upstream's cast-all-but-LayerNormFp32, __init__.py:156-172)."""
    m = BiomedCLIP(clip_type="BiomedCLIP", embed_dim=16, tiny=True, seed=0,
                   precision="bf16")
    assert _leaf_dtypes(m.visual_params) == {jnp.dtype(jnp.float32)}
    imgs = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    emb = m.encode_image(imgs)
    assert emb.shape == (2, 16) and np.isfinite(np.asarray(emb)).all()


def test_precision_pure_bf16_casts_params():
    """'pure_bf16' = the whole model in bf16 (model.to(dtype),
    __init__.py:176-179)."""
    m = BiomedCLIP(clip_type="BiomedCLIP", embed_dim=16, tiny=True, seed=0,
                   precision="pure_bf16")
    assert _leaf_dtypes(m.visual_params) == {jnp.dtype(jnp.bfloat16)}
    assert _leaf_dtypes(m.text_params) == {jnp.dtype(jnp.bfloat16)}
    emb = m.encode_text(["speckle in OCT"])
    assert np.isfinite(np.asarray(emb, dtype=np.float32)).all()


def test_precision_roundtrips_through_get_biomedclip():
    m = get_BiomedCLIP(tiny=True, precision="bf16")
    assert m.precision == "bf16"
    emb = m.encode_text(["noise in low dose CT"])
    assert emb.shape == (1, 512)


def test_unknown_precision_rejected():
    with pytest.raises(ValueError, match="precision"):
        BiomedCLIP(tiny=True, embed_dim=16, precision="fp8")
