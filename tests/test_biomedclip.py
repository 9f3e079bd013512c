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
