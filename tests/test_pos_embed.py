"""Position-embedding utilities: 2D sin-cos tables + grid resampling
(reference models/BiomedCLIP/BiomedCLIP/pos_embed.py:20-96,
big_vision.py:50-61)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instancediff_tpu.models.pos_embed import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
)


def test_sincos_closed_form():
    emb = get_2d_sincos_pos_embed(8, 3)
    assert emb.shape == (9, 8)
    # first half encodes the W coordinate (upstream meshgrid quirk): rows
    # with equal W are equal there
    np.testing.assert_allclose(emb[0, :4], emb[3, :4], atol=1e-7)
    # second half encodes H: rows with equal H match there
    np.testing.assert_allclose(emb[0, 4:], emb[1, 4:], atol=1e-7)
    # position 0 -> sin=0, cos=1 in each 1D table
    np.testing.assert_allclose(emb[0, :2], [0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(emb[0, 2:4], [1.0, 1.0], atol=1e-7)
    # sin(pos*omega) at pos=1, omega_0=1 -> sin(1)
    assert abs(emb[1, 0] - np.sin(1.0)) < 1e-6  # row (h=0,w=1)

    with_cls = get_2d_sincos_pos_embed(8, 3, cls_token=True)
    assert with_cls.shape == (10, 8)
    np.testing.assert_array_equal(with_cls[0], np.zeros(8))
    np.testing.assert_allclose(with_cls[1:], emb, atol=0)


def test_sincos_matches_reference_torch_source():
    """Golden against the executable reference implementation."""
    ref_dir = "/root/reference/models/BiomedCLIP/BiomedCLIP"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not present")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pos_embed", os.path.join(ref_dir, "pos_embed.py"))
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # pragma: no cover - torch import issues
        pytest.skip(f"reference module not executable: {e}")
    ours = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    theirs = ref.get_2d_sincos_pos_embed(16, 4, cls_token=True)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_interpolate_identity_and_resize():
    pos = jnp.asarray(np.random.RandomState(0).randn(1 + 16, 8), jnp.float32)
    same = interpolate_pos_embed(pos, 17, n_prefix=1)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))

    up = interpolate_pos_embed(pos, 1 + 49, n_prefix=1)
    assert up.shape == (50, 8)
    # cls row untouched
    np.testing.assert_array_equal(np.asarray(up[0]), np.asarray(pos[0]))
    # constant tables stay constant under bicubic resize
    const = jnp.ones((1 + 16, 8))
    up_c = interpolate_pos_embed(const, 1 + 49, n_prefix=1)
    np.testing.assert_allclose(np.asarray(up_c), 1.0, atol=1e-5)

    with pytest.raises(ValueError):
        interpolate_pos_embed(pos, 1 + 48, n_prefix=1)  # non-square target


def test_vision_converter_resamples_pos_grid():
    """A 224px checkpoint (197 tokens) loads into a 256px tower (257)."""
    torch = pytest.importorskip("torch")
    from instancediff_tpu.models.clip_vit import (
        CLIPVisionTower, load_torch_clip_vision_weights)

    tower = CLIPVisionTower(image_size=64, patch_size=8, width=32, layers=1,
                            heads=4, embed_dim=16)
    params = jax.jit(tower.init)(jax.random.key(0),
                                 jnp.zeros((1, 64, 64, 1)))  # 8x8 grid + cls
    src = torch.randn(1, 4 * 4 + 1, 32)  # a 4x4-grid checkpoint
    sd = {"visual.trunk.pos_embed": src}
    out = load_torch_clip_vision_weights(params, sd)
    got = np.asarray(out["params"]["pos_embed"])
    assert got.shape == (65, 32)
    np.testing.assert_allclose(got[0], src[0, 0].numpy(), atol=1e-6)  # cls


def test_sincos_tower_forward():
    from instancediff_tpu.models.clip_vit import CLIPVisionTower

    tower = CLIPVisionTower(image_size=32, patch_size=8, width=32, layers=1,
                            heads=4, embed_dim=16,
                            pos_embed_type="sin_cos_2d")
    params = jax.jit(tower.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    table = np.asarray(params["params"]["pos_embed"])
    np.testing.assert_allclose(
        table, get_2d_sincos_pos_embed(32, 4, cls_token=True), atol=1e-6)
    out = jax.jit(tower.apply)(params, jnp.zeros((2, 32, 32, 1)))
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------- #
# text positional-table resize (reference model.py:541-570)               #
# ---------------------------------------------------------------------- #

from instancediff_tpu.models.pos_embed import resize_text_pos_embed  # noqa: E402


def test_resize_text_pos_embed_torch_golden():
    """Matches the vendored ``resize_text_pos_embed``'s op exactly:
    F.interpolate(mode='linear', antialias=False, align_corners=False) over
    the position axis (reference model.py:557-566), up AND down."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for L, Lp in [(77, 42), (42, 77), (256, 100), (16, 3), (100, 256)]:
        x = rng.normal(size=(L, 64)).astype(np.float32)
        t = torch.from_numpy(x).reshape(1, L, 64).permute(0, 2, 1)
        ref = F.interpolate(t, size=Lp, mode="linear", antialias=False,
                            align_corners=False).permute(0, 2, 1)[0].numpy()
        got = np.asarray(resize_text_pos_embed(x, Lp))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # equal length: identity (model.py:555-556)
    x = rng.normal(size=(10, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_text_pos_embed(x, 10)), x)


def test_clip_text_converter_cross_length_load():
    """A checkpoint with context_length != the model's loads cross-length:
    longer -> truncated (active-path parity, _modified_BiomedCLIP.py:841-843),
    shorter -> linear-resampled; pos_embed_mode='interpolate' always
    resamples (model.py:541-570). Width mismatch raises (model.py:554)."""
    from instancediff_tpu.models.text_encoder import (
        CLIPTextContextEncoder, load_torch_clip_text_weights)

    te = CLIPTextContextEncoder(context_length=12, vocab_size=64, width=16,
                                heads=2, layers=1, embed_dim=16)
    params = te.init(jax.random.key(0), jnp.zeros((1, 12), jnp.int32), None)
    rng = np.random.default_rng(1)

    longer = rng.normal(size=(20, 16)).astype(np.float32)
    out = load_torch_clip_text_weights(params, {"positional_embedding": longer})
    np.testing.assert_allclose(
        np.asarray(out["params"]["positional_embedding"]), longer[:12],
        atol=0)

    out = load_torch_clip_text_weights(
        params, {"positional_embedding": longer}, pos_embed_mode="interpolate")
    np.testing.assert_allclose(
        np.asarray(out["params"]["positional_embedding"]),
        np.asarray(resize_text_pos_embed(longer, 12)), atol=0)

    shorter = rng.normal(size=(7, 16)).astype(np.float32)
    out = load_torch_clip_text_weights(params, {"positional_embedding": shorter})
    got = np.asarray(out["params"]["positional_embedding"])
    assert got.shape == (12, 16)
    np.testing.assert_allclose(
        got, np.asarray(resize_text_pos_embed(shorter, 12)), atol=0)

    with pytest.raises(ValueError, match="width"):
        load_torch_clip_text_weights(
            params, {"positional_embedding": rng.normal(size=(20, 8))})


def test_bert_converter_cross_maxpos_load():
    """The BERT tower's learned position table resamples the same way when a
    checkpoint's max_position differs."""
    from instancediff_tpu.models.text_encoder import (
        HFContextTextEncoder, load_torch_bert_weights)

    te = HFContextTextEncoder(hidden=16, heads=2, layers=1, proj_dim=16,
                              vocab_size=64, context_length=12, max_position=24)
    ids = jnp.zeros((1, 12), jnp.int32)
    params = te.init(jax.random.key(0), ids, jnp.ones_like(ids), None)
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(40, 16)).astype(np.float32)
    out = load_torch_bert_weights(
        params, {"text.transformer.embeddings.position_embeddings.weight": pos})
    got = np.asarray(out["params"]["position_embeddings"])
    assert got.shape == (24, 16)
    np.testing.assert_allclose(
        got, np.asarray(resize_text_pos_embed(pos, 24)), atol=0)
