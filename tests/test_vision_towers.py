import jax
import jax.numpy as jnp
import numpy as np

from instancediff_tpu.data.util import bgr2ycbcr, rgb2ycbcr
from instancediff_tpu.models.vision_towers import (
    AttentionPool2d,
    Bottleneck,
    CLIPDenseVisionTransformer,
    CLIPResNetWithAttention,
    ContextDecoder,
    ContextDecoderHierarchical,
    ModifiedResNet,
)


def test_bottleneck_shapes():
    blk = Bottleneck(planes=4, stride=2)
    x = jnp.ones((1, 8, 8, 8))
    p = blk.init(jax.random.key(0), x)
    out = blk.apply(p, x)
    assert out.shape == (1, 4, 4, 16)


def test_attention_pool():
    ap = AttentionPool2d(embed_dim=16, heads=4, out_dim=8)
    x = jnp.ones((2, 4, 4, 16))
    p = ap.init(jax.random.key(0), x)
    pooled, tokens = ap.apply(p, x)
    assert pooled.shape == (2, 8)
    assert tokens.shape == (2, 16, 8)


def test_clip_resnet_multi_scale():
    net = CLIPResNetWithAttention(layers=(1, 1, 1, 1), width=8, output_dim=16,
                                  heads=4)
    x = jnp.ones((1, 32, 32, 1))
    p = net.init(jax.random.key(0), x)
    outs, pooled = net.apply(p, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 8, 8, 32)   # stem /4, planes*4
    assert outs[3].shape == (1, 1, 1, 256)
    assert pooled.shape == (1, 16)


def test_dense_vit_pyramid():
    net = CLIPDenseVisionTransformer(image_size=32, patch_size=8, width=16,
                                     layers=4, heads=2,
                                     out_indices=(0, 1, 2, 3))
    x = jnp.ones((1, 32, 32, 1))
    p = net.init(jax.random.key(0), x)
    pyr = net.apply(p, x)
    # patch-8 necks (reference :640-656): x2 deconv, identity, /2, /4 on the
    # 4x4 grid at trunk width
    assert [f.shape for f in pyr] == [
        (1, 8, 8, 16), (1, 4, 4, 16), (1, 2, 2, 16), (1, 1, 1, 16)]


def test_context_decoders():
    q = jnp.ones((2, 5, 16))
    mem = jnp.ones((2, 64, 16))
    dec = ContextDecoder(dim=16, layers=2, heads=4)
    p = dec.init(jax.random.key(0), q, mem)
    out = dec.apply(p, q, mem)
    assert out.shape == (2, 5, 16)

    mems = [jnp.ones((2, 64, 12)), jnp.ones((2, 16, 24))]
    hdec = ContextDecoderHierarchical(dim=16, layers=1, heads=4,
                                      use_scales=(0, 1))
    hp = hdec.init(jax.random.key(1), q, mems)
    hout = hdec.apply(hp, q, mems)
    assert hout.shape == (2, 5, 16)


def test_bgr2ycbcr():
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float64)
    y = bgr2ycbcr(img, only_y=True)
    assert y.shape == (8, 8)
    full = bgr2ycbcr(img, only_y=False)
    assert full.shape == (8, 8, 3)
    # white BGR -> Y ~ 235/255
    white = np.ones((1, 1, 3))
    assert abs(bgr2ycbcr(white)[0, 0] - 235.0 / 255.0) < 1e-6
    # rgb flip consistency
    np.testing.assert_allclose(rgb2ycbcr(img[..., ::-1]), y, atol=1e-12)


def test_modified_resnet_pooled_contract():
    """open_clip ModifiedResNet contract: pooled embedding only
    (modified_resnet.py:173-181)."""
    net = ModifiedResNet(layers=(1, 1, 1, 1), width=8, output_dim=16, heads=4)
    x = jnp.ones((2, 32, 32, 3))
    p = net.init(jax.random.key(0), x)
    out = net.apply(p, x)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pooler_variants():
    """hf_model.py pooler registry analogue (MeanPooler/MaxPooler/ClsPooler,
    :45-93): masked semantics + registry keys."""
    from instancediff_tpu.models.text_encoder import (
        POOLERS, cls_pooler, max_pooler, mean_pooler)

    hidden = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 3)),
                         jnp.float32)
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.int32)
    mean = np.asarray(mean_pooler(hidden, mask))
    np.testing.assert_allclose(mean[0], np.asarray(hidden[0, :2]).mean(0),
                               atol=1e-6)
    mx = np.asarray(max_pooler(hidden, mask))
    np.testing.assert_allclose(mx[0], np.asarray(hidden[0, :2]).max(0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls_pooler(hidden, mask)),
                               np.asarray(hidden[:, 0]), atol=1e-6)
    assert set(POOLERS) == {"mean_pooler", "max_pooler", "cls_pooler",
                            "cls_last_hidden_state_pooler"}
    # HFContextTextEncoder accepts the pooler_type knob
    from instancediff_tpu.models.text_encoder import HFContextTextEncoder

    enc = HFContextTextEncoder(vocab_size=32, hidden=8, heads=2, layers=1,
                               proj_dim=8, max_position=16,
                               pooler_type="mean_pooler")
    ids = jnp.array([[2, 5, 9, 3]], jnp.int32)
    pp = enc.init(jax.random.key(1), ids)
    out = enc.apply(pp, ids)
    assert out.shape == (1, 8) and np.isfinite(np.asarray(out)).all()
