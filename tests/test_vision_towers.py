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
                                     layers=1, heads=2, fpn_dim=8)
    x = jnp.ones((1, 32, 32, 1))
    p = net.init(jax.random.key(0), x)
    pyr = net.apply(p, x)
    assert [f.shape for f in pyr] == [
        (1, 16, 16, 8), (1, 8, 8, 8), (1, 4, 4, 8), (1, 2, 2, 8)]


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
