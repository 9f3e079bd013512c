"""W8A8 int8 conv path (ops/int8.py; engine.int8_conv)."""

import jax
import jax.numpy as jnp
import numpy as np

from instancediff_tpu.ops.int8 import int8_conv, quantize_act, quantize_weight
from instancediff_tpu.ops.packed_l0 import pack_w, packed_conv3x3, unpack_w


def _conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)


def test_quantize_roundtrip_bounds():
    w = jax.random.normal(jax.random.key(0), (3, 3, 16, 8))
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(wq.astype(jnp.float32) * ws),
                               np.asarray(w), atol=float(np.max(ws)) / 2 + 1e-6)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 16)) * 3
    xq, xs = quantize_act(x)
    assert np.abs(np.asarray(xq)).max() <= 127


def test_int8_conv_close_to_fp32():
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 64))
    w = jax.random.normal(jax.random.key(1), (3, 3, 64, 64)) * 0.05
    b = jax.random.normal(jax.random.key(2), (64,)) * 0.1
    ref = np.asarray(_conv(x, w) + b)
    got = np.asarray(int8_conv(x, w, b, out_dtype=jnp.float32))
    # symmetric per-channel W8 + per-tensor A8: relative L2 error ~1%
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_packed_conv3x3_int8_close():
    a = jax.random.normal(jax.random.key(0), (1, 8, 8, 64))
    w = jax.random.normal(jax.random.key(1), (3, 3, 64, 64)) * 0.05
    b = jax.random.normal(jax.random.key(2), (64,)) * 0.1
    ref = np.asarray(_conv(a, w) + b)
    got = np.asarray(unpack_w(packed_conv3x3(pack_w(a), w, b, int8=True)))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_unet_int8_close_to_fp32():
    """Whole-UNet int8 clone stays close to the fp32 forward on the same
    params (random init; per-checkpoint quality is validated on-chip via
    testUM — PERF.md)."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=64, ch_mult=(1, 2), context_dim=16,
        score_map_chan=16, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 1, 16
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3], jnp.int32)
    ty = jnp.array([2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, _ = net.apply(params, x_a, x_b, t, ty,
                       text_embs=text_embs, image_context=ctx)
    for clone_kw in ({"int8_conv": True},
                     {"int8_conv": True, "packed_l0": True}):
        got, _ = net.clone(**clone_kw).apply(
            params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
        ref_n, got_n = np.asarray(ref), np.asarray(got)
        rel = np.linalg.norm(got_n - ref_n) / max(np.linalg.norm(ref_n), 1e-9)
        assert rel < 0.1, (clone_kw, rel)


def test_engine_int8_knob():
    from instancediff_tpu.models.drift_model import CLIPDriftEngine, ENGINE_KNOBS
    from instancediff_tpu.sde import DriftSDE

    assert "int8_conv" in ENGINE_KNOBS
    TINY = dict(in_nc=2, out_nc=5, nf=8, ch_mult=[1, 2], context_dim=16,
                text_module="scoremap", score_map_chan=4, if_MultiScoreMap=True,
                num_res_blocks=1)
    eng = CLIPDriftEngine(
        dnet_settings=TINY, nnet_settings=TINY, score_map_ch_mult=(1, 1),
        score_map_ngf=8, use_image_context=True, CLIP_Type="CLIP",
        tiny_text_encoder=True, sde=DriftSDE(T=4, max_sigma=0.4),
        image_size=8, nepoch=2, seed=0, if_train=False,
        engine_opts={"int8_conv": True, "packed_l0": False})
    batch = {"input": jnp.zeros((1, 8, 8, 1)), "target": jnp.zeros((1, 8, 8, 1)),
             "type_idx": jnp.array([0]), "A_emb": jnp.zeros((1, 1, 16))}
    out = eng.test(batch, jax.random.key(0), use_ema=False)
    assert out.shape == (1, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
