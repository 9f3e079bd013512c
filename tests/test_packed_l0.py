"""Exactness tests for the fully width-packed level-0 ops (ops/packed_l0.py)
against the plain lax/flax reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.ops.packed_l0 import (
    conv_transpose_subpix,
    gn_silu_packed,
    pack_kernel_up_subpix,
    pack_w,
    packed_conv1x1,
    packed_conv3x3,
    packed_conv3x3_tapsum,
    packed_down_conv,
    packed_up_conv,
    packed_up_conv_subpix,
    tile_channels,
    unpack_w,
)
from instancediff_tpu.ops.pallas_kernels import group_norm_silu_reference


def _conv(x, w, strides=(1, 1), padding="SAME"):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, strides, padding,
                                        dimension_numbers=dn)


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 4, 6, 3))
    np.testing.assert_array_equal(np.asarray(unpack_w(pack_w(x))), np.asarray(x))
    # the packed view really interleaves columns into channels
    xp = pack_w(x)
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(xp[0, 0, 0, 3:]), np.asarray(x[0, 0, 1]))


def test_packed_conv3x3_single_segment():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    w = jax.random.normal(jax.random.key(1), (3, 3, 4, 6)) * 0.3
    b = jax.random.normal(jax.random.key(2), (6,)) * 0.1
    ref = _conv(x, w) + b
    got = unpack_w(packed_conv3x3(pack_w(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_packed_conv3x3_segments_match_concat():
    """Two packed tensors concatenated along channels == the conv over the
    logically concatenated input, via the segment-aware kernel."""
    a = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    c = jax.random.normal(jax.random.key(1), (1, 8, 8, 2))
    w = jax.random.normal(jax.random.key(2), (3, 3, 6, 5)) * 0.3
    ref = _conv(jnp.concatenate([a, c], axis=-1), w)
    xp = jnp.concatenate([pack_w(a), pack_w(c)], axis=-1)
    got = unpack_w(packed_conv3x3(xp, w, segments=[4, 2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_packed_conv1x1_segments():
    a = jax.random.normal(jax.random.key(0), (1, 6, 8, 4))
    c = jax.random.normal(jax.random.key(1), (1, 6, 8, 2))
    w = jax.random.normal(jax.random.key(2), (1, 1, 6, 3)) * 0.4
    b = jax.random.normal(jax.random.key(3), (3,)) * 0.2
    ref = _conv(jnp.concatenate([a, c], axis=-1), w) + b
    xp = jnp.concatenate([pack_w(a), pack_w(c)], axis=-1)
    got = unpack_w(packed_conv1x1(xp, w, b, segments=[4, 2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_packed_down_conv():
    """Stride-2 SAME conv from a packed input == flax nn.Conv semantics."""
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    w = jax.random.normal(jax.random.key(1), (3, 3, 4, 6)) * 0.3
    ref = _conv(x, w, strides=(2, 2))
    got = packed_down_conv(pack_w(x), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_packed_up_conv():
    """ConvTranspose (4,4)/s2 SAME with packed output == lax.conv_transpose."""
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 6))
    w = jax.random.normal(jax.random.key(1), (4, 4, 6, 3)) * 0.3
    ref = jax.lax.conv_transpose(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = unpack_w(packed_up_conv(x, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("silu", [True, False])
def test_gn_silu_packed_single_segment(silu):
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8)) * 1.5 + 0.3
    gamma = jax.random.normal(jax.random.key(1), (8,)) * 0.2 + 1.0
    beta = jax.random.normal(jax.random.key(2), (8,)) * 0.1
    ref = group_norm_silu_reference(x, gamma, beta, 4, silu=silu)
    got = unpack_w(gn_silu_packed(pack_w(x), gamma, beta, 4,
                                  segments=[8], silu=silu))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gn_silu_packed_segments():
    a = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    c = jax.random.normal(jax.random.key(1), (2, 8, 8, 2)) + 0.5
    x = jnp.concatenate([a, c], axis=-1)
    gamma = jnp.ones((6,)) * 1.1
    beta = jnp.zeros((6,)) + 0.05
    ref = group_norm_silu_reference(x, gamma, beta, 3, silu=True)
    xp = jnp.concatenate([pack_w(a), pack_w(c)], axis=-1)
    got_p = gn_silu_packed(xp, gamma, beta, 3, segments=[4, 2], silu=True)
    # unpack segment-wise
    got = jnp.concatenate([unpack_w(got_p[..., :8]), unpack_w(got_p[..., 8:])],
                          axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tile_channels_segments():
    v = jnp.arange(6.0)
    out = tile_channels(v, [4, 2])
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray(jnp.concatenate([v[:4], v[:4], v[4:], v[4:]])))


def test_unet_packed_l0_matches_standard():
    """A UNet cloned with packed_l0=True on the SAME params must produce
    identical predictions (the sampler swaps paths via clone)."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, ref_sms = net.apply(params, x_a, x_b, t, ty,
                             text_embs=text_embs, image_context=ctx)
    got, got_sms = net.clone(packed_l0=True).apply(
        params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # ALL supervision maps match, including level 0 (training parity)
    assert len(got_sms) == len(ref_sms)
    for a, b in zip(got_sms, ref_sms):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_packed_train_step_matches_standard():
    """Engines built with packed_train=True must produce (near-)identical
    losses and updates from identical seeds — the packed ops are exact and
    differentiable."""
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    def build(packed):
        settings = dict(in_nc=2, out_nc=5, nf=8, ch_mult=[1, 2],
                        context_dim=16, text_module="scoremap",
                        score_map_chan=4, if_MultiScoreMap=True,
                        num_res_blocks=1)
        return CLIPDriftEngine(
            dnet_settings=settings, nnet_settings=settings,
            score_map_ch_mult=(1, 1), score_map_ngf=8,
            use_image_context=True, CLIP_Type="CLIP", tiny_text_encoder=True,
            sde=DriftSDE(T=2, max_sigma=0.4), image_size=16, nepoch=2,
            seed=0, packed_train=packed)

    ref_eng, pk_eng = build(False), build(True)
    # identical initial params (same seed, same param paths)
    for a, b in zip(jax.tree.leaves(ref_eng.state["drift"]),
                    jax.tree.leaves(pk_eng.state["drift"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (2, 16, 16, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    batch = {"input": mu, "target": x0,
             "type_idx": jnp.arange(2, dtype=jnp.int32),
             "A_emb": jnp.zeros((2, 1, 16))}
    lr = jnp.asarray(1e-3, jnp.float32)
    step_key = jax.random.key(7)
    ref_state, ref_m = jax.jit(ref_eng.build_train_step())(
        jax.tree.map(jnp.copy, ref_eng.state), batch, step_key,
        ref_eng.text_params, lr, lr)
    pk_state, pk_m = jax.jit(pk_eng.build_train_step())(
        jax.tree.map(jnp.copy, pk_eng.state), batch, step_key,
        pk_eng.text_params, lr, lr)
    np.testing.assert_allclose(float(pk_m["l"]), float(ref_m["l"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state["drift"])[:5],
                    jax.tree.leaves(pk_state["drift"])[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_ddpm_packed_sampler_matches_standard():
    """The DDPM baseline's sampler with packed_l0 forced on equals the
    standard path (same params, same key)."""
    from instancediff_tpu.models.ddpm_model import CLIPDDPMEngine
    from instancediff_tpu.sde import DDPMSDE

    settings = dict(in_nc=2, out_nc=5, nf=8, ch_mult=[1, 2], context_dim=16,
                    text_module="scoremap", score_map_chan=4, num_res_blocks=1)
    eng = CLIPDDPMEngine(net_settings=settings, use_image_context=True,
                         CLIP_Type="CLIP", tiny_text_encoder=True,
                         sde=DDPMSDE(T=3), image_size=16, seed=0)
    mu = jax.random.uniform(jax.random.key(1), (2, 16, 16, 1)) * 2 - 1
    ty = jnp.arange(2, dtype=jnp.int32)
    emb = jnp.zeros((2, 1, 16))
    key = jax.random.key(5)

    eng.packed_l0 = False
    ref = jax.jit(eng.build_sample_fn())(
        eng.state["noise"], eng.text_params, mu, ty, emb, key)
    eng.packed_l0 = True
    got = jax.jit(eng.build_sample_fn())(
        eng.state["noise"], eng.text_params, mu, ty, emb, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_conv3x3_ksplit_exact():
    """k_split computes the conv as a sum of per-segment-group convs —
    identical output (linearity), K-tile-aligned groups."""
    a = jax.random.normal(jax.random.key(0), (1, 8, 8, 64))
    s = jax.random.normal(jax.random.key(1), (1, 8, 8, 64))
    m = jax.random.normal(jax.random.key(2), (1, 8, 8, 16))
    w = jax.random.normal(jax.random.key(3), (3, 3, 144, 64)) * 0.1
    b = jax.random.normal(jax.random.key(4), (64,)) * 0.1
    xp = jnp.concatenate([pack_w(a), pack_w(s), pack_w(m)], axis=-1)
    ref = packed_conv3x3(xp, w, b, segments=[64, 64, 16])
    got = packed_conv3x3(xp, w, b, segments=[64, 64, 16],
                         k_split=[(0, 1), (2,)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_resblock_ksplit_exact():
    """Unpacked decoder ResBlock with the K-tile split conv1 == baseline on
    the same params."""
    from instancediff_tpu.models.unet import ResBlock

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 144))
    temb = jax.random.normal(jax.random.key(1), (1, 32))
    base = ResBlock(out_ch=64, concat_widths=(64, 64, 16), ksplit=False)
    split = ResBlock(out_ch=64, concat_widths=(64, 64, 16), ksplit=True)
    params = base.init(jax.random.key(2), x, temb)
    ref = base.apply(params, x, temb)
    got = split.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unet_ksplit_dec_matches_standard():
    """Full UNet cloned with ksplit_dec=True (both packed and unpacked paths)
    on the SAME params produces identical predictions."""
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
    for clone_kw in ({"ksplit_dec": True},
                     {"ksplit_dec": True, "packed_l0": True}):
        got, _ = net.clone(**clone_kw).apply(
            params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_packed_conv3x3_decomp_exact():
    """The 4-tap input-grouped decomposition (decomp=True) == the dense
    transformed-kernel conv, including multi-segment inputs and bias."""
    a = jax.random.normal(jax.random.key(0), (1, 8, 8, 64))
    s = jax.random.normal(jax.random.key(1), (1, 8, 8, 64))
    m = jax.random.normal(jax.random.key(2), (1, 8, 8, 16))
    w = jax.random.normal(jax.random.key(3), (3, 3, 144, 64)) * 0.1
    b = jax.random.normal(jax.random.key(4), (64,)) * 0.1
    xp = jnp.concatenate([pack_w(a), pack_w(s), pack_w(m)], axis=-1)
    ref = packed_conv3x3(xp, w, b, segments=[64, 64, 16])
    for mode in ("tap4", "pair"):
        got = packed_conv3x3(xp, w, b, segments=[64, 64, 16], decomp=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # single segment, against the plain logical conv
        ref2 = _conv(a, w[:, :, :64, :]) + b
        got2 = unpack_w(packed_conv3x3(pack_w(a), w[:, :, :64, :], b,
                                       decomp=mode))
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=2e-5, rtol=2e-5)


def test_packed_conv3x3_tapsum_exact():
    """The tap-stacked-matmul formulation (conv_out path) == the dense
    transformed-kernel conv, with bias and tiny output widths."""
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64))
    w = jax.random.normal(jax.random.key(1), (3, 3, 64, 5)) * 0.2
    b = jax.random.normal(jax.random.key(2), (5,)) * 0.1
    xp = pack_w(x)
    ref = packed_conv3x3(xp, w, b, segments=[64])
    got = packed_conv3x3_tapsum(xp, w, b, segments=[64])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # and against the plain logical conv
    ref2 = _conv(x, w) + b
    np.testing.assert_allclose(np.asarray(unpack_w(got)), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_unet_tapsum_out_matches_standard():
    """Full UNet cloned with packed_l0 + tapsum_out on the SAME params
    produces identical predictions to the plain forward (default sampler
    configuration on TPU)."""
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
    got, _ = net.clone(packed_l0=True, tapsum_out=True).apply(
        params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_unet_decomp_l0_matches_standard():
    """Full UNet cloned with packed_l0 + decomp_l0 on the SAME params
    produces identical predictions to the plain forward."""
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
    for mode in ("tap4", "pair"):
        got, _ = net.clone(packed_l0=True, decomp_l0=mode).apply(
            params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_shift_alternating_conv_pair_exact():
    """conv3x3_std_to_shift -> mask -> conv3x3_shift_to_std == two plain
    SAME convs (the shift-alternating 1.33x-FLOPs path, engine.shift_l0)."""
    from instancediff_tpu.ops.packed_l0 import (
        conv3x3_shift_to_std, conv3x3_std_to_shift, shifted_pad_mask)

    x = jax.random.normal(jax.random.key(0), (2, 8, 12, 6))
    w1 = jax.random.normal(jax.random.key(1), (3, 3, 6, 5)) * 0.3
    w2 = jax.random.normal(jax.random.key(2), (3, 3, 5, 4)) * 0.3
    b2 = jax.random.normal(jax.random.key(3), (4,)) * 0.1
    ref = _conv(_conv(x, w1), w2) + b2
    q = conv3x3_std_to_shift(pack_w(x), w1)
    q = q * shifted_pad_mask(q.shape[2], q.shape[3], q.dtype)[None, None]
    got = unpack_w(conv3x3_shift_to_std(q, w2, b2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    # multi-segment (decoder concat) input
    a, c = x[..., :4], x[..., 4:]
    xp = jnp.concatenate([pack_w(a), pack_w(c)], axis=-1)
    q = conv3x3_std_to_shift(xp, w1, segments=[4, 2])
    q = q * shifted_pad_mask(q.shape[2], q.shape[3], q.dtype)[None, None]
    got = unpack_w(conv3x3_shift_to_std(q, w2, b2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_gn_silu_shifted_exact():
    """GroupNorm+SiLU on a shifted tensor (pads masked, real-pixel counts)
    == the plain reference on the unpacked equivalent."""
    from instancediff_tpu.ops.packed_l0 import (
        conv3x3_std_to_shift, gn_silu_shifted)

    x = jax.random.normal(jax.random.key(0), (2, 8, 12, 6))
    w1 = jax.random.normal(jax.random.key(1), (3, 3, 6, 4)) * 0.3
    gamma = jax.random.normal(jax.random.key(2), (4,))
    beta = jax.random.normal(jax.random.key(3), (4,)) * 0.1
    mid = _conv(x, w1)
    ref = group_norm_silu_reference(mid, gamma, beta, 2)
    q = conv3x3_std_to_shift(pack_w(x), w1)  # pads NOT pre-masked
    got = gn_silu_shifted(q, gamma, beta, 2)
    # reconstruct unpacked from the shifted layout: col j = (o[2j-1], o[2j])
    Co, Wp = 4, 6
    lo, hi = got[..., :Co], got[..., Co:]
    rec = jnp.zeros(mid.shape, got.dtype)
    rec = rec.at[:, :, 0::2].set(hi[:, :, 0:Wp])
    rec = rec.at[:, :, 1::2].set(lo[:, :, 1:Wp + 1])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # the two pad half-columns come out exactly zero (conv padding contract)
    assert float(jnp.abs(got[:, :, 0, :Co]).max()) == 0.0
    assert float(jnp.abs(got[:, :, -1, Co:]).max()) == 0.0


def test_unet_shift_l0_matches_standard():
    """Full UNet cloned with packed_l0 + shift_l0 on the SAME params
    produces identical predictions to the plain forward."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=2)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, ref_sms = net.apply(params, x_a, x_b, t, ty,
                             text_embs=text_embs, image_context=ctx)
    got, got_sms = net.clone(packed_l0=True, shift_l0=True).apply(
        params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(got_sms, ref_sms):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_prepack_params_matches_runtime_packing():
    """Applying the packed UNet with prepack_params-transformed kernels
    (the out-of-scan hoist) is bit-identical to runtime packing, for both
    the dense and the shift-alternating paths."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=2)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    for kw in ({"packed_l0": True, "tapsum_out": True},
               {"packed_l0": True, "shift_l0": True, "tapsum_out": True}):
        pnet = net.clone(**kw)
        ref, ref_sms = pnet.apply(params, x_a, x_b, t, ty,
                                  text_embs=text_embs, image_context=ctx)
        pp = pnet.prepack_params(params)
        # the transform really happened (packed sibling leaves added)
        assert pp["params"]["conv_in"]["kernel_packed"].shape[2] == 4  # 2*(1+1)
        got, got_sms = pnet.apply(pp, x_a, x_b, t, ty,
                                  text_embs=text_embs, image_context=ctx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        for a, b in zip(got_sms, ref_sms):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_transpose_subpix_exact():
    """Sub-pixel ConvTranspose (one dense (2,2) conv + phase interleave) ==
    lax.conv_transpose (4,4)/s2 SAME, for the unpacked and packed-output
    variants, with bias, raw and pre-packed kernels."""
    x = jax.random.normal(jax.random.key(0), (2, 5, 4, 6))
    w = jax.random.normal(jax.random.key(1), (4, 4, 6, 3)) * 0.3
    b = jax.random.normal(jax.random.key(2), (3,)) * 0.1
    ref = jax.lax.conv_transpose(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    for k in (w, pack_kernel_up_subpix(w)):
        got = conv_transpose_subpix(x, k, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)
        gotp = unpack_w(packed_up_conv_subpix(x, k, b))
        np.testing.assert_allclose(np.asarray(gotp), np.asarray(ref),
                                   atol=2e-6)


def test_unet_subpix_up_matches_standard():
    """Full 3-level UNet cloned with packed_l0 + shift_l0 + subpix_up (so
    both the packed up_0 boundary and the unpacked up_1 take the sub-pixel
    path) matches the plain forward on the SAME params."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1, 2), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=2)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(3)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, ref_sms = net.apply(params, x_a, x_b, t, ty,
                             text_embs=text_embs, image_context=ctx)
    pnet = net.clone(packed_l0=True, shift_l0=True, subpix_up=True)
    got, got_sms = pnet.apply(params, x_a, x_b, t, ty,
                              text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(got_sms, ref_sms):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    # prepack hoist is bit-identical and really transforms the up kernels
    pp = pnet.prepack_params(params)
    assert pp["params"]["up_0"]["kernel_packed"].shape[:2] == (2, 2)
    assert pp["params"]["up_1"]["kernel_packed"].shape[:2] == (2, 2)
    got2, _ = pnet.apply(pp, x_a, x_b, t, ty,
                         text_embs=text_embs, image_context=ctx)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_packed_l0_fallback_raises_informative():
    """A packed_l0 UNet asked to run an unsupported shape (odd width) fails
    with the reason instead of crashing inside the param-holder modules."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1,
        packed_l0=True)
    x = jax.random.normal(jax.random.key(0), (1, 10, 9, 1))  # odd width
    t = jnp.array([1], jnp.int32)
    ty = jnp.zeros((1,), jnp.int32)
    text_embs = [jnp.zeros((5, 16))] * 2
    with pytest.raises(ValueError, match="packed_l0 forward requires"):
        net.init(jax.random.key(1), x, x, t, ty, text_embs=text_embs,
                 image_context=jnp.zeros((1, 1, 16)))


def test_sampler_heterogeneous_nets_fall_back_sequential():
    """build_sample_fn must not stack heterogeneous dual-net param trees
    (fusion requires identical architectures)."""
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    d = dict(in_nc=2, out_nc=5, nf=8, ch_mult=[1, 2], context_dim=16,
             text_module="scoremap", score_map_chan=4, if_MultiScoreMap=True,
             num_res_blocks=1)
    n = dict(d, nf=4)  # different width => fusion impossible
    eng = CLIPDriftEngine(
        dnet_settings=d, nnet_settings=n, score_map_ch_mult=(1, 1),
        score_map_ngf=8, use_image_context=True, CLIP_Type="CLIP",
        tiny_text_encoder=True, sde=DriftSDE(T=3, max_sigma=0.4),
        image_size=8, if_train=False, seed=0)
    mu = jax.random.uniform(jax.random.key(1), (2, 8, 8, 1)) * 2 - 1
    out = eng.test({"input": mu, "type_idx": jnp.zeros((2,), jnp.int32),
                    "A_emb": jnp.zeros((2, 1, 16))},
                   jax.random.key(2), use_ema=False)
    assert out.shape == mu.shape and bool(jnp.isfinite(out).all())


def test_unet_presum_dec_matches_standard():
    """Full UNet cloned with presum_dec (concat-free decoder j==0 blocks,
    VERDICT r3 item 1a) on the SAME params must match: unpacked, packed,
    and packed+shift variants (exact by linearity of conv/1x1 in the input
    segments; GN stats combine per-part sums)."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, ref_sms = net.apply(params, x_a, x_b, t, ty,
                             text_embs=text_embs, image_context=ctx)
    for clone_kw in ({"presum_dec": True},
                     {"presum_dec": "tailmat"},
                     {"packed_l0": True, "presum_dec": True},
                     {"packed_l0": True, "presum_dec": "tailmat"},
                     {"packed_l0": True, "shift_l0": True,
                      "presum_dec": True},
                     {"packed_l0": True, "shift_l0": True,
                      "presum_dec": "tailmat"},
                     # "smmtail": tailmat's thin-tail im2col WITHOUT the
                     # conv_in im2col (conv_in keeps its fused conv form)
                     {"packed_l0": True, "shift_l0": True,
                      "presum_dec": "smmtail"},
                     # "inmat": ONLY conv_in goes through the im2col matmul;
                     # decoder blocks keep the stock concat path
                     {"packed_l0": True, "shift_l0": True,
                      "presum_dec": "inmat"}):
        got, got_sms = net.clone(**clone_kw).apply(
            params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4, err_msg=str(clone_kw))
        for a, b in zip(got_sms, ref_sms):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=str(clone_kw))


def test_presum_dec_with_prepacked_kernels():
    """presum_dec must also be exact when prepack_params pre-transformed the
    level-0 kernels (the sampler hoists kernel packing out of the scan): the
    *_parts ops slice the PRE-PACKED kernels per segment."""
    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 2, 32
    x_a = jax.random.normal(jax.random.key(0), (B, H, H, 1))
    x_b = jax.random.normal(jax.random.key(1), (B, H, H, 1))
    t = jnp.array([3, 7], jnp.int32)
    ty = jnp.array([0, 2], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 1, 16)) * 0.1
    text_embs = [jax.random.normal(jax.random.key(3 + i), (5, 16)) * 0.1
                 for i in range(2)]
    params = net.init(jax.random.key(9), x_a, x_b, t, ty,
                      text_embs=text_embs, image_context=ctx)
    ref, _ = net.apply(params, x_a, x_b, t, ty,
                       text_embs=text_embs, image_context=ctx)
    for shift in (True, False):
        for mode in (True, "tailmat", "smmtail"):
            sampler = net.clone(packed_l0=True, shift_l0=shift,
                                presum_dec=mode, tapsum_out=True)
            pre = sampler.prepack_params(params)
            got, _ = sampler.apply(pre, x_a, x_b, t, ty,
                                   text_embs=text_embs, image_context=ctx)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=f"shift={shift} mode={mode}")
