"""Pallas kernel correctness vs jnp references (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.ops.pallas_kernels import (
    flash_attention,
    flash_attention_reference,
    group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 16), 4), ((1, 4, 4, 8), 8)])
def test_group_norm_silu_matches_reference(shape, groups):
    k = jax.random.key(0)
    x = jax.random.normal(k, shape) * 2 + 0.5
    C = shape[-1]
    gamma = jax.random.normal(jax.random.fold_in(k, 1), (C,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.fold_in(k, 2), (C,)) * 0.1
    ref = group_norm_silu_reference(x, gamma, beta, groups)
    got = group_norm_silu(x, gamma, beta, groups, tile_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_group_norm_silu_multi_tile_stats():
    """Statistics must be exact when spatial tiling splits the reduction."""
    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 8))
    gamma, beta = jnp.ones((8,)), jnp.zeros((8,))
    ref = group_norm_silu_reference(x, gamma, beta, 2)
    got = group_norm_silu(x, gamma, beta, 2, tile_rows=8, interpret=True)  # 8 tiles
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_group_norm_no_silu():
    x = jax.random.normal(jax.random.key(4), (1, 4, 4, 8))
    gamma, beta = jnp.ones((8,)), jnp.zeros((8,))
    ref = group_norm_silu_reference(x, gamma, beta, 4, silu=False)
    got = group_norm_silu(x, gamma, beta, 4, silu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n,d,tile", [(64, 16, 32), (128, 8, 64)])
def test_flash_attention_matches_reference(n, d, tile):
    k = jax.random.key(0)
    q = jax.random.normal(k, (2, 2, n, d))
    kk = jax.random.normal(jax.random.fold_in(k, 1), (2, 2, n, d))
    v = jax.random.normal(jax.random.fold_in(k, 2), (2, 2, n, d))
    ref = flash_attention_reference(q, kk, v)
    got = flash_attention(q, kk, v, q_tile=tile, kv_tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_flash_attention_ragged_falls_back():
    q = jax.random.normal(jax.random.key(0), (1, 1, 48, 8))
    out = flash_attention(q, q, q, q_tile=32, kv_tile=32)  # 48 % 32 != 0
    ref = flash_attention_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_attention_bf16_stable():
    """bf16 inputs: the kernel's fp32 accumulation must be at least as close
    to fp32 ground truth as the bf16 jnp path."""
    q = (jax.random.normal(jax.random.key(1), (1, 2, 64, 16)) * 4).astype(jnp.bfloat16)
    truth = flash_attention_reference(
        q.astype(jnp.float32), q.astype(jnp.float32), q.astype(jnp.float32))
    got = flash_attention(q, q, q, q_tile=32, kv_tile=32, interpret=True).astype(jnp.float32)
    ref_bf16 = flash_attention_reference(q, q, q).astype(jnp.float32)
    kernel_err = float(jnp.max(jnp.abs(got - truth)))
    ref_err = float(jnp.max(jnp.abs(ref_bf16 - truth)))
    assert kernel_err < 5e-2
    assert kernel_err <= ref_err


def test_fused_gn_module_backend_equivalence():
    """FusedGroupNormSiLU: one param tree must drive both backends with
    identical values (the sampler swaps backends via Module.clone)."""
    import jax

    from instancediff_tpu.models.unet import FusedGroupNormSiLU

    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8)) + 0.3
    ref_mod = FusedGroupNormSiLU(4, use_pallas=False)
    params = ref_mod.init(jax.random.key(1), x)
    out_ref = ref_mod.apply(params, x)
    out_pallas = FusedGroupNormSiLU(4, use_pallas=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_gn_channel_affine_matches_groupnorm():
    from instancediff_tpu.ops.pallas_kernels import (
        gn_channel_affine, group_norm_silu_reference)

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16)) * 1.7 + 0.4
    gamma = jax.random.normal(jax.random.key(1), (16,)) * 0.2 + 1.0
    beta = jax.random.normal(jax.random.key(2), (16,)) * 0.1
    scale, shift = gn_channel_affine(x, gamma, beta, num_groups=4)
    lin = x * scale[:, None, None, :] + shift[:, None, None, :]
    ref = group_norm_silu_reference(x, gamma, beta, 4, silu=False)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("with_res", [False, True])
def test_fused_gn_silu_conv3x3_kernel(with_res):
    """Pallas fused normalize+SiLU+conv (interpret mode) vs jnp reference."""
    from instancediff_tpu.ops.pallas_kernels import (
        fused_gn_silu_conv3x3, fused_gn_silu_conv3x3_reference)

    B, H, W, C, Cout = 2, 8, 8, 16, 8
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    scale = jax.random.normal(jax.random.key(1), (B, C)) * 0.1 + 1.0
    shift = jax.random.normal(jax.random.key(2), (B, C)) * 0.2
    w = jax.random.normal(jax.random.key(3), (3, 3, C, Cout)) * 0.1
    bias = jax.random.normal(jax.random.key(4), (B, Cout)) * 0.3
    res = jax.random.normal(jax.random.key(5), (B, H, W, Cout)) if with_res else None
    ref = fused_gn_silu_conv3x3_reference(x, scale, shift, w, bias, res)
    got = fused_gn_silu_conv3x3(x, scale, shift, w, bias, res,
                                row_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unet_fused_gnconv_path_matches_standard():
    """A UNet cloned with use_fused_gnconv=True must produce (near-)identical
    outputs from the SAME param tree — the sampler swaps paths via clone."""
    import jax.numpy as jnp

    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 2, 16
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
    fused_net = net.clone(use_fused_gnconv=True)
    got, got_sms = fused_net.apply(params, x_a, x_b, t, ty,
                                   text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(got_sms, ref_sms):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_packed_conv3x3_exact():
    """Width-packed conv == plain lax conv (SAME) bit-for-bit in f32."""
    from instancediff_tpu.ops.packed_conv import packed_conv3x3

    for (B, H, W, C, Co) in [(2, 8, 8, 4, 6), (1, 4, 6, 3, 5), (2, 6, 7, 4, 4)]:
        x = jax.random.normal(jax.random.key(0), (B, H, W, C))
        w = jax.random.normal(jax.random.key(1), (3, 3, C, Co)) * 0.3
        b = jax.random.normal(jax.random.key(2), (Co,)) * 0.1
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                           dimension_numbers=dn) + b
        got = packed_conv3x3(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)


def test_unet_packed_conv_path_matches_standard():
    """clone(use_packed_conv=True) on the same params is value-identical."""
    import jax.numpy as jnp

    from instancediff_tpu.models.unet import LearnableForwardUNetMultiScoreMap

    net = LearnableForwardUNetMultiScoreMap(
        in_nc=2, out_nc=5, nf=8, ch_mult=(1, 2), context_dim=16,
        score_map_chan=4, score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, token_embed_dim=16, num_res_blocks=1)
    B, H = 2, 16
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
    got, _ = net.clone(use_packed_conv=True).apply(
        params, x_a, x_b, t, ty, text_embs=text_embs, image_context=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
