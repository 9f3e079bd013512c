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
