"""Minor parity details (VERDICT r2 missing #6): DropPath, the fp16-clamp
attention variant, and the antialiased-resize tolerance claim — demonstrated,
not asserted."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediff_tpu.models.text_encoder import TransformerBlock
from instancediff_tpu.ops.attention import drop_path, multi_head_attention
from instancediff_tpu.ops.resize import downsample_label


def test_drop_path_semantics():
    """timm/reference drop_path: per-sample binary gate, survivors rescaled by
    1/keep, identity at rate 0 (reference default)."""
    x = jnp.ones((512, 4, 4))
    assert drop_path(jax.random.key(0), x, 0.0) is x
    y = np.asarray(drop_path(jax.random.key(1), x, 0.3))
    per_sample = y[:, 0, 0]
    assert set(np.round(per_sample, 5)) <= {0.0, np.float32(round(1 / 0.7, 5))}
    # whole samples are gated together
    assert np.all((y == 0).all(axis=(1, 2)) | (y > 0).all(axis=(1, 2)))
    # unbiased in expectation
    assert abs(per_sample.mean() - 1.0) < 0.1


def test_transformer_block_drop_path_and_clamp():
    blk = TransformerBlock(width=16, heads=2, drop_path_rate=0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6, 16)),
                    jnp.float32)
    params = blk.init(jax.random.key(0), x)
    base = blk.apply(params, x)  # deterministic default: DropPath inactive
    base2 = blk.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(base2))

    y1 = blk.apply(params, x, deterministic=False,
                   rngs={"drop_path": jax.random.key(1)})
    y2 = blk.apply(params, x, deterministic=False,
                   rngs={"drop_path": jax.random.key(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    # qkv clamp (Attention_flash :509-513): bounded inputs pass unchanged
    out_ref = multi_head_attention(x, x, x, 2)
    out_clamped = multi_head_attention(x, x, x, 2, qkv_clamp=255.0)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_clamped),
                               atol=1e-6)
    big = x * 1e4
    out_big = multi_head_attention(big, big, big, 2, qkv_clamp=255.0)
    assert np.abs(np.asarray(out_big)).max() <= 255.0 + 1e-3


def test_downsample_matches_torch_antialiased_bilinear():
    """The score-map pyramid downsample equals torchvision's antialiased
    bilinear (the reference's Resize semantics, drift_noise_model.py:234-240)
    to float32 roundoff for the power-of-two factors used."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for mult in (2, 4, 8):
        ours = np.asarray(downsample_label(x, mult))
        ref = F.interpolate(xt, scale_factor=1.0 / mult, mode="bilinear",
                            antialias=True, align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-7)
