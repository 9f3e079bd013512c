"""Attention compute ops.

TPU-native replacement for the reference's attention substrate: einsum MHA and
the optional flash-attn CUDA path (_modified_BiomedCLIP.py:448-517). On TPU the
XLA path below compiles to fused MXU matmuls for the short sequences this
framework sees (<=257 tokens: ViT-B/16 at 224^2 -> 197, BERT 256, CLIP text 42).
A Pallas block-softmax kernel (ops/pallas/flash_attention.py) is used for the
longer spatial sequences inside the UNet when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(q, k, v, mask=None, scale=None):
    """Batched scaled dot-product attention.

    q: [..., Lq, D], k/v: [..., Lk, D]; mask broadcastable to [..., Lq, Lk]
    (additive, -inf for masked). fp32 softmax accumulation regardless of the
    input dtype (bf16-safe)."""
    d = q.shape[-1]
    scale = (d**-0.5) if scale is None else scale
    # accumulate the QK product in f32 directly (a post-hoc convert both adds
    # a node and loses the f32 partials to a bf16 round-trip)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", weights, v)


def drop_path(key, x, rate):
    """Per-sample stochastic depth on a residual branch (reference DropPath,
    _modified_BiomedCLIP.py:328-340 / timm ``drop_path``): zero the branch for
    a random subset of samples and rescale survivors by 1/keep. Identity at
    rate<=0 (the reference's default — DropPath is plumbed but off)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(key, shape, dtype=x.dtype))
    return x / keep * mask


def multi_head_attention(q, k, v, num_heads, mask=None, qkv_clamp=None):
    """Split-head attention over the last dim. q: [B, Lq, C], k/v: [B, Lk, C].

    Returns [B, Lq, C]. The projection matrices live in the calling flax
    module; this op is the pure compute core. ``qkv_clamp`` bounds q/k/v to
    +-clamp before the product — the low-precision overflow guard of the
    reference's ``Attention_flash`` fp16 path
    (_modified_BiomedCLIP.py:509-513, clamp 255)."""
    if qkv_clamp is not None:
        q = jnp.clip(q, -qkv_clamp, qkv_clamp)
        k = jnp.clip(k, -qkv_clamp, qkv_clamp)
        v = jnp.clip(v, -qkv_clamp, qkv_clamp)
    B, Lq, C = q.shape
    Lk = k.shape[1]
    Dh = C // num_heads

    def split(x, L):
        return x.reshape(B, L, num_heads, Dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    if mask is not None and mask.ndim == 3:
        mask = mask[:, None]  # broadcast over heads
    out = dot_product_attention(qh, kh, vh, mask=mask)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
