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


def multi_head_attention(q, k, v, num_heads, mask=None):
    """Split-head attention over the last dim. q: [B, Lq, C], k/v: [B, Lk, C].

    Returns [B, Lq, C]. The projection matrices live in the calling flax
    module; this op is the pure compute core."""
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
