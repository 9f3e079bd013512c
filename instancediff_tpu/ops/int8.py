"""Int8 convolution path (W8A8, dynamic activation scales).

v5e executes int8 x int8 -> int32 matmul/conv at 2x the bf16 MXU rate
(394 TOPS vs 197 TFLOP/s). The flagship sampler is compute-bound
(~2/3 of bf16 peak measured end-to-end at T=100, PERF.md round 3), so
quantizing the 3x3 conv contractions — weights per-output-channel, activations
per-tensor dynamic — trades a little elementwise traffic for halving the MXU
time of the dominant ops. GroupNorm statistics, softmax, the SDE solver and
all 1x1/score paths stay bf16/fp32.

Opt-in via ``engine.int8_conv``; quality must be validated per checkpoint
(testUM comparison — see PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """Per-output-channel symmetric int8: w [kh,kw,Ci,Co] -> (wq int8, scale
    [Co] f32). Zero-channels get scale 1 to avoid 0/0."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return wq, scale


def quantize_act(x):
    """Per-tensor symmetric dynamic int8 for activations."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return xq, scale


def int8_conv(x, w, b=None, strides=(1, 1), padding="SAME",
              lhs_dilation=None, out_dtype=jnp.bfloat16):
    """Quantized NHWC/HWIO conv: int8 x int8 -> int32 accumulate, dequantize
    with (act_scale * per-channel weight_scale), + bias. Drop-in for
    ``lax.conv_general_dilated`` at SAME/valid strides."""
    xq, xs = quantize_act(x)
    wq, ws = quantize_weight(w)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, lhs_dilation=lhs_dilation,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs * ws)[None, None, None, :]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
