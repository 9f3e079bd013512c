"""SigLIP / big_vision checkpoint loading.

TPU-native rebuild of the vendored fork's ``big_vision.py`` (reference
models/BiomedCLIP/BiomedCLIP/big_vision.py:9-134): load Google big_vision
``.npz`` image-text checkpoints (the official SigLIP releases) into this
package's towers.

big_vision checkpoints are themselves flax trees (``params/img/...``,
``params/txt/...``) with flax conventions — Dense kernels ``[in, out]``,
conv kernels ``[P, P, 3, width]`` — so unlike the reference (which
transposes everything into torch layouts, :16-28) the mapping here is a
rename: split the fused MultiHeadDotProductAttention heads back to
``[width, width]`` projections and copy.

SigLIP's image tower is a cls-token-free ViT with a MAP attention-pooling
head; this tower pools the class token, so the MAP head has no direct
destination and ``load_big_vision_weights`` maps the backbone (embedding,
pos-embed, encoder blocks, final norm) and head projection — the
conditioning-relevant subset — and reports what it skipped.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mha_proj(w, key):
    """big_vision [width, heads, head_dim] -> [width, width] (flax layout)."""
    a = np.asarray(w[key])
    return jnp.asarray(a.reshape(a.shape[0], -1) if a.ndim == 3
                       else a.reshape(-1, a.shape[-1]))


def load_big_vision_weights(params, checkpoint_path: str,
                            prefix: str = "params/img/") -> Tuple[dict, list]:
    """Map a big_vision .npz image tower onto ``CLIPVisionTower`` params.

    Returns ``(new_params, skipped_keys)``; raises KeyError if the backbone
    keys are absent (wrong prefix / not a big_vision checkpoint)."""
    w = np.load(checkpoint_path)
    new = jax.tree.map(lambda x: x, params)
    inner = new["params"]
    skipped = []

    k = f"{prefix}embedding/kernel"
    if k not in w:
        raise KeyError(f"{k} not in {checkpoint_path}: not a big_vision "
                       f"checkpoint or wrong prefix {prefix!r}")
    inner["patch_embed"]["kernel"] = jnp.asarray(w[k])
    inner["patch_embed"]["bias"] = jnp.asarray(w[f"{prefix}embedding/bias"])

    pos = np.asarray(w[f"{prefix}pos_embedding"])
    pos = pos.reshape(-1, pos.shape[-1])
    dst = inner["pos_embed"]
    if pos.shape[0] not in (dst.shape[0], dst.shape[0] - 1):
        # patch-grid mismatch (different input resolution): bicubic-resample
        # the cls-free source grid (timm resample_abs_pos_embed semantics,
        # reference big_vision.py:50-61 / pos_embed.py:75-96)
        from .pos_embed import interpolate_pos_embed

        pos = np.asarray(interpolate_pos_embed(
            pos, dst.shape[0] - 1, n_prefix=0))
        skipped.append("pos grid resampled "
                       f"{w[f'{prefix}pos_embedding'].size // pos.shape[-1]}"
                       f"->{dst.shape[0] - 1} tokens")
    if pos.shape[0] == dst.shape[0] - 1:
        # SigLIP has no cls token; keep this tower's learned cls position
        inner["pos_embed"] = jnp.concatenate(
            [jnp.asarray(dst[:1]), jnp.asarray(pos)], axis=0)
        skipped.append("cls pos (source has none)")
    else:
        inner["pos_embed"] = jnp.asarray(pos)
    if f"{prefix}cls" in w:
        inner["class_token"] = jnp.asarray(
            np.asarray(w[f"{prefix}cls"]).reshape(1, 1, -1))
    else:
        skipped.append("class_token (SigLIP is cls-free; kept random)")

    i = 0
    while f"block_{i}" in inner:
        bp = f"{prefix}Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        blk = inner[f"block_{i}"]
        blk["ln_1"]["scale"] = jnp.asarray(w[f"{bp}LayerNorm_0/scale"])
        blk["ln_1"]["bias"] = jnp.asarray(w[f"{bp}LayerNorm_0/bias"])
        for dst_name, src in (("q_proj", "query"), ("k_proj", "key"),
                              ("v_proj", "value")):
            blk[dst_name]["kernel"] = _mha_proj(w, f"{mha}{src}/kernel")
            blk[dst_name]["bias"] = jnp.asarray(
                np.asarray(w[f"{mha}{src}/bias"]).reshape(-1))
        out_k = np.asarray(w[f"{mha}out/kernel"])  # [heads, head_dim, width]
        blk["out_proj"]["kernel"] = jnp.asarray(
            out_k.reshape(-1, out_k.shape[-1]))
        blk["out_proj"]["bias"] = jnp.asarray(w[f"{mha}out/bias"])
        blk["ln_2"]["scale"] = jnp.asarray(w[f"{bp}LayerNorm_1/scale"])
        blk["ln_2"]["bias"] = jnp.asarray(w[f"{bp}LayerNorm_1/bias"])
        blk["fc"]["kernel"] = jnp.asarray(w[f"{bp}MlpBlock_0/Dense_0/kernel"])
        blk["fc"]["bias"] = jnp.asarray(w[f"{bp}MlpBlock_0/Dense_0/bias"])
        blk["proj"]["kernel"] = jnp.asarray(w[f"{bp}MlpBlock_0/Dense_1/kernel"])
        blk["proj"]["bias"] = jnp.asarray(w[f"{bp}MlpBlock_0/Dense_1/bias"])
        i += 1

    inner["ln_post"]["scale"] = jnp.asarray(
        w[f"{prefix}Transformer/encoder_norm/scale"])
    inner["ln_post"]["bias"] = jnp.asarray(
        w[f"{prefix}Transformer/encoder_norm/bias"])
    if f"{prefix}MAPHead_0/probe" in w:
        skipped.append("MAPHead attention pool (tower pools the cls token)")
    # SigLIP has no separate visual projection head on the trunk; the txt
    # head carries the contrastive projection. Keep this tower's proj.
    skipped.append("proj (no big_vision counterpart on the image trunk)")
    return new, skipped
