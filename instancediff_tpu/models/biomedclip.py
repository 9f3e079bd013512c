"""BiomedCLIP / CLIP combined model wrapper.

Capability parity with the vendored open_clip fork (SURVEY.md SS2.7):
``models/BiomedCLIP/__init__.py:7 get_BiomedCLIP()`` returns a contrastive
image/text model used offline to precompute the ``emb_A`` image embeddings;
``model.py:311-377 CustomTextCLIP`` exposes ``encode_image`` /
``encode_text`` with L2-normalised outputs and a learnable logit scale.

TPU-native implementation: the flax ViT-B/16 tower (clip_vit.py) + the
PubMedBERT text tower (text_encoder.py), a WordPiece tokenizer over the local
vocab assets, and jitted encode functions. Weights load from a torch
open_clip checkpoint when one exists (unreleased upstream —
``open_clip_pytorch_model.bin`` is a TODO in the reference); random frozen
weights otherwise (embeddings are then only self-consistent, which is what
the synthetic pipeline needs).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vit import CLIPVisionTower, load_torch_clip_vision_weights
from .text_encoder import HFContextTextEncoder, CLIPTextContextEncoder
from .tokenizer import BertWordPieceTokenizer, ClipBPETokenizer

PRECISIONS = ("fp32", "fp16", "bf16", "pure_fp16", "pure_bf16")


def get_cast_dtype(precision: str):
    """Weight/compute cast dtype for a precision string (reference
    model.py:86-92 ``get_cast_dtype``: 'bf16'->bfloat16, 'fp16'->float16,
    else None). 'pure_*' returns None here, as upstream — the pure variants
    cast via ``get_input_dtype``/full-model cast instead."""
    if precision == "bf16":
        return jnp.bfloat16
    if precision == "fp16":
        return jnp.float16
    return None


def get_input_dtype(precision: str):
    """Input-pixel dtype for a precision string (reference model.py:95-101
    ``get_input_dtype``: bf16/pure_bf16 -> bfloat16, fp16/pure_fp16 ->
    float16, else None = keep fp32)."""
    if precision in ("bf16", "pure_bf16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.float16
    return None


def _precision_dtypes(precision):
    """(compute_dtype, param_cast_dtype, input_dtype) for the five reference
    precision strings (__init__.py:156-179 casting semantics, translated):
      fp32       -> fp32 everywhere;
      fp16/bf16  -> low-precision compute with fp32 master params — the JAX
                    analogue of upstream's cast-weights-except-LayerNormFp32
                    (our towers' ``dtype`` arg already keeps norm statistics
                    in fp32 islands; params stay fp32, entering the MXU as
                    bf16, the measured-parity TPU recipe, PERF.md);
      pure_*     -> params ALSO cast (model.to(dtype) upstream)."""
    if precision is None or precision == "fp32":
        return jnp.float32, None, None
    if precision not in PRECISIONS:
        raise ValueError(
            f"unknown precision {precision!r}; choose from {PRECISIONS}")
    low = jnp.bfloat16 if "bf16" in precision else jnp.float16
    cast_params = low if precision.startswith("pure_") else None
    return low, cast_params, get_input_dtype(precision)


class BiomedCLIP:
    """Contrastive wrapper: ``encode_image(imgs) -> [B,E]``,
    ``encode_text(list[str]) -> [K,E]``, both L2-normalised."""

    def __init__(self, clip_type="BiomedCLIP", embed_dim=512, seed=0,
                 vocab_path=None, checkpoint_path=None, tiny=False,
                 dtype=jnp.float32, vision_tower="vit",
                 rn_layers=(3, 4, 6, 3), rn_width=64, precision=None):
        self.clip_type = clip_type
        self.embed_dim = embed_dim
        # precision strings ('fp16'/'bf16'/'pure_*') override the raw dtype
        # arg — the loadable-by-string surface of the vendored
        # create_model_from_pretrained (model.py:86-101, __init__.py:156-179)
        self.precision = precision or "fp32"
        compute_dtype, param_cast, self.input_dtype = _precision_dtypes(precision)
        if precision is not None:
            dtype = compute_dtype
        key = jax.random.key(seed)
        kv, kt = jax.random.split(key)

        if vision_tower == "resnet":
            # OpenAI RN-family visual (vendored modified_resnet.py); attnpool
            # heads follow OpenAI's C // 64 rule at C = width * 32
            from .vision_towers import ModifiedResNet

            if tiny:
                rn_layers, rn_width = (1, 1, 1, 1), 8
            self.visual = ModifiedResNet(
                layers=tuple(rn_layers), width=rn_width,
                output_dim=embed_dim, heads=max(1, rn_width * 32 // 64),
                openai_normalize=True, dtype=dtype)
            probe_img = jnp.zeros((1, 32, 32, 1) if tiny else (1, 224, 224, 1))
        else:
            # provenance-exact ViT flavour: BiomedCLIP = timm ViT (exact GELU,
            # LN eps 1e-6, no ln_pre); CLIP = OpenAI ViT (QuickGELU, eps 1e-5,
            # visual.ln_pre before the transformer)
            flavour = (dict(act="quick_gelu", ln_eps=1e-5, use_ln_pre=True)
                       if clip_type == "CLIP"
                       else dict(act="gelu", ln_eps=1e-6, use_ln_pre=False))
            if tiny:
                self.visual = CLIPVisionTower(image_size=32, patch_size=8,
                                              width=32, layers=2, heads=4,
                                              embed_dim=embed_dim, dtype=dtype,
                                              **flavour)
                probe_img = jnp.zeros((1, 32, 32, 1))
            else:
                self.visual = CLIPVisionTower(embed_dim=embed_dim, dtype=dtype,
                                              **flavour)
                probe_img = jnp.zeros((1, 224, 224, 1))
        self.visual_params = jax.jit(lambda k: self.visual.init(k, probe_img))(kv)

        if clip_type == "BiomedCLIP":
            if tiny:
                self.text = HFContextTextEncoder(hidden=32, heads=4, layers=2,
                                                 proj_dim=embed_dim, vocab_size=512,
                                                 context_length=32, max_position=64,
                                                 dtype=dtype)
            else:
                self.text = HFContextTextEncoder(proj_dim=embed_dim, dtype=dtype)
            self.tokenizer = BertWordPieceTokenizer(
                vocab_path, context_length=self.text.context_length,
                vocab_size=self.text.vocab_size)
            probe_ids = jnp.zeros((1, self.text.context_length), jnp.int32)
            probe_mask = jnp.ones_like(probe_ids)
            self.text_params = jax.jit(
                lambda k: self.text.init(k, probe_ids, probe_mask, None))(kt)
        else:
            if tiny:
                self.text = CLIPTextContextEncoder(width=32, heads=4, layers=2,
                                                   embed_dim=embed_dim, vocab_size=512,
                                                   context_length=16, dtype=dtype)
            else:
                self.text = CLIPTextContextEncoder(embed_dim=embed_dim, dtype=dtype)
            self.tokenizer = ClipBPETokenizer(
                vocab_path, context_length=self.text.context_length,
                vocab_size=self.text.vocab_size)
            self.text_params = jax.jit(
                lambda k: self.text.init(
                    k, jnp.zeros((1, self.text.context_length), jnp.int32), None))(kt)

        self.logit_scale = float(np.log(1 / 0.07))  # open_clip init
        if checkpoint_path:
            self.visual_params = load_torch_clip_vision_weights(
                self.visual_params, checkpoint_path)
        if param_cast is not None:
            # 'pure_fp16'/'pure_bf16': the whole model lives in the low
            # precision (upstream model.to(device, dtype),
            # __init__.py:176-179) — cast AFTER any checkpoint load
            cast = lambda t: jax.tree.map(  # noqa: E731
                lambda x: x.astype(param_cast)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            self.visual_params = cast(self.visual_params)
            self.text_params = cast(self.text_params)

        self._encode_image = jax.jit(
            lambda p, x: self.visual.apply(p, x))

    def encode_image(self, images, normalize=True):
        """images: [B,H,W,1|3] in [-1,1] -> [B, embed_dim]."""
        images = jnp.asarray(images)
        if self.input_dtype is not None:  # get_input_dtype semantics
            images = images.astype(self.input_dtype)
        emb = self._encode_image(self.visual_params, images)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)
        return emb

    def encode_text(self, texts, normalize=True):
        if self.clip_type == "BiomedCLIP":
            ids, mask = self.tokenizer(texts)
            emb = self.text.apply(self.text_params, jnp.asarray(ids),
                                  jnp.asarray(mask), None)
        else:
            ids = self.tokenizer(texts)
            emb = self.text.apply(self.text_params, jnp.asarray(ids), None)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)
        return emb

    def __call__(self, images, texts):
        """Contrastive logits (CustomTextCLIP.forward analogue)."""
        ie = self.encode_image(images)
        te = self.encode_text(texts)
        scale = math.exp(self.logit_scale)
        return scale * ie @ te.T


def get_BiomedCLIP(vocab_path=None, checkpoint_path=None, tiny=False, seed=0,
                   precision=None):
    """Convenience loader (models/BiomedCLIP/__init__.py:7-19 analogue).
    Defaults the vocab to the reference's local asset when present.
    ``precision`` accepts the reference's loadable strings
    ('fp32'/'fp16'/'bf16'/'pure_fp16'/'pure_bf16', model.py:86-101)."""
    import os

    if vocab_path is None:
        cand = "/root/reference/models/BiomedCLIP/vocab.txt"
        vocab_path = cand if os.path.isfile(cand) else None
    return BiomedCLIP(clip_type="BiomedCLIP", vocab_path=vocab_path,
                      checkpoint_path=checkpoint_path, tiny=tiny, seed=seed,
                      precision=precision)
