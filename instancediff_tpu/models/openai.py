"""OpenAI-CLIP checkpoint loading.

TPU-native rebuild of the vendored fork's ``openai.py`` (reference
models/BiomedCLIP/BiomedCLIP/openai.py:19-91): resolve an OpenAI model name
or local path, read the torch.jit archive / state dict, and materialise a
working CLIP — here a :class:`~instancediff_tpu.models.biomedclip.BiomedCLIP`
wrapper (``clip_type="CLIP"``) whose BOTH towers carry the converted weights,
returned together with the matching eval preprocess callable.

Differences by design: no device/precision juggling (JAX handles placement;
params stay fp32 and cast inside the towers), and resolution is local-only
via :mod:`.pretrained` (egress-free hosts).
"""

from __future__ import annotations

import os
from typing import List, Optional

from .pretrained import (
    get_pretrained_cfg,
    download_pretrained,
    list_pretrained_models_by_tag,
)


def list_openai_models() -> List[str]:
    """Registry models carrying the 'openai' tag (reference openai.py:19-21)."""
    return list_pretrained_models_by_tag("openai")


def _load_state_dict(path: str):
    import torch

    try:
        obj = torch.load(path, map_location="cpu")
    except RuntimeError:
        obj = torch.jit.load(path, map_location="cpu").eval()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = {k[7:] if k.startswith("module.") else k: v
               for k, v in obj["state_dict"].items()}
    return obj


def load_openai_model(name: str, vocab_path: Optional[str] = None,
                      cache_dir: Optional[str] = None, embed_dim: int = 512,
                      tiny: bool = False):
    """Load an OpenAI CLIP by registry name or checkpoint path.

    Returns ``(model, preprocess)`` — the contract of reference
    openai.py:24-91 — where ``model`` is a :class:`BiomedCLIP` wrapper with
    converted text AND vision weights and ``preprocess`` the eval transform
    built from the registry's preprocessing cfg.
    """
    from .biomedclip import BiomedCLIP
    from .clip_vit import load_torch_clip_vision_weights
    from .text_encoder import load_torch_clip_text_weights
    from ..data.transforms import image_transform

    cfg = get_pretrained_cfg(name, "openai")
    if cfg:
        model_path = download_pretrained(cfg, cache_dir=cache_dir)
    elif os.path.isfile(name):
        model_path, cfg = name, {}
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {list_openai_models()}")

    sd = _load_state_dict(model_path)
    is_resnet = any(k.startswith("visual.layer1.") for k in sd)
    if "text_projection" in sd:  # RN50/RN101 embed at 1024; infer, don't guess
        embed_dim = int(sd["text_projection"].shape[1])
    if is_resnet:
        import numpy as np

        from .vision_towers import load_torch_clip_resnet_weights

        rn_width = int(np.asarray(sd["visual.conv1.weight"]).shape[0]) * 2
        rn_layers = tuple(
            1 + max((int(k.split(".")[2])  # visual.layer<s>.<block>....
                     for k in sd if k.startswith(f"visual.layer{s}.")),
                    default=0)
            for s in (1, 2, 3, 4))
        model = BiomedCLIP(clip_type="CLIP", embed_dim=embed_dim,
                           vocab_path=vocab_path, tiny=tiny,
                           vision_tower="resnet", rn_layers=rn_layers,
                           rn_width=rn_width)
        model.visual_params = {"params": load_torch_clip_resnet_weights(
            model.visual_params["params"], sd)}
    else:
        model = BiomedCLIP(clip_type="CLIP", embed_dim=embed_dim,
                           vocab_path=vocab_path, tiny=tiny)
        model.visual_params = load_torch_clip_vision_weights(
            model.visual_params, sd)
    model.text_params = load_torch_clip_text_weights(model.text_params, sd)
    if "logit_scale" in sd:
        model.logit_scale = float(sd["logit_scale"].detach().float().numpy())

    preprocess = image_transform(
        cfg.get("size", 224), is_train=False, mean=cfg.get("mean"),
        std=cfg.get("std"), resize_mode=cfg.get("resize_mode"),
        interpolation=cfg.get("interpolation"))
    return model, preprocess
