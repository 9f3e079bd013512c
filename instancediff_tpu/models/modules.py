"""UNet factory — parity with the reference's missing ``models/modules/
__init__.py`` ``create_net`` (imported at drift_noise_model.py:22, used at
:142-143; keyed on ``module_name``/``class_name``, SURVEY.md SS2.9b).

In the functional design prompt modules are flax submodules of the UNet (the
checkpoint layer splits them back out as DP/NP), so ``CLIP_ScoreMapModule``
is accepted for signature parity but construction happens from settings.
"""

from __future__ import annotations

from .unet import LearnableForwardUNet, LearnableForwardUNetMultiScoreMap

_NET_REGISTRY = {
    "LearnableForwardUNet_MultiScoreMap": LearnableForwardUNetMultiScoreMap,
    "LearnableForwardUNet": LearnableForwardUNet,
    # legacy network_G entry (config.yml:53 which_model_G: ConditionalUNet)
    "ConditionalUNet": LearnableForwardUNet,
}


def create_net(settings, CLIP_ScoreMapModule=None, token_embed_dim=512,
               dtype=None):
    """Build a UNet flax module from an ``nnet_settings``/``dnet_settings``
    block (config.yml:106-131)."""
    import jax.numpy as jnp

    cls = _NET_REGISTRY.get(settings.get("class_name",
                                         "LearnableForwardUNet_MultiScoreMap"))
    if cls is None:
        raise ValueError(f"unknown net class '{settings.get('class_name')}'")
    return cls(
        in_nc=settings.get("in_nc", 2),
        out_nc=settings.get("out_nc", 5),
        nf=settings.get("nf", 64),
        ch_mult=tuple(settings.get("ch_mult", (1, 2, 4, 4))),
        context_dim=settings.get("context_dim", 512),
        text_module=settings.get("text_module", "scoremap"),
        score_map_chan=settings.get("score_map_chan", 16),
        if_MultiScoreMap=settings.get(
            "if_MultiScoreMap", cls is LearnableForwardUNetMultiScoreMap),
        score_map_ch_mult=tuple(settings.get("score_map_ch_mult", (1, 1, 2, 4))),
        score_map_ngf=settings.get("score_map_ngf", 64),
        use_image_context=settings.get("use_image_context", False),
        use_degra_context=settings.get("use_degra_context", False),
        token_embed_dim=token_embed_dim,
        num_res_blocks=settings.get("num_res_blocks", 2),
        dtype=dtype or jnp.float32,
    )
