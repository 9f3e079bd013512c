"""Alias module: the reference config addresses the multi-score-map UNet as
``modules.MSM_degEmb_Unet.LearnableForwardUNet_MultiScoreMap``
(config.yml:107-108); the implementation lives in unet.py."""

from .unet import (  # noqa: F401
    LearnableForwardUNetMultiScoreMap,
    LearnableForwardUNetMultiScoreMap as LearnableForwardUNet_MultiScoreMap,
)
from .scoremap import ScoreMapModule  # noqa: F401
