"""Alias module: the reference config addresses the single-score-map UNet as
``modules.LearnableFDUnet.LearnableForwardUNet`` (config.yml:153-154); the
implementation lives in unet.py."""

from .unet import LearnableForwardUNet  # noqa: F401
