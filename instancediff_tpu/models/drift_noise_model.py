"""Alias module: the reference config addresses the engine as
``models.drift_noise_model.CLIPDriftModel`` (config.yml:104-105); the
implementation lives in drift_model.py."""

from .drift_model import (  # noqa: F401
    CLIPDriftEngine,
    CLIPDriftEngine as CLIPDriftModel,
    create_CLIPDriftModel,
    cosine_annealing_lr,
    make_adam,
)
