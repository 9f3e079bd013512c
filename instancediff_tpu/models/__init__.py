"""Model factory — parity with reference models/__init__.py:4-13 (string-keyed
dynamic dispatch: ``train.which_model`` -> ``models.<name>.{module_name,
class_name}`` -> ``create_<class>``)."""

import importlib


def create_model(train_opt, model_opt, phase="train", **kwargs):
    module_name = model_opt["module_name"]
    class_name = model_opt["class_name"]
    module = importlib.import_module(f"{__package__}.{module_name}")
    factory = getattr(module, f"create_{class_name}")
    return factory(train_opt, model_opt, phase=phase, **kwargs)


from .unet import (  # noqa: E402
    LearnableForwardUNetMultiScoreMap,
    LearnableForwardUNet,
)
from .scoremap import ScoreMapModule  # noqa: E402
from .text_encoder import (  # noqa: E402
    CLIPTextContextEncoder,
    HFContextTextEncoder,
    build_text_encoder,
)
from .drift_model import CLIPDriftEngine, create_CLIPDriftModel  # noqa: E402

__all__ = [
    "create_model",
    "LearnableForwardUNetMultiScoreMap",
    "LearnableForwardUNet",
    "ScoreMapModule",
    "CLIPTextContextEncoder",
    "HFContextTextEncoder",
    "build_text_encoder",
    "CLIPDriftEngine",
    "create_CLIPDriftModel",
]
