from .attention import multi_head_attention, dot_product_attention
from .resize import resize_like, downsample_label
from .degradations import add_gaussian_noise, add_speckle, low_dose_sim, apply_degradation

__all__ = [
    "multi_head_attention",
    "dot_product_attention",
    "resize_like",
    "downsample_label",
    "add_gaussian_noise",
    "add_speckle",
    "low_dose_sim",
    "apply_degradation",
]
