"""SDE factory — parity with the reference's missing ``models/SDEs/__init__``
``create_sde`` (used at trainUM.py:215-217 / testUM.py:91, keyed on
``sde_opt['class_name']``; SURVEY.md SS2.9a)."""

from .schedules import make_schedule, make_cosine_alphas_bar, schedule_increment
from .drift_sde import DriftSDE
from .ddpm_sde import DDPMSDE
from .ir_sde import IRSDE

_SDE_REGISTRY = {
    "driftSDE": DriftSDE,
    "DDPM": DDPMSDE,
    "IRSDE": IRSDE,
}


def create_sde(sde_opt):
    """Build an SDE from a ``sdes.<name>`` config block (config.yml:169-180).

    The reference signature is ``create_sde(nets, sde_opt)``; in the functional
    TPU design networks are supplied per sampling call as ``predict_fn``
    closures, so only the option block is needed here."""
    opt = dict(sde_opt)
    class_name = opt.pop("class_name")
    cls = _SDE_REGISTRY.get(class_name)
    if cls is None:
        raise ValueError(f"unknown SDE class '{class_name}' (have {list(_SDE_REGISTRY)})")
    if class_name == "driftSDE":
        return DriftSDE(
            T=opt.get("T", 100),
            max_sigma=opt.get("max_sigma", 0.4),
            drift_schedule=opt.get("drift_schedule", "sigmoid"),
            noise_schedule=opt.get("noise_schedule", "sigmoid"),
            eta=opt.get("eta", 1.0),
        )
    if class_name == "DDPM":
        return DDPMSDE(
            T=opt.get("T", 100),
            max_sigma=opt.get("max_sigma", 1.0),
            schedule=opt.get("schedule", "cosine_alpha"),
        )
    return cls(**{k: v for k, v in opt.items() if k in ("T", "max_sigma", "schedule", "eps")})


__all__ = [
    "create_sde",
    "DriftSDE",
    "DDPMSDE",
    "IRSDE",
    "make_schedule",
    "make_cosine_alphas_bar",
    "schedule_increment",
]
