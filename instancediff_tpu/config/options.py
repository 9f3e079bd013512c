"""YAML option parsing with the reference's schema and semantics.

Capability parity with reference `options.py` (see /root/reference/options.py:19-143):
  * ``parse(opt_path, is_train)``   -- load + normalise an experiment config
  * ``NoneDict`` / ``dict_to_nonedict`` -- missing keys read as ``None``
  * ``check_resume``                -- rewrite pretrain paths from a resume state
  * ordered YAML round-trip helpers

The TPU build keeps the YAML schema verbatim (BASELINE.json requires it) while
being backend-agnostic: instead of exporting ``CUDA_VISIBLE_DEVICES`` we record
the requested device count and let ``jax`` own device selection.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from collections import OrderedDict

import yaml

logger = logging.getLogger("instancediff_tpu")


def ordered_yaml():
    """Return (Loader, Dumper) that preserve mapping order.

    Reference: OrderedYaml in utils/file_utils.py:25-36.
    """
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(tag, dict_constructor)
    return Loader, Dumper


class NoneDict(dict):
    """dict whose missing keys read as ``None`` (reference options.py:105-108)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert dicts to :class:`NoneDict` (reference options.py:111-120)."""
    if isinstance(opt, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, (list, tuple)):
        return type(opt)(dict_to_nonedict(v) for v in opt)
    return opt


def _sniff_data_type(dataroot):
    """Classify a dataroot string the way the reference does (options.py:32-52)."""
    if dataroot is None:
        return "img"
    if dataroot.endswith(".lmdb"):
        return "lmdb"
    if dataroot.startswith("mc:"):
        return "mc"
    return "img"


def parse(opt_path, is_train=True):
    """Load an experiment YAML and derive runtime paths/fields.

    Mirrors reference ``option.parse`` (options.py:19-89):
      * per-dataset ``phase``/``scale``/``data_type`` stamping
      * path expansion and experiment-dir derivation
      * debug-mode overrides when the experiment name contains ``"debug"``
    TPU deltas: ``gpu_ids`` is kept for schema parity but only informs
    ``opt['n_devices']``; JAX owns actual device selection.
    """
    with open(opt_path, mode="r") as f:
        loader, _ = ordered_yaml()
        opt = yaml.load(f, Loader=loader)

    opt["is_train"] = is_train
    ids = opt.get("gpu_ids") or []
    opt["n_devices"] = max(1, len(ids)) if isinstance(ids, (list, tuple)) else 1

    scale = opt.get("degradation", {}).get("scale", 1) if opt.get("degradation") else 1

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale
        if dataset.get("dataroot") is not None:
            dataset["dataroot"] = osp.expanduser(dataset["dataroot"])
        dataset["data_type"] = _sniff_data_type(dataset.get("dataroot"))

    for key, path in (opt.get("path") or {}).items():
        if path and "root" in key:
            opt["path"][key] = osp.abspath(osp.expanduser(path))

    if opt.get("path") is None:
        opt["path"] = {}
    root = opt["path"].get("root", os.getcwd())
    opt["path"]["root"] = osp.abspath(osp.expanduser(root))

    if is_train:
        experiments_root = osp.join(opt["path"]["root"], "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_state"] = osp.join(experiments_root, "training_state")
        opt["path"]["log"] = experiments_root
        opt["path"]["val_images"] = osp.join(experiments_root, "val_images")

        # debug-mode overrides (reference options.py:80-83)
        if "debug" in opt["name"]:
            train = opt.get("train") or {}
            train["val_freq"] = 8
            logger_opt = opt.get("logger") or {}
            logger_opt["print_freq"] = 2
            logger_opt["save_checkpoint_freq"] = 8
            opt["train"] = train
            opt["logger"] = logger_opt
    else:
        results_root = osp.join(opt["path"]["root"], "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root

    return opt


def check_resume(opt, resume_iter):
    """Rewrite pretrain model paths from a resume state (options.py:123-143).

    The reference rewrites ``pretrain_model_G/D`` to ``{iter}_{G,D}.pth``; our
    weight bundles are ``{iter}_{DN,NN,DP,NP}.ckpt`` under ``path.models``, so
    the keys written here are the names ``load_bundle`` actually consumes.
    Warns if the user had set explicit pretrain paths (reference behaviour).
    """
    if opt["path"].get("resume_state"):
        if opt["path"].get("pretrain_model_G") or opt["path"].get("pretrain_model_D"):
            logger.warning(
                "pretrain_model paths will be ignored during resume; "
                "weights come from the resume iteration instead."
            )
        for tag in ("DN", "NN", "DP", "NP"):
            opt["path"][f"pretrain_model_{tag}"] = osp.join(
                opt["path"]["models"], f"{resume_iter}_{tag}.ckpt"
            )
        # schema-parity alias: the reference's single G key maps to the
        # drift-net bundle
        opt["path"]["pretrain_model_G"] = opt["path"]["pretrain_model_DN"]
        logger.info("Set resume pretrain bundle to %s/%s_{DN,NN,DP,NP}.ckpt",
                    opt["path"]["models"], resume_iter)
    return opt


def dict2str(opt, indent_l=1):
    """Pretty-print a nested option dict."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg
