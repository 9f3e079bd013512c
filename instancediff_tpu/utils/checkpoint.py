"""Checkpoint bundles mirroring the reference's layout (SURVEY.md SS5.4).

Reference scheme (drift_noise_model.py:670-755):
  * per-network weight files ``{iter}_{DN,NN}`` always and ``{iter}_{DP,NP}``
    when score-map prompts exist, plus EMA shadows under the (historically
    misspelled) ``lastest_{...}_ema`` names,
  * a trainer-state file ``{iter}.state`` holding epoch/iter/optimizers.

TPU-native implementation: flax msgpack serialization of parameter pytrees
(``.ckpt``); optimizer states and counters are pytrees too, so resume is a
pure deserialisation — no pickled live objects. DP/NP are the ``smm_*``
subtrees split out of each UNet's parameter tree (the reference's
``CLIP_ScoreMapModule`` ownership split).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax
import jax
import numpy as np


def _to_host(tree):
    # One batched device->host gather: jax.device_get starts ALL leaf copies
    # asynchronously before blocking. Per-leaf np.asarray was a sequential
    # blocking round-trip per leaf (measured ~6 min per flagship save on the
    # tunneled v5e — the symmetric load-side fix lives in load_bundle).
    return jax.tree.map(np.asarray, jax.device_get(tree))


def save_pytree(tree: Any, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(_to_host(tree)))


def load_pytree(template: Any, path: str):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def split_smm(params: Dict) -> tuple[Dict, Dict]:
    """Split a UNet param tree into (net-without-prompts, prompts) — the
    DN/DP (NN/NP) ownership split (drift_noise_model.py:683-692)."""
    inner = params["params"] if "params" in params else params
    net = {k: v for k, v in inner.items() if not k.startswith("smm_")}
    prompts = {k: v for k, v in inner.items() if k.startswith("smm_")}
    return net, prompts


def merge_smm(net: Dict, prompts: Dict) -> Dict:
    return {"params": {**net, **prompts}}


def save_bundle(models_dir: str, iteration, drift_params, noise_params,
                drift_ema=None, noise_ema=None):
    """Write the reference-layout weight bundle for one iteration."""
    dn, dp = split_smm(drift_params)
    nn_, np_ = split_smm(noise_params)
    save_pytree(dn, os.path.join(models_dir, f"{iteration}_DN.ckpt"))
    save_pytree(nn_, os.path.join(models_dir, f"{iteration}_NN.ckpt"))
    if dp:
        save_pytree(dp, os.path.join(models_dir, f"{iteration}_DP.ckpt"))
    if np_:
        save_pytree(np_, os.path.join(models_dir, f"{iteration}_NP.ckpt"))
    # EMA shadows always overwrite the rolling 'lastest' files
    # (sic — filename contract from drift_noise_model.py:683-692)
    if drift_ema is not None:
        edn, edp = split_smm(drift_ema)
        save_pytree(edn, os.path.join(models_dir, "lastest_DN_ema.ckpt"))
        if edp:
            save_pytree(edp, os.path.join(models_dir, "lastest_DP_ema.ckpt"))
    if noise_ema is not None:
        enn, enp = split_smm(noise_ema)
        save_pytree(enn, os.path.join(models_dir, "lastest_NN_ema.ckpt"))
        if enp:
            save_pytree(enp, os.path.join(models_dir, "lastest_NP_ema.ckpt"))


def load_bundle(models_dir: str, iteration, drift_template, noise_template,
                use_ema=False):
    """Load a weight bundle back into (drift_params, noise_params)."""
    if use_ema:
        dn = load_pytree(split_smm(drift_template)[0],
                         os.path.join(models_dir, "lastest_DN_ema.ckpt"))
        nn_ = load_pytree(split_smm(noise_template)[0],
                          os.path.join(models_dir, "lastest_NN_ema.ckpt"))
        dp_path = os.path.join(models_dir, "lastest_DP_ema.ckpt")
        np_path = os.path.join(models_dir, "lastest_NP_ema.ckpt")
    else:
        dn = load_pytree(split_smm(drift_template)[0],
                         os.path.join(models_dir, f"{iteration}_DN.ckpt"))
        nn_ = load_pytree(split_smm(noise_template)[0],
                          os.path.join(models_dir, f"{iteration}_NN.ckpt"))
        dp_path = os.path.join(models_dir, f"{iteration}_DP.ckpt")
        np_path = os.path.join(models_dir, f"{iteration}_NP.ckpt")
    dp_tmpl = split_smm(drift_template)[1]
    np_tmpl = split_smm(noise_template)[1]
    dp = load_pytree(dp_tmpl, dp_path) if dp_tmpl and os.path.isfile(dp_path) else dp_tmpl
    np_ = load_pytree(np_tmpl, np_path) if np_tmpl and os.path.isfile(np_path) else np_tmpl
    # msgpack restore yields HOST numpy leaves; commit them to the default
    # device once, or every jitted call that closes over / receives these
    # trees re-transfers the full weights (measured on the tunneled v5e:
    # 2.54 -> 0.54 img/s in the sampler). Under SPMD the first sharded step
    # re-shards from the committed copy — one extra on-device copy, not a
    # per-call host transfer.
    import jax

    return jax.device_put((merge_smm(dn, dp), merge_smm(nn_, np_)))


def save_training_state(state_dir: str, iteration, epoch, opt_states, extra=None):
    """``{iter}.state`` trainer-state analogue (drift_noise_model.py:694-700)."""
    tree = {"epoch": epoch, "iter": iteration, "opt": opt_states, "extra": extra or {}}
    save_pytree(tree, os.path.join(state_dir, f"{iteration}.state"))


def load_training_state(path: str, opt_template):
    tree = {"epoch": 0, "iter": 0, "opt": opt_template, "extra": {}}
    out = load_pytree(tree, path)
    # msgpack restores scalars as read-only 0-d arrays; drivers treat
    # epoch/iter as python ints
    out["epoch"] = int(out["epoch"])
    out["iter"] = int(out["iter"])
    return out
