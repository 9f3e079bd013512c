"""Isolated training-step benchmark (the protocol behind PERF.md's
"Training throughput" numbers, now a committed tool instead of an ad-hoc
script).

Builds the engine exactly the way ``trainUM.py`` does (same config parse,
``create_model`` + ``set_sde``), feeds a synthetic in-memory batch of the
configured resolution/batch size, warms the jit, then times N donated
steps end-to-end (the step includes forward diffusion, both UNet
forwards + frozen text-tower encodings, score-map pyramid losses,
backward, two Adam updates and EMA — one jitted program; reference cost
structure: trainUM.py:229-276, drift_noise_model.py:231-312).

Prints ONE JSON line:
  {"metric": "train_step_ms", "value": N, "unit": "ms",
   "img_per_sec": N, "achieved_tflops": N, "mfu": N, ...}

Usage:
  python tools/bench_train.py -opt=Configurations/flagship_tpu.yml
  python tools/bench_train.py -opt=Configurations/flagship_bf16_tpu.yml
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="training YAML (trainUM schema)")
    ap.add_argument("--steps", type=int, default=30, help="timed steps")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None,
                    help="override datasets.train.batch_size")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for debug)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache (same setup as bench.py / the drivers)
    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from instancediff_tpu.config import parse
    from instancediff_tpu.models import create_model
    from instancediff_tpu.sde import create_sde

    opt = parse(args.opt, is_train=True)
    train_opt = opt["train"]
    model_opt = opt["models"][train_opt["which_model"]]
    res = opt.get("resolution") or 224
    batch = args.batch or (opt["datasets"]["train"].get("batch_size") or 4)

    sde = create_sde(opt["sdes"][train_opt["which_sde"]])
    model = create_model(train_opt, model_opt, phase="train",
                         image_size=res, seed=0)
    model.set_sde(sde)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (batch, res, res, 1)), jnp.float32)
    mu = x0 + 0.1 * jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    batch_d = {
        "input": mu,
        "target": x0,
        "type_idx": jnp.arange(batch, dtype=jnp.int32) % 5,
        "A_emb": jnp.zeros((batch, 1, model.context_dim), jnp.float32),
    }

    # Time the RAW jitted step with donated state and no per-step host
    # sync — ``optimize_parameters`` materialises the loss metrics every
    # step (a host<->device round-trip that serialises dispatch; on the
    # tunneled backend that inflates 100 ms device steps to ~300 ms wall).
    # This is the device-throughput protocol behind PERF.md's training
    # numbers; trainUM's real loop pays the metric sync by design (it
    # logs losses).
    step = jax.jit(model.build_train_step(), donate_argnums=(0,))
    lr = jnp.float32(model.drift_net_lr)
    state = model.state
    for i in range(args.warmup):
        state, _ = step(state, batch_d, jax.random.key(i), model.text_params,
                        lr, lr)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, _ = step(state, batch_d, jax.random.key(100 + i),
                        model.text_params, lr, lr)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    model.state = state

    ms = dt / args.steps * 1e3
    img_s = batch * args.steps / dt

    # XLA's own cost model for the compiled step (fwd+bwd+opt as executed)
    flops = None
    try:
        ca = step.lower(
            model.state, batch_d, jax.random.key(0), model.text_params,
            lr, lr).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    out = {
        "metric": "train_step_ms",
        "value": round(ms, 2),
        "unit": "ms",
        "img_per_sec": round(img_s, 2),
        "res": res,
        "batch": batch,
        "dtype": str(model_opt.get("dtype") or "float32"),
        "device_kind": jax.devices()[0].device_kind,
    }
    if flops:
        tf = flops / (ms / 1e3) / 1e12
        out["achieved_tflops"] = round(tf, 2)
        peak = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5p": 459.0,
                "TPU v4": 275.0, "TPU v6 lite": 918.0}
        for k, v in peak.items():
            if jax.devices()[0].device_kind.startswith(k):
                out["mfu_bf16peak"] = round(tf / v, 4)
                break
    print(json.dumps(out))


if __name__ == "__main__":
    main()
