"""Trace-profile the flagship reverse sampler on the real chip and print the
top fusions by device time (parses the jax.profiler trace.json.gz)."""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import re

_LAYER_RE = re.compile(
    r"(dec_\d+_\d+|enc_\d+_\d+|mid1|mid2|mid_attn|smm_\d+|smm_fuse_\d+"
    r"|up_\d+|down_\d+|conv_in|conv_out|norm_out|threefry|temb)")


def _device_leaf_events(trace_dir):
    """Leaf XLA-op events on the TPU device track (pid named /device:TPU).
    Wrapper rows (jit_sample / while) carry no ``tf_op`` metadata and are
    skipped, so durations sum without double counting."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    device_pids = {ev["pid"] for ev in data["traceEvents"]
                   if ev.get("ph") == "M" and ev.get("name") == "process_name"
                   and "TPU" in (ev.get("args") or {}).get("name", "")}
    for ev in data.get("traceEvents", []):
        if (ev.get("ph") == "X" and ev.get("pid") in device_pids
                and (ev.get("args") or {}).get("tf_op")):
            yield ev


def top_ops(trace_dir, n=30, steps=1):
    """Aggregate device time three ways: by model layer (HLO metadata op
    path), by HLO category, and the top leaf fusions — the r3/r4 perf
    attribution channel (PERF.md: trust device-trace durations)."""
    per_layer = defaultdict(float)
    per_cat = defaultdict(float)
    per_op = defaultdict(float)
    total = 0.0
    for ev in _device_leaf_events(trace_dir):
        a = ev["args"]
        dur = ev.get("dur", 0.0)
        tf_op = a.get("tf_op", "")
        m = _LAYER_RE.search(tf_op)
        per_layer[m.group(1) if m else "(sde-step/misc)"] += dur
        per_cat[a.get("hlo_category", "?")] += dur
        per_op[(ev.get("name", ""), tf_op[:90])] += dur
        total += dur
    lines = [f"device leaf-op total: {total/1e3:.1f} ms "
             f"({total/steps/1e3:.3f} ms/step)"]
    lines.append("--- by layer (ms/step) ---")
    for k, v in sorted(per_layer.items(), key=lambda kv: -kv[1]):
        lines.append(f"{v/total*100:6.2f}%  {v/steps/1e3:8.4f}  {k}")
    lines.append("--- by HLO category (ms/step) ---")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"{v/total*100:6.2f}%  {v/steps/1e3:8.4f}  {k}")
    lines.append(f"--- top {n} leaf ops (ms/step) ---")
    for (name, tf_op), v in sorted(per_op.items(), key=lambda kv: -kv[1])[:n]:
        lines.append(f"{v/total*100:6.2f}%  {v/steps/1e3:8.4f}  {name[:28]:28s} {tf_op}")
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/sampler_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    settings = dict(in_nc=2, out_nc=5, nf=64, ch_mult=[1, 2, 4, 4],
                    context_dim=512, text_module="scoremap", score_map_chan=16,
                    if_MultiScoreMap=True, num_res_blocks=2)
    eng = CLIPDriftEngine(
        dnet_settings=settings, nnet_settings=settings,
        score_map_ch_mult=(1, 1, 2, 4), score_map_ngf=64,
        use_image_context=True, CLIP_Type="CLIP",
        sde=DriftSDE(T=args.steps, max_sigma=0.4), image_size=args.res,
        dtype=jnp.bfloat16, if_train=False,
    )
    key = jax.random.key(0)
    mu = jax.random.uniform(key, (args.batch, args.res, args.res, 1)) * 2 - 1
    type_idx = jnp.arange(args.batch, dtype=jnp.int32) % 5
    a_emb = jnp.zeros((args.batch, 1, eng.context_dim))
    sample = jax.jit(eng.build_sample_fn())
    dparams, nparams = eng.state["drift"], eng.state["noise"]
    out = sample(dparams, nparams, eng.text_params, mu, type_idx, a_emb, key)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        out = sample(dparams, nparams, eng.text_params, mu, type_idx, a_emb,
                     jax.random.fold_in(key, 1))
        jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1000:.1f} ms for {args.steps} steps batch {args.batch} "
          f"= {wall/args.steps/args.batch*1000:.2f} ms/step/img")

    for line in top_ops(args.out, steps=args.steps):
        print(line)


if __name__ == "__main__":
    main()
