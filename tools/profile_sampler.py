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


def top_ops(trace_dir, n=25):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    per_op = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # TPU device lanes are pids whose names aren't python threads; use the
        # op name heuristics: XLA ops carry 'dur' and land on device tracks
        cat = ev.get("cat", "")
        name = ev.get("name", "")
        args = ev.get("args") or {}
        if "run_id" in args or cat in ("tpu_op", "XLA Op", "xla_op") or args.get("group_id") is not None:
            pass
        dur = ev.get("dur", 0)
        tid_name = ""
        per_op[(cat, name.split(".")[0])] += dur
        total += dur
    items = sorted(per_op.items(), key=lambda kv: -kv[1])[:n]
    return items, total


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

    items, total = top_ops(args.out)
    print(f"total traced op-us: {total:.0f}")
    for (cat, name), dur in items:
        print(f"{dur/total*100:5.1f}%  {dur:>10.0f}us  [{cat}] {name}")


if __name__ == "__main__":
    main()
