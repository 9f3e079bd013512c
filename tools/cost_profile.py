"""XLA cost-model profile of the flagship sampler step.

AOT-compiles the reverse sampler and aggregates per-instruction
``estimated_cycles`` (from ``compiled.as_text()``) by HLO ``metadata.op_name``
— the reliable attribution channel on this box (device-trace durations agree;
isolated wall-clock timings on the tunneled backend do not, PERF.md).

Usage: python tools/cost_profile.py [--res 256] [--batch 8] [--steps 4]
       [--top 30] [--train]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_cost(txt, top=30):
    """Aggregate estimated cycles by (opcode, metadata op_name prefix)."""
    per = defaultdict(float)
    total = 0.0
    for line in txt.splitlines():
        m = re.search(r"estimated_cycles=(\d+)", line)
        if not m:
            continue
        cycles = float(m.group(1))
        om = re.search(r'op_name="([^"]+)"', line)
        opcode = line.lstrip().split(" ", 2)
        opcode = next((tok for tok in opcode if "=" in tok), "")
        instr = line.lstrip().split(" = ", 1)
        kind = ""
        if len(instr) == 2:
            kind = instr[1].split("(", 1)[0].split(" ")[-1]
        name = om.group(1) if om else "(no-metadata)"
        # compress jit(...)/while/body scaffolding, keep the model-layer path
        name = re.sub(r"jit\([^)]*\)/", "", name)
        name = re.sub(r"while/body/", "", name)
        per[(kind, name)] += cycles
        total += cycles
    items = sorted(per.items(), key=lambda kv: -kv[1])[:top]
    return items, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dump", default=None, help="also write full HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

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

    fn = jax.jit(eng.build_sample_fn())
    lowered = fn.lower(eng.state["drift"], eng.state["noise"], eng.text_params,
                       mu, type_idx, a_emb, key, None)
    compiled = lowered.compile()
    # XLA cost-analysis totals — the independently re-derivable roofline
    # numerator (BASELINE.md "Hardware-normalized north-star position").
    # NOTE: XLA counts the while-loop body ONCE; multiply the per-body flops
    # by the step count for per-invocation totals.
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        print(f"cost_analysis: flops={flops:.4e} (scan body counted ONCE; "
              f"x T for a T-step sampler), "
              f"bytes_accessed={float(ca.get('bytes accessed', 0.0)):.4e}, "
              f"config: res={args.res} batch={args.batch} steps={args.steps}")
        print(f"per-sampler-step flops ~= {flops:.4e} (body-dominated); "
              f"at v5e 197 TFLOP/s bf16 peak the 100%-MXU step is "
              f"{flops / 197e12 * 1e3:.3f} ms")
    except Exception as e:  # pragma: no cover
        print(f"cost_analysis unavailable: {e!r}")
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
    items, total = parse_cost(txt, args.top)
    if total == 0:
        print("estimated_cycles not present in this HLO text (cache-loaded "
              "executables may omit backend configs) — per-op table skipped; "
              "use tools/profile_sampler.py device traces for attribution")
        return
    print(f"total estimated cycles: {total:.3e}  (T={args.steps} scan; "
          f"per-step cost scales with scan trip count only for the body)")
    for (kind, name), cyc in items:
        print(f"{cyc/total*100:6.2f}%  {cyc:12.3e}  {kind:24s} {name[:110]}")


if __name__ == "__main__":
    main()
