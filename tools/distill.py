"""Progressive few-step distillation driver (models/distill.py) for a
trained checkpoint.

Halves the sampler's step count per phase at (near-)zero quality cost:
teacher = the checkpoint's EMA sampler at its full grid; each phase trains
the student to take one deterministic step where the teacher takes two,
then the student becomes the next phase's teacher. The distilled bundle is
saved per phase in the reference checkpoint layout so ``testUM.py`` /
``tools/eval_protocol.py`` evaluate it unchanged (use
``--sample-steps <N> --eta 0`` — distilled samplers are deterministic-step
tuned).

Usage (flagship, T=100 -> 50 -> 25):
  python tools/distill.py -opt=Configurations/flagship_tpu.yml \
      --phases 50 25 --steps-per-phase 1500 --lr 2e-5 \
      --out-dir experiments/flagship_224_distill/models
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_jax_cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", type=str, required=True)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--ckpt-dir", default=None,
                    help="weight bundle dir (default: test.pth_dir)")
    ap.add_argument("--ckpt-iter", default=None,
                    help="bundle iteration (default: test.iter)")
    ap.add_argument("--phases", type=int, nargs="+", required=True,
                    help="student step counts, halving per phase "
                         "(e.g. 50 25 from a T=100 teacher)")
    ap.add_argument("--steps-per-phase", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--batch", type=int, default=None,
                    help="distill batch (default: train dataset batch_size)")
    ap.add_argument("--out-dir", default=None,
                    help="bundle output dir (default: "
                         "experiments/<name>_distill/models)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--raw-teacher", action="store_true",
                    help="use the raw (non-EMA) weights as the first "
                         "teacher")
    ap.add_argument("--teacher-eta", type=float, default=0.0,
                    help="eta of the teacher chain distilled in PHASE 1 "
                         "(models/distill.py): 1.0 regresses the student's "
                         "deterministic step onto the stochastic DDPM "
                         "chain's conditional mean — the flagship-scale "
                         "fix for the ~4.5 dB eta=0 trajectory gap. Later "
                         "phases always distill deterministically (their "
                         "teacher already is)")
    ap.add_argument("--z1-correction", action="store_true",
                    help="include the exact -c1*z1 composition term in the "
                         "stochastic-teacher noise target (unbiased either "
                         "way; the correction adds ~6x gradient noise at "
                         "mid-schedule, models/distill.py docstring)")
    args = ap.parse_args()

    if not args.platform:
        from instancediff_tpu.utils.backend import wait_for_backend

        wait_for_backend()
    import jax

    _setup_jax_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from instancediff_tpu.config import ordered_yaml, dict_to_nonedict
    from instancediff_tpu import data as data_pkg
    from instancediff_tpu.models import create_model
    from instancediff_tpu.models.distill import distill_phase
    from instancediff_tpu.sde import create_sde

    loader_cls, _ = ordered_yaml()
    with open(args.opt) as f:
        opt = yaml.load(f, Loader=loader_cls)
    opt = dict_to_nonedict(opt)

    which_model = opt["train"]["which_model"] if opt.get("train") else "DriftNoise"
    model_opt = opt["models"][which_model]
    eng = create_model(opt.get("train"), model_opt, phase="train",
                       image_size=(opt.get("resolution") or 224),
                       seed=args.seed)

    test_opt = opt.get("test") or {}
    ckpt_dir = args.ckpt_dir or test_opt.get("pth_dir")
    ckpt_iter = args.ckpt_iter or test_opt.get("iter") or "latest"
    if not ckpt_dir:
        raise SystemExit("no checkpoint dir (--ckpt-dir or test.pth_dir)")
    print(f"[distill] loading {ckpt_dir} @ {ckpt_iter}", file=sys.stderr)
    eng.load(ckpt_dir, ckpt_iter, load_ema=True)

    which_sde = (opt["train"] or {}).get("which_sde") or "driftSDE"
    eng.set_sde(create_sde(opt["sdes"][which_sde]))

    ds_opt = dict(opt["datasets"]["train"])
    ds_opt["phase"] = "train"
    if args.batch:
        ds_opt["batch_size"] = args.batch
    ds = data_pkg.create_dataset(ds_opt)
    train_loader = data_pkg.create_dataloader(ds, ds_opt)

    def batches():
        while True:
            for batch in train_loader:
                yield {
                    "input": jnp.asarray(batch["input"]),
                    "target": jnp.asarray(batch["target"]),
                    "A_emb": jnp.asarray(batch["A_emb"]),
                    "type_idx": jnp.asarray(batch["type_idx"]),
                }

    out_dir = args.out_dir or os.path.join(
        "experiments", f"{opt.get('name') or 'model'}_distill", "models")
    os.makedirs(out_dir, exist_ok=True)

    key = jax.random.key(args.seed + 31337)
    for pi, n_student in enumerate(args.phases):
        t0 = time.time()
        phase_eta = args.teacher_eta if pi == 0 else 0.0
        print(f"[distill] phase {pi + 1}/{len(args.phases)}: teacher "
              f"{'EMA ' if (pi == 0 and not args.raw_teacher) else ''}grid "
              f"2x{n_student} (eta={phase_eta}) -> student T={n_student}, "
              f"{args.steps_per_phase} steps, lr {args.lr}", file=sys.stderr)

        def log_fn(s, m, _n=n_student):
            print(f"[distill] T={_n} step {s}/{args.steps_per_phase} "
                  f"l={m['l']:.5f} dl={m['dl']:.5f} nl={m['nl']:.5f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)

        distill_phase(
            eng, n_student, batches(), args.steps_per_phase,
            jax.random.fold_in(key, pi), lr=args.lr,
            ema_as_teacher=(pi == 0 and not args.raw_teacher),
            teacher_eta=phase_eta, z1_correction=args.z1_correction,
            log_every=max(1, args.steps_per_phase // 10), log_fn=log_fn)
        tag = f"distill{n_student}"
        eng.save(out_dir, tag)
        print(f"[distill] phase done in {time.time() - t0:.0f}s; saved "
              f"bundle '{tag}' (+ rolling EMA) to {out_dir}", file=sys.stderr)
        prev = n_student

    print(f"[distill] all phases done. Evaluate with:\n"
          f"  python testUM.py -opt={args.opt} --sample-steps "
          f"{args.phases[-1]} --eta 0  (test.pth_dir -> {out_dir}, "
          f"test.iter -> distill{args.phases[-1]})", file=sys.stderr)


if __name__ == "__main__":
    main()
