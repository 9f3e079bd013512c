"""Pinned-manifest evaluation protocol: the ONLY sanctioned way to produce
the flagship 5-modality quality table (VERDICT r4 weak #3 / item 3).

1. Verifies (or regenerates, with --regen) the dataset against its committed
   ``MANIFEST.sha256`` — aborts on any hash drift, so every table this emits
   is provably computed on the same test set.
2. Runs the testUM driver (reference metric contract testUM.py:151-164)
   with the given config + sampler overrides.
3. Writes ``artifacts/eval_<tag>.json`` (machine-readable, with the manifest
   digest + sampler settings) and prints the markdown table.

Usage:
  python tools/eval_protocol.py --opt Configurations/flagship_test.yml \
      --tag r05_fp32_T100 [--sample-steps 25 --eta 0] [--platform cpu]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def manifest_digest(root):
    with open(os.path.join(root, "MANIFEST.sha256"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--dataset-root", default="dataset/flagship224")
    ap.add_argument("--tag", required=True,
                    help="artifact tag, e.g. r05_fp32_T100")
    ap.add_argument("--sample-steps", type=int, default=None)
    ap.add_argument("--eta", type=float, default=None)
    ap.add_argument("--pth-dir", default=None,
                    help="override test.pth_dir (distilled bundles)")
    ap.add_argument("--iter", dest="ckpt_iter", default=None,
                    help="override test.iter")
    ap.add_argument("--use-ema", dest="use_ema", type=int, default=None,
                    choices=(0, 1), help="override test.use_ema")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the dataset from the manifest's "
                         "generator line first (then verify)")
    args = ap.parse_args()

    from tools.eval_manifest import verify_manifest

    if args.regen:
        ok, _, generator = verify_manifest(args.dataset_root)
        if not ok:
            if not generator:
                raise SystemExit("manifest has no generator line; cannot regen")
            print(f"[protocol] regenerating: {generator}", file=sys.stderr)
            subprocess.run(generator, shell=True, check=True, cwd=REPO)
    ok, problems, generator = verify_manifest(args.dataset_root)
    if not ok:
        for p in problems:
            print(p, file=sys.stderr)
        raise SystemExit(
            f"dataset {args.dataset_root} does not match its pinned manifest "
            f"— refusing to emit a quality table on drifted data"
            + (f"; regenerate with: {generator}" if generator else ""))
    digest = manifest_digest(args.dataset_root)
    print(f"[protocol] manifest verified (digest {digest[:16]}...)",
          file=sys.stderr)

    # run the standard driver in-process so we capture its return value
    argv = ["testUM.py", f"-opt={args.opt}"]
    if args.sample_steps is not None:
        argv += ["--sample-steps", str(args.sample_steps)]
    if args.eta is not None:
        argv += ["--eta", str(args.eta)]
    if args.pth_dir:
        argv += ["--pth-dir", args.pth_dir]
    if args.ckpt_iter:
        argv += ["--iter", args.ckpt_iter]
    if args.use_ema is not None:
        argv += ["--use-ema", str(args.use_ema)]
    if args.platform:
        argv += ["--platform", args.platform]
    import testUM

    old_argv = sys.argv
    sys.argv = argv
    try:
        results = testUM.main()
    finally:
        sys.argv = old_argv

    table = {}
    for name, v in results.items():
        if v["num"] == 0:
            continue
        table[name] = {
            "PSNR": sum(v["PSNR"]) / v["num"],
            "SSIM": sum(v["SSIM"]) / v["num"],
            "RMSE": sum(v["RMSE"]) / v["num"],
            "n": v["num"],
        }
    record = {
        "tag": args.tag,
        "opt": args.opt,
        "dataset_root": args.dataset_root,
        "manifest_sha256": digest,
        "sample_steps": args.sample_steps,
        "eta": args.eta,
        "pth_dir": args.pth_dir,
        "iter": args.ckpt_iter,
        "table": table,
    }
    out_path = os.path.join(REPO, "artifacts", f"eval_{args.tag}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"[protocol] wrote {out_path}", file=sys.stderr)

    print(f"\n| Modality | PSNR | SSIM | RMSE | n | ({args.tag}, "
          f"manifest {digest[:12]}) |")
    print("|---|---|---|---|---|---|")
    for name, row in table.items():
        print(f"| {name} | {row['PSNR']:.2f} | {row['SSIM']:.4f} | "
              f"{row['RMSE']:.4f} | {row['n']} | |")


if __name__ == "__main__":
    main()
