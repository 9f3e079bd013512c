"""Generate a synthetic SpeckleMed-schema dataset (raw float32 + JSON index).

The reference's dataset assets are unreleased; this writes phantoms degraded
per artifact type so the standard file-based pipeline and drivers run.

Usage: python tools/make_synth_dataset.py --root dataset/synth --res 224 \
           --n-train 16 --n-val 4 --n-test 4
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Dataset synthesis never needs the accelerator, and on this box eager jax
# ops outside an explicit default_device scope dispatch to the remote axon
# TPU tunnel (jax.random.key in data.synthetic.degrade), which can hang on
# the remote queue. Pin the whole process to CPU before jax initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from instancediff_tpu.data.synthetic import write_synthetic_index  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="dataset/synth")
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--n-test", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--types", nargs="*", default=None,
                    help="restrict artifact types (default: all five)")
    ap.add_argument("--emb-dim", type=int, default=512)
    ap.add_argument("--gt-only", action="store_true",
                    help="write clean images only (no *_A.raw); pair with "
                         "datasets.*.gt_only + models.*.degrade_on_device")
    args = ap.parse_args()
    path = write_synthetic_index(
        args.root, n_train=args.n_train, n_val=args.n_val, n_test=args.n_test,
        res=args.res, seed=args.seed, artifact_types=args.types,
        emb_dim=args.emb_dim, gt_only=args.gt_only)
    print(path)


if __name__ == "__main__":
    main()
