"""Restore medical images from the command line.

User-facing single/multi-image inference without the testUM dataset
machinery: point it at a config + checkpoint dir and a handful of image
files, get restored images back. Wraps ``instancediff_tpu.serving.Restorer``
(load-once, fixed-batch jitted sampler) so N images cost one compile.

The reference offers only the dataset-driven ``testUM.py`` evaluation driver
(/root/reference/testUM.py:40-185); this fills the deployment gap for users
with loose files instead of a JSON-indexed dataset.

Input formats:
  * ``.raw``  — flat float32, reshaped to ``--res`` squared (the reference's
                MedSpeckle convention, MedSpeckle.py:44-45)
  * ``.npy``  — any [H,W] / [H,W,1] array
  * ``.png/.jpg/...`` — via PIL, converted to grayscale / 255

By default the per-modality normalisation of the training pipeline is
applied (CT clamp /1800, cryo-EM /255, then [0,1] -> [-1,1]; MedSpeckle
semantics via ``data.med_dataset.normalize_pair``); pass ``--pre-normalized``
if your arrays are already in [-1,1].

Outputs ``<out>/<stem>_restored.raw`` (float32 in [0,1] — the metric-space
convention pred/2+0.5 of testUM.py:151-164) plus a ``.png`` preview.

Example:
    python tools/restore.py -opt=Configurations/tiny_cpu.yml \
        --pth-dir experiments/tiny_cpu_e2e/models \
        --images scan0.raw scan1.npy --type "speckle in OCT" \
        --out results/cli --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_image(path: str, res: int | None):
    """Load one image file as [H,W,1] float32.

    Returns ``(array, is_unit_range)``: raw/npy files carry the modality's
    native scanner range (per-modality clamps apply); PNG/JPG pixels are
    mapped to [0,1] and marked unit-range so the modality clamp-division is
    NOT applied again (it would collapse CT/cryo-EM inputs to ~0)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".raw":
        if not res:
            raise SystemExit(f"--res is required for raw input {path}")
        arr = np.fromfile(path, dtype=np.float32)
        if arr.size != res * res:
            raise SystemExit(
                f"{path}: {arr.size} float32s != --res {res}^2 = {res * res}")
        return arr.reshape(res, res, 1), False
    if ext == ".npy":
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.ndim != 3 or arr.shape[-1] != 1:
            raise SystemExit(f"{path}: expected [H,W] or [H,W,1], got {arr.shape}")
        return arr, False
    from PIL import Image

    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=np.float32)[..., None] / 255.0, True


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Restore medical images with a trained InstanceDiff-TPU "
                    "checkpoint")
    ap.add_argument("-opt", default="Configurations/config.yml",
                    help="YAML config (model architecture + SDE + test paths)")
    ap.add_argument("--images", nargs="+", required=True,
                    help="input files (.raw / .npy / .png ...)")
    ap.add_argument("--type", nargs="+", required=True,
                    help="artifact-type prompt(s): one for all images, or one "
                         "per image (e.g. 'speckle in OCT')")
    ap.add_argument("--pth-dir", default=None,
                    help="checkpoint models dir (default: test.pth_dir from "
                         "the config)")
    ap.add_argument("--iter", default=None,
                    help="checkpoint iteration (default: test.iter or latest)")
    ap.add_argument("--out", default="results/restore")
    ap.add_argument("--res", type=int, default=None,
                    help="side length for .raw inputs (default: config "
                         "resolution)")
    ap.add_argument("--sample-steps", type=int, default=None,
                    help="strided fast sampling (< SDE T)")
    ap.add_argument("--eta", type=float, default=None,
                    help="ancestral-noise scale (1=DDPM posterior, 0=DDIM)")
    ap.add_argument("--spatial", type=int, default=0,
                    help="shard image H over this many devices during "
                         "sampling (multi-chip serving)")
    ap.add_argument("--batch", type=int, default=None,
                    help="compiled batch size (default: number of images, "
                         "capped at 8)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--pre-normalized", action="store_true",
                    help="inputs are already in [-1,1]; skip the per-modality "
                         "normalisation")
    ap.add_argument("--no-ema", action="store_true",
                    help="use the online weights instead of the EMA shadows")
    args = ap.parse_args(argv)

    if len(args.type) not in (1, len(args.images)):
        raise SystemExit(f"--type takes 1 or {len(args.images)} names, "
                         f"got {len(args.type)}")
    types = args.type * len(args.images) if len(args.type) == 1 else args.type

    from instancediff_tpu.serving import Restorer
    from instancediff_tpu.data.med_dataset import normalize_pair
    from instancediff_tpu.utils.img_utils import save_img, save_raw, tensor2img

    import yaml

    from instancediff_tpu.config import ordered_yaml

    loader, _ = ordered_yaml()
    with open(args.opt) as f:
        opt = yaml.load(f, Loader=loader)
    res = args.res or opt.get("resolution") or 224
    test_opt = opt.get("test") or {}
    iteration = args.iter or test_opt.get("iter") or "latest"

    loaded = [load_image(p, res) for p in args.images]
    shapes = {im.shape for im, _ in loaded}
    if len(shapes) != 1:
        raise SystemExit(f"all images must share one shape, got {shapes}")
    images = []
    for (im, unit_range), t in zip(loaded, types):
        if args.pre_normalized:
            images.append(im)
        elif unit_range:  # already [0,1]: just the global affine to [-1,1]
            images.append(im * 2.0 - 1.0)
        else:
            images.append(normalize_pair(im, im, t)[0])
    stack = np.stack(images).astype(np.float32)

    n = len(images)
    restorer = Restorer.from_config(
        args.opt, pth_dir=args.pth_dir, iteration=iteration,
        use_ema=not args.no_ema, batch_size=args.batch or min(n, 8),
        sample_steps=args.sample_steps, platform=args.platform,
        seed=args.seed, eta=args.eta, spatial=args.spatial)
    unknown = sorted({t for t in types if t not in restorer.type_map})
    if unknown:  # a typo would silently condition on artifact index 0
        raise SystemExit(f"unknown --type {unknown}; valid: "
                         f"{sorted(restorer.type_map)}")

    restored = restorer.restore(stack, types)          # [-1,1]
    restored01 = restored / 2.0 + 0.5                  # metric space

    os.makedirs(args.out, exist_ok=True)
    for path, rec in zip(args.images, restored01):
        stem = os.path.splitext(os.path.basename(path))[0]
        raw_path = os.path.join(args.out, f"{stem}_restored.raw")
        save_raw(rec, raw_path)
        try:
            save_img(tensor2img(rec[..., 0]),
                     os.path.join(args.out, f"{stem}_restored.png"))
        except Exception:
            pass  # PNG preview is best-effort (headless PIL issues etc.)
        print(raw_path)


if __name__ == "__main__":
    main()
