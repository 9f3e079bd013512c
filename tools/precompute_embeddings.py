"""Precompute CLIP image embeddings (emb_A) for a dataset index.

Parity with the reference's offline workflow: ``get_BiomedCLIP()`` was used to
embed each degraded image A into a 512-d vector stored as a raw float32 file
referenced by the dataset JSON (README.md:68-102; MedSpeckle.py:46). The
TPU framework can also compute emb_A on-device at train/test time
(models/clip_vit.py), but this tool keeps the file-based contract available.

Usage: python tools/precompute_embeddings.py --index dataset/synth/dataset_file.json \
           [--res 224] [--tiny] [--checkpoint path/to/open_clip_pytorch_model.bin]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from instancediff_tpu.models.biomedclip import get_BiomedCLIP
    from instancediff_tpu.data.med_dataset import normalize_pair

    model = get_BiomedCLIP(checkpoint_path=args.checkpoint, tiny=args.tiny)

    with open(args.index) as f:
        index = json.load(f)

    n_done = 0
    for split, records in index.items():
        for rec in records:
            a = np.fromfile(rec["A"], dtype=np.float32).reshape(args.res, args.res, 1)
            a, _ = normalize_pair(a, a.copy(), rec["name"])
            emb = np.asarray(model.encode_image(a[None]))[0]
            emb_path = rec.get("A_emb") or rec["A"].replace(".raw", "_emb.raw")
            emb.astype(np.float32).tofile(emb_path)
            rec["A_emb"] = emb_path
            n_done += 1

    with open(args.index, "w") as f:
        json.dump(index, f, indent=1)
    print(f"embedded {n_done} images -> {args.index}")


if __name__ == "__main__":
    main()
