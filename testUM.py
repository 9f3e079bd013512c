"""Inference/evaluation driver — semantics parity with reference testUM.py.

Usage: ``python testUM.py -opt=Configurations/config.yml``

Loads the checkpoint iteration ``opt['test']['iter']`` from
``opt['test']['pth_dir']`` (optionally the EMA shadows), runs the jitted
100-step reverse sampler per test sample, computes RMSE/SSIM/PSNR on
``pred/2+0.5`` rescaled outputs with the reference's exact metric settings
(testUM.py:151-164), dumps ``LQ|pred|GT`` concatenations as raw float32
(:170-173) and prints per-artifact-type averages (:179-185).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np
import yaml



def _setup_jax_cache():
    """Persistent XLA compilation cache: first compile (minutes on this
    1-core host) is amortised across runs/sessions."""
    import os
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--sample-steps", type=int, default=None,
                        help="override test.sample_steps (strided fast "
                             "sampling; default = config / full T)")
    parser.add_argument("--eta", type=float, default=None,
                        help="override test.eta (ancestral noise scale; "
                             "0 = deterministic steps)")
    parser.add_argument("--pth-dir", default=None,
                        help="override test.pth_dir (e.g. a distilled "
                             "bundle dir from tools/distill.py)")
    parser.add_argument("--iter", default=None,
                        help="override test.iter (e.g. 'distill25')")
    parser.add_argument("--use-ema", type=int, default=None, choices=(0, 1),
                        help="override test.use_ema (1 = EMA shadows)")
    parser.add_argument("--spatial", type=int, default=0,
                        help="shard the image H dimension over this many "
                             "devices (parallel/spatial.py; XLA SPMD inserts "
                             "the conv halo exchanges — for images larger "
                             "than one chip's budget)")
    parser.add_argument("--knob", action="append", default=[],
                        help="engine perf knob overrides, name=value "
                             "(e.g. --knob int8_conv=1); same keys as the "
                             "models.*.engine YAML block")
    args = parser.parse_args()

    if not args.platform:
        # bound the tunneled-TPU init-hang failure mode (utils/backend.py)
        from instancediff_tpu.utils.backend import wait_for_backend

        wait_for_backend()

    import jax

    _setup_jax_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from instancediff_tpu.config import ordered_yaml, dict_to_nonedict
    from instancediff_tpu import data as data_pkg
    from instancediff_tpu.models import create_model
    from instancediff_tpu.sde import create_sde
    from instancediff_tpu.utils import set_random_seed, save_raw
    from instancediff_tpu.utils.metrics import eval_restoration

    # raw yaml load (reference testUM.py:46-52 uses no option.parse)
    loader, _ = ordered_yaml()
    with open(args.opt) as f:
        opt = yaml.load(f, Loader=loader)
    opt = dict_to_nonedict(opt)

    seed = (opt.get("test") or {}).get("seed") or 0
    set_random_seed(seed)
    root_key = jax.random.key(seed)

    test_opt = opt["test"] or {}
    if args.sample_steps is not None:
        test_opt["sample_steps"] = args.sample_steps
    if args.eta is not None:
        test_opt["eta"] = args.eta
    if args.pth_dir is not None:
        test_opt["pth_dir"] = args.pth_dir
    if args.iter is not None:
        test_opt["iter"] = args.iter
    if args.use_ema is not None:
        test_opt["use_ema"] = bool(args.use_ema)
    result_root = test_opt.get("result_dir") or osp.join(
        os.getcwd(), "results", opt.get("name") or "test")

    # build test loaders per dataset entry (reference :58-67)
    loaders = []
    test_batch = int(test_opt.get("batch_size") or 1)
    for phase, dataset_opt in (opt["datasets"] or {}).items():
        if not phase.startswith("test") and not phase.startswith("val"):
            continue
        dataset_opt["phase"] = "test"
        dataset_opt["batch_size"] = test_batch
        ds = data_pkg.create_dataset(dataset_opt)
        loaders.append((phase, data_pkg.create_dataloader(ds, dataset_opt)))
    assert loaders, "no test/val dataset entries in config"
    any_gt_only = any(bool(getattr(ld.dataset, "gt_only", False))
                      for _, ld in loaders)

    which_model = opt["train"]["which_model"] if opt.get("train") else "DriftNoise"
    model_opt = opt["models"][which_model]
    if args.knob:
        eng_block = dict(model_opt.get("engine") or {})
        for kv in args.knob:
            name, _, val = kv.partition("=")
            eng_block[name] = int(val) if val.lstrip("-").isdigit() else val
        model_opt["engine"] = eng_block
    model = create_model(None, model_opt, phase="test",
                         image_size=(opt.get("resolution") or 224), seed=seed)
    if any_gt_only and not getattr(model, "degrade_on_device", False):
        # a GT-only dataset feeds LQ == GT placeholders; without on-device
        # degradation every metric would score the identity restoration
        raise ValueError(
            "datasets.*.gt_only requires models.%s.degrade_on_device: true "
            "(the LQ images exist only as on-device synthesis)" % which_model)

    # checkpoint load (reference :76, :89-92; EMA nets optional)
    use_ema = bool(test_opt.get("use_ema"))
    if test_opt.get("pth_dir"):
        model.load(test_opt["pth_dir"], test_opt.get("iter"), use_ema=use_ema)

    which_sde = (opt["train"] or {}).get("which_sde") or "driftSDE"
    sde = create_sde(opt["sdes"][which_sde])
    model.set_sde(sde)

    # on-device emb_A (BASELINE config 3): attach a CLIP image tower so the
    # sampler embeds the degraded input itself instead of reading files
    if test_opt.get("on_device_emb"):
        from instancediff_tpu.models.clip_vit import build_image_tower

        tower = build_image_tower(
            embed_dim=model.context_dim,
            tiny=bool(model_opt.get("tiny_text_encoder")))
        tparams = jax.jit(
            lambda k: tower.init(k, jnp.zeros(
                (1, opt.get("resolution") or 224, opt.get("resolution") or 224, 1)))
        )(jax.random.key(7))
        model.attach_image_tower(tower, tparams)

    artifact_types = opt.get("artifact_type") or []
    test_results = {
        name: {"RMSE": [], "SSIM": [], "PSNR": [], "time": [], "num": 0}
        for name in (artifact_types or ["all"])
    }

    for phase, loader in loaders:
        _spatial_mesh = [None]
        for i, batch in enumerate(loader):
            if artifact_types and not any(
                    n in artifact_types for n in batch["names"]):
                continue
            device_batch = {
                "input": jnp.asarray(batch["input"]),
                "target": jnp.asarray(batch["target"]),
                "A_emb": jnp.asarray(batch["A_emb"]),
                "type_idx": jnp.asarray(batch["type_idx"]),
            }
            if args.spatial > 1:
                from instancediff_tpu.parallel import make_mesh, shard_spatial

                if _spatial_mesh[0] is None:
                    _spatial_mesh[0] = make_mesh(
                        ("sp",), (args.spatial,),
                        devices=jax.devices()[:args.spatial])
                device_batch = shard_spatial(_spatial_mesh[0], device_batch)
            tic = time.time()
            pred = model.test(device_batch, jax.random.fold_in(root_key, i),
                              use_ema=use_ema,
                              sample_steps=test_opt.get("sample_steps"),
                              eta=test_opt.get("eta"))
            pred = np.asarray(jax.block_until_ready(pred))
            toc = time.time()
            # amortised per-sample time (batch wall / batch size). For
            # batch > 1 this is a THROUGHPUT number (1/img/s), not the
            # latency of a single sample; the reference's batch is always 1
            # (testUM.py:141-144) where the two coincide.
            per_sample_t = (toc - tic) / len(batch["names"])

            for j, name in enumerate(batch["names"]):
                if artifact_types and name not in artifact_types:
                    continue
                bucket = test_results.setdefault(
                    name, {"RMSE": [], "SSIM": [], "PSNR": [], "time": [],
                           "num": 0})
                m = eval_restoration(pred[j, ..., 0], batch["target"][j, ..., 0])
                bucket["RMSE"].append(m["RMSE"])
                bucket["SSIM"].append(m["SSIM"])
                bucket["PSNR"].append(m["PSNR"])
                bucket["time"].append(per_sample_t)
                bucket["num"] += 1

                to_save = np.concatenate(
                    [batch["input"][j, ..., 0], pred[j, ..., 0],
                     batch["target"][j, ..., 0]], axis=-1)
                save_dir = osp.join(result_root, name)
                save_raw(to_save, osp.join(
                    save_dir,
                    f"{i}_{j}_{to_save.shape[-1]}x{to_save.shape[-2]}x1.raw"))
                print(f"\n Testing {i}.{j}, {batch['GT_path'][j]}: "
                      f"RMSE={m['RMSE']}, SSIM={m['SSIM']}, PSNR={m['PSNR']} "
                      f"({per_sample_t:.2f}s)")

    for name, v in test_results.items():
        if v["num"] == 0:
            continue
        message = name
        for k in ("RMSE", "SSIM", "PSNR"):
            message += f", AVG {k}: {sum(v[k]) / v['num']}"
        message += (f", AVG time: {sum(v['time']) / v['num']:.3f}s"
                    f" (amortised per sample; = batch latency only at batch 1)")
        print(message)
    return test_results


if __name__ == "__main__":
    main()
