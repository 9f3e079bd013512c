"""Training driver — CLI/semantics parity with reference trainUM.py:81-363.

Usage: ``python trainUM.py -opt=Configurations/config.yml``

Differences from the reference (TPU-native):
  * ``torch.distributed.launch`` is replaced by single-process SPMD — when
    more than one JAX device is visible the jitted train step is sharded
    over a ``('dp',)`` mesh with gradient pmean over ICI
    (``--launcher pytorch`` is accepted and ignored for CLI parity).
  * checkpoints are flax msgpack bundles in the reference layout.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np



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
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument("--launcher", choices=["none", "pytorch"], default="none",
                        help="accepted for reference-CLI parity; SPMD replaces it")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu) before backend init")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host SPMD: jax.distributed.initialize() "
                             "coordinator bootstrap (replaces the reference's "
                             "env-var rank init, trainUM.py:50-70)")
    args = parser.parse_args()

    if not args.platform:
        # tunneled-TPU boxes: bound the known init-hang failure mode before
        # touching jax (utils/backend.py); no-op when a platform is pinned
        from instancediff_tpu.utils.backend import wait_for_backend

        wait_for_backend()

    import jax

    _setup_jax_cache()
    if args.multihost:
        jax.distributed.initialize()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from instancediff_tpu.config import parse, dict_to_nonedict, dict2str
    from instancediff_tpu import data as data_pkg
    from instancediff_tpu.data import DistIterSampler
    from instancediff_tpu.models import create_model
    from instancediff_tpu.sde import create_sde
    from instancediff_tpu.utils import (
        mkdir_and_rename, mkdirs, set_random_seed, setup_logger, store_files, save_raw,
    )
    from instancediff_tpu.utils.metrics import eval_restoration
    from instancediff_tpu.parallel import make_mesh, shard_batch

    opt = parse(args.opt, is_train=True)
    opt = dict_to_nonedict(opt)

    seed = (opt["train"] or {}).get("manual_seed") or 0
    set_random_seed(seed)
    root_key = jax.random.key(seed)

    # SPMD world size: all visible devices when train.dist is set (the
    # reference's DDP world), else single device (trainUM.py:50-70 analogue)
    n_devices = jax.device_count()
    world_size = n_devices if (opt["train"] or {}).get("dist") else 1
    opt["world_size"] = world_size
    n_hosts = jax.process_count() if args.multihost else 1
    opt["n_hosts"] = n_hosts
    host_rank = jax.process_index() if args.multihost else 0

    # resume state handling (reference trainUM.py:123-131 + options.check_resume)
    resume_state_path = opt["path"].get("resume_state")
    resume_epoch, resume_iter = 0, 0

    # experiment dirs (reference trainUM.py:135-157). Only process 0 creates/
    # renames/snapshots — the reference gates all experiment-dir writes on
    # rank 0 (trainUM.py:135,287); concurrent hosts on a shared FS would race.
    is_rank0 = host_rank == 0
    if is_rank0:
        if not resume_state_path:
            mkdir_and_rename(opt["path"]["experiments_root"])
        mkdirs([opt["path"]["models"], opt["path"]["training_state"],
                opt["path"]["val_images"]])
        store_files(opt, osp.join(opt["path"]["experiments_root"], "files"))
        log_link = "./log"
        try:
            if osp.islink(log_link) or osp.exists(log_link):
                os.remove(log_link)
            os.symlink(opt["path"]["experiments_root"], log_link)
        except OSError:
            pass
    mkdirs([opt["path"]["log"]])
    logger = setup_logger("instancediff_tpu", opt["path"]["log"], "train",
                          screen=True, tofile=True)
    logger.info(dict2str(opt))
    logger.info("devices: %s (world_size=%d)", jax.devices(), world_size)

    # datasets (reference trainUM.py:159-188)
    train_loader = val_loader = None
    train_sampler = None
    any_gt_only = False
    for phase, dataset_opt in opt["datasets"].items():
        phase = phase.split("_")[0]
        dataset = data_pkg.create_dataset(dataset_opt)
        any_gt_only = any_gt_only or bool(getattr(dataset, "gt_only", False))
        if phase == "train":
            # per-host data sharding (DistIterSampler epoch-seeded semantics;
            # multi-host ranks stride the same permutation)
            train_sampler = DistIterSampler(len(dataset), num_replicas=n_hosts,
                                            rank=host_rank)
            train_loader = data_pkg.create_dataloader(dataset, dataset_opt, opt, train_sampler)
            logger.info("train dataset: %d images, %d iters/epoch",
                        len(dataset), len(train_loader))
        elif phase == "val":
            val_loader = data_pkg.create_dataloader(dataset, dataset_opt, opt)
            logger.info("val dataset: %d images", len(dataset))
    assert train_loader is not None

    # model + sde (reference trainUM.py:190-217)
    train_opt = opt["train"]
    which_model = train_opt["which_model"]
    model_opt = opt["models"][which_model]
    sde = create_sde(opt["sdes"][train_opt["which_sde"]])
    model = create_model(train_opt, model_opt, phase="train",
                         image_size=(opt.get("resolution") or 224),
                         seed=seed)
    if any_gt_only and not getattr(model, "degrade_on_device", False):
        # a GT-only dataset feeds LQ == GT placeholders; without on-device
        # degradation the model would silently train on identity pairs
        raise ValueError(
            "datasets.*.gt_only requires models.%s.degrade_on_device: true "
            "(the LQ images exist only as on-device synthesis)" % which_model)
    model.set_sde(sde)

    mesh = (make_mesh(("dp",), (world_size,), devices=jax.devices()[:world_size])
            if world_size > 1 else None)
    if mesh is not None:
        logger.info("SPMD mesh: %s", mesh)

    if resume_state_path:
        from instancediff_tpu.config.options import check_resume

        state_file = resume_state_path
        resume_epoch, resume_iter = model.resume_training(state_file)
        # reference calls check_resume after loading the state
        # (trainUM.py:123-131 via options.py:123-143): rewrite the pretrain
        # keys to the bundle files this iteration actually produced, then load
        # the weights FROM those rewritten keys (they are the contract)
        opt = check_resume(opt, resume_iter)
        load_dir, bundle_name = osp.split(opt["path"]["pretrain_model_DN"])
        load_iter = bundle_name.rsplit("_DN.ckpt", 1)[0]
        # skip the rolling lastest_*_ema files when the state carried the EMA
        # (they may have been overwritten by a later save)
        model.load(load_dir, load_iter,
                   load_ema=not getattr(model, "ema_restored", False))
        logger.info("resumed from epoch %d iter %d", resume_epoch, resume_iter)
        resume_epoch += 1  # reference re-enters at epoch+1 (trainUM.py:196-206)

    nepoch = train_opt["nepoch"]
    print_freq = (opt["logger"] or {}).get("print_freq") or 100
    save_freq = (opt["logger"] or {}).get("save_checkpoint_freq") or 1000
    val_freq = train_opt.get("val_freq") or 10**9
    max_val = 10  # reference caps inline validation at <=10 samples

    # preemption-aware checkpointing (SURVEY.md SS5.3): on SIGTERM/SIGINT the
    # loop finishes the current step, saves weights+state, and exits cleanly
    # so path.resume_state restarts from the same point.
    import signal

    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        logger.warning("signal %d received - checkpointing before exit", signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except (ValueError, OSError):
            pass  # non-main thread (e.g. under pytest)

    def preempt_save(epoch, current_iter):
        if is_rank0:
            model.save(opt["path"]["models"], current_iter)
            model.save_training_state(opt["path"]["training_state"], epoch, current_iter)
            logger.info("preemption checkpoint saved at iter %d", current_iter)

    current_iter = resume_iter
    for epoch in range(resume_epoch, nepoch):
        train_loader.set_epoch(epoch)
        model.reinit_loss_message()
        epoch_start = time.time()
        for batch in train_loader:
            current_iter += 1
            step_key = jax.random.fold_in(root_key, current_iter)
            device_batch = {
                "input": jnp.asarray(batch["input"]),
                "target": jnp.asarray(batch["target"]),
                "A_emb": jnp.asarray(batch["A_emb"]),
                "type_idx": jnp.asarray(batch["type_idx"]),
            }
            if mesh is not None:
                device_batch = shard_batch(mesh, device_batch)
            model.optimize_parameters(device_batch, step_key, epoch=epoch)

            if current_iter % print_freq == 0:
                lr = model.get_current_learning_rate(epoch)
                logger.info("epoch %d iter %d lr %.3e %s",
                            epoch, current_iter, lr, model.get_loss_message())

            if current_iter % save_freq == 0 and is_rank0:
                model.save(opt["path"]["models"], current_iter)
                model.save_training_state(opt["path"]["training_state"], epoch, current_iter)
                logger.info("checkpoint saved at iter %d", current_iter)

            if preempted["flag"]:
                preempt_save(epoch, current_iter)
                return

            # inline validation + raw dumps gated on process 0 (reference
            # trainUM.py:287 `if rank <= 0`) — avoids every host sampling and
            # writing identical files under --multihost
            if val_loader is not None and current_iter % val_freq == 0 and is_rank0:
                metrics = {"PSNR": [], "SSIM": [], "RMSE": []}
                for vi, vbatch in enumerate(val_loader):
                    if vi >= max_val:
                        break
                    vb = {
                        "input": jnp.asarray(vbatch["input"]),
                        "target": jnp.asarray(vbatch["target"]),
                        "A_emb": jnp.asarray(vbatch["A_emb"]),
                        "type_idx": jnp.asarray(vbatch["type_idx"]),
                    }
                    pred = np.asarray(model.test(vb, jax.random.fold_in(step_key, vi)))
                    m = eval_restoration(pred[0, ..., 0], vbatch["target"][0, ..., 0])
                    for k in metrics:
                        metrics[k].append(m[k])
                    concat = np.concatenate(
                        [vbatch["input"][0, ..., 0], pred[0, ..., 0],
                         vbatch["target"][0, ..., 0]], axis=-1)
                    save_raw(concat, osp.join(
                        opt["path"]["val_images"],
                        f"{current_iter}_{vi}_{concat.shape[-1]}x{concat.shape[-2]}x1.raw"))
                logger.info("VAL iter %d: PSNR %.4f SSIM %.4f RMSE %.4f",
                            current_iter,
                            float(np.mean(metrics["PSNR"])),
                            float(np.mean(metrics["SSIM"])),
                            float(np.mean(metrics["RMSE"])))

        logger.info("epoch %d done in %.1fs, %s", epoch, time.time() - epoch_start,
                    model.get_loss_message())
        if (epoch + 1) % 5 == 0 and is_rank0:  # reference epoch-%5 cadence (:350-354)
            model.save(opt["path"]["models"], current_iter)
            model.save_training_state(opt["path"]["training_state"], epoch, current_iter)

    if is_rank0:
        model.save(opt["path"]["models"], "latest")
        model.save_training_state(opt["path"]["training_state"], nepoch - 1, current_iter)
    logger.info("training complete at iter %d", current_iter)


if __name__ == "__main__":
    main()
