"""Distributed training through the real driver: train.dist=True shards the
jitted step over all visible devices (8 virtual CPU devices via conftest) —
the driver-level check of the DDP-replacement path (SURVEY.md SS2.11/SS2.12)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def dist_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_dist")
    from instancediff_tpu.data.synthetic import write_synthetic_index

    index = write_synthetic_index(
        str(root / "data"), n_train=8, n_val=1, n_test=1, res=16,
        artifact_types=["speckle in OCT"], emb_dim=8, seed=2)
    cfg = textwrap.dedent(f"""
    name: e2e_dist
    model: learnableFD
    gpu_ids: [0, 1, 2, 3, 4, 5, 6, 7]
    resolution: 16
    artifact_type: ['speckle in OCT']
    type_map_ind:
      speckle in OCT: 0
    datasets:
      train:
        name: train_dataset
        mode: SpeckleMed
        max_dataset_size: 8
        batch_size: 8
        resolution: 16
        emb_dim: 8
        dataset_file: {index}
        use_artifact_type: ['speckle in OCT']
    path:
      root: {root}
      resume_state: ~
    train:
      dist: True
      which_sde: driftSDE
      which_model: DriftNoise
      nepoch: 1
      manual_seed: 0
      val_freq: 1000000
    logger:
      print_freq: 1
      save_checkpoint_freq: 1000000
    models:
      DriftNoise:
        module_name: drift_noise_model
        class_name: CLIPDriftModel
        nnet_settings: &tinynet
          module_name: MSM_degEmb_Unet
          class_name: LearnableForwardUNet_MultiScoreMap
          in_nc: 2
          out_nc: 5
          nf: 4
          ch_mult: [1, 2]
          num_res_blocks: 1
          context_dim: 8
          text_module: scoremap
          score_map_chan: 2
          if_MultiScoreMap: True
        dnet_settings: *tinynet
        use_image_context: True
        if_MultiScoreMap: True
        score_map_ch_mult: [1, 1]
        score_map_ngf: 4
        CLIP_Type: CLIP
        tiny_text_encoder: True
        drift_net_lr: !!float 1e-3
        noise_net_lr: !!float 1e-3
        weight_decay_drift: !!float 1e-4
        eta_min: !!float 1e-6
        beta1: 0.9
        beta2: 0.99
        optimize_type: inputRes
        optimize_target: std
    sdes:
      driftSDE:
        class_name: driftSDE
        T: 4
        max_sigma: 0.4
        drift_schedule: sigmoid
        noise_schedule: sigmoid
    """)
    cfg_path = root / "cfg.yml"
    cfg_path.write_text(cfg)
    return {"root": str(root), "cfg": str(cfg_path)}


def test_dist_training_runs_on_mesh(dist_env, monkeypatch, caplog):
    import jax

    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    import trainUM

    monkeypatch.chdir(dist_env["root"])
    monkeypatch.setattr(sys, "argv", ["trainUM.py", f"-opt={dist_env['cfg']}"])
    trainUM.main()

    models_dir = os.path.join(dist_env["root"], "experiments", "e2e_dist", "models")
    assert "latest_DN.ckpt" in os.listdir(models_dir)
    # the mesh was actually built (world_size 8 logged)
    text = " ".join(r.getMessage() for r in caplog.records)
    assert "world_size=8" in text
    assert "SPMD mesh" in text
