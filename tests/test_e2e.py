"""End-to-end driver tests: trainUM -> checkpoint -> testUM on a synthetic
dataset (the SURVEY.md SS7 step-4 'minimum end-to-end slice', CPU-runnable)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def e2e_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    from instancediff_tpu.data.synthetic import write_synthetic_index

    index = write_synthetic_index(
        str(root / "data"), n_train=2, n_val=1, n_test=1, res=16,
        artifact_types=["speckle in OCT"], emb_dim=16, seed=0)
    cfg = textwrap.dedent(f"""
    name: e2e_test
    model: learnableFD
    gpu_ids: [0]
    resolution: 16
    artifact_type: ['speckle in OCT']
    type_map_ind:
      speckle in OCT: 0
    datasets:
      train:
        name: train_dataset
        mode: SpeckleMed
        max_dataset_size: 2
        batch_size: 2
        resolution: 16
        emb_dim: 16
        dataset_file: {index}
        use_artifact_type: ['speckle in OCT']
      val:
        name: val_dataset
        mode: SpeckleMed
        max_dataset_size: 1
        batch_size: 1
        resolution: 16
        emb_dim: 16
        dataset_file: {index}
        use_artifact_type: ['speckle in OCT']
    path:
      root: {root}
      resume_state: ~
    train:
      dist: False
      which_sde: driftSDE
      which_model: DriftNoise
      nepoch: 1
      manual_seed: 0
      val_freq: 1000000
    logger:
      print_freq: 1000
      save_checkpoint_freq: 1000000
    test:
      pth_dir: {root}/experiments/e2e_test/models
      iter: latest
      use_ema: true
      result_dir: {root}/results
    models:
      DriftNoise:
        module_name: drift_noise_model
        class_name: CLIPDriftModel
        nnet_settings: &tinynet
          module_name: MSM_degEmb_Unet
          class_name: LearnableForwardUNet_MultiScoreMap
          in_nc: 2
          out_nc: 5
          nf: 8
          ch_mult: [1, 2]
          num_res_blocks: 1
          context_dim: 16
          text_module: scoremap
          score_map_chan: 4
          if_MultiScoreMap: True
        dnet_settings: *tinynet
        use_image_context: True
        if_MultiScoreMap: True
        score_map_ch_mult: [1, 1]
        score_map_ngf: 8
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


def test_train_then_test_roundtrip(e2e_env, monkeypatch, capsys):
    import trainUM
    import testUM

    monkeypatch.chdir(e2e_env["root"])
    monkeypatch.setattr(sys, "argv", ["trainUM.py", f"-opt={e2e_env['cfg']}"])
    trainUM.main()

    models_dir = os.path.join(e2e_env["root"], "experiments", "e2e_test", "models")
    files = os.listdir(models_dir)
    assert "latest_DN.ckpt" in files and "lastest_DN_ema.ckpt" in files

    monkeypatch.setattr(sys, "argv", ["testUM.py", f"-opt={e2e_env['cfg']}"])
    results = testUM.main()
    out = capsys.readouterr().out
    assert "AVG PSNR" in out
    bucket = results["speckle in OCT"]
    assert bucket["num"] >= 1
    assert all(p > 0 for p in bucket["PSNR"])
    # raw LQ|pred|GT dump exists
    dump_dir = os.path.join(e2e_env["root"], "results", "speckle in OCT")
    assert any(f.endswith(".raw") for f in os.listdir(dump_dir))
