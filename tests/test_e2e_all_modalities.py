"""All-in-one restoration across the five modalities from ONE model/checkpoint
through the real drivers (BASELINE.json config 4)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALL5 = ["speckle in OCT", "speckle in ultra sound", "noise in cryo-EM image",
        "noise in low dose CT", "Gaussian noise in MRI"]


@pytest.fixture(scope="module")
def all5_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_all5")
    from instancediff_tpu.data.synthetic import write_synthetic_index

    index = write_synthetic_index(
        str(root / "data"), n_train=5, n_val=0, n_test=5, res=16,
        artifact_types=ALL5, emb_dim=8, seed=3)
    types_yaml = "[" + ", ".join(f"'{t}'" for t in ALL5) + "]"
    cfg = textwrap.dedent(f"""
    name: e2e_all5
    model: learnableFD
    gpu_ids: [0]
    resolution: 16
    artifact_type: {types_yaml}
    type_map_ind:
      speckle in OCT: 0
      speckle in ultra sound: 1
      noise in cryo-EM image: 2
      noise in low dose CT: 3
      Gaussian noise in MRI: 4
    datasets:
      train:
        name: train_dataset
        mode: SpeckleMed
        max_dataset_size: 5
        batch_size: 5
        resolution: 16
        emb_dim: 8
        dataset_file: {index}
        use_artifact_type: {types_yaml}
      test:
        name: test_dataset
        mode: SpeckleMed
        max_dataset_size: 5
        batch_size: 1
        resolution: 16
        emb_dim: 8
        dataset_file: {index}
        use_artifact_type: {types_yaml}
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
      pth_dir: {root}/experiments/e2e_all5/models
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


def test_one_checkpoint_restores_all_five(all5_env, monkeypatch, capsys):
    import trainUM
    import testUM

    monkeypatch.chdir(all5_env["root"])
    monkeypatch.setattr(sys, "argv", ["trainUM.py", f"-opt={all5_env['cfg']}"])
    trainUM.main()

    monkeypatch.setattr(sys, "argv", ["testUM.py", f"-opt={all5_env['cfg']}"])
    results = testUM.main()
    out = capsys.readouterr().out
    # one checkpoint, all five artifact types evaluated with per-type averages
    evaluated = [t for t in ALL5 if results.get(t, {}).get("num", 0) >= 1]
    assert len(evaluated) == 5, f"only evaluated {evaluated}"
    assert out.count("AVG PSNR") >= 5


def test_batched_on_device_emb_eval(all5_env, monkeypatch, capsys):
    """Batched multi-image sampling with emb_A computed ON DEVICE by the
    ViT tower (BASELINE.json config 3) through the real test driver."""
    import yaml
    import testUM

    with open(all5_env["cfg"]) as f:
        cfg = yaml.safe_load(f)
    cfg["test"]["batch_size"] = 5
    cfg["test"]["on_device_emb"] = True
    cfg["models"]["DriftNoise"]["tiny_text_encoder"] = True
    cfg2 = os.path.join(all5_env["root"], "cfg_batched.yml")
    with open(cfg2, "w") as f:
        yaml.dump(cfg, f)

    monkeypatch.chdir(all5_env["root"])
    monkeypatch.setattr(sys, "argv", ["testUM.py", f"-opt={cfg2}"])
    results = testUM.main()
    capsys.readouterr()
    assert sum(v["num"] for v in results.values()) == 5
