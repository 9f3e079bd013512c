"""DDPM-baseline mode end-to-end through the real drivers
(which_model=DDPM / which_sde=ddpm — BASELINE capability parity for the
reference's CLIPDDPMModel entry, config.yml:149-167)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def ddpm_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_ddpm")
    from instancediff_tpu.data.synthetic import write_synthetic_index

    index = write_synthetic_index(
        str(root / "data"), n_train=2, n_val=1, n_test=1, res=16,
        artifact_types=["Gaussian noise in MRI"], emb_dim=8, seed=1)
    cfg = textwrap.dedent(f"""
    name: e2e_ddpm
    model: learnableFD
    gpu_ids: [0]
    resolution: 16
    artifact_type: ['Gaussian noise in MRI']
    type_map_ind:
      Gaussian noise in MRI: 4
    datasets:
      train:
        name: train_dataset
        mode: SpeckleMed
        max_dataset_size: 2
        batch_size: 2
        resolution: 16
        emb_dim: 8
        dataset_file: {index}
        use_artifact_type: ['Gaussian noise in MRI']
      val:
        name: val_dataset
        mode: SpeckleMed
        max_dataset_size: 1
        batch_size: 1
        resolution: 16
        emb_dim: 8
        dataset_file: {index}
        use_artifact_type: ['Gaussian noise in MRI']
    path:
      root: {root}
      resume_state: ~
    train:
      dist: False
      which_sde: ddpm
      which_model: DDPM
      nepoch: 1
      manual_seed: 0
      val_freq: 1000000
    logger:
      print_freq: 1000
      save_checkpoint_freq: 1000000
    test:
      pth_dir: {root}/experiments/e2e_ddpm/models
      iter: latest
      use_ema: true
      result_dir: {root}/results
    models:
      DDPM:
        module_name: ddpm_model
        class_name: CLIPDDPMModel
        net_settings:
          module_name: LearnableFDUnet
          class_name: LearnableForwardUNet
          in_nc: 2
          out_nc: 5
          nf: 4
          ch_mult: [1, 2]
          num_res_blocks: 1
          context_dim: 8
          text_module: scoremap
          score_map_chan: 2
          score_map_ngf: 4
        use_image_context: True
        CLIP_Type: CLIP
        tiny_text_encoder: True
        noise_net_lr: !!float 1e-3
        weight_decay: !!float 1e-4
        eta_min: !!float 1e-6
        beta1: 0.9
        beta2: 0.99
    sdes:
      ddpm:
        class_name: DDPM
        max_sigma: 1
        T: 4
        schedule: cosine_alpha
    """)
    cfg_path = root / "cfg.yml"
    cfg_path.write_text(cfg)
    return {"root": str(root), "cfg": str(cfg_path)}


def test_ddpm_train_then_test(ddpm_env, monkeypatch, capsys):
    import trainUM
    import testUM

    monkeypatch.chdir(ddpm_env["root"])
    monkeypatch.setattr(sys, "argv", ["trainUM.py", f"-opt={ddpm_env['cfg']}"])
    trainUM.main()

    models_dir = os.path.join(ddpm_env["root"], "experiments", "e2e_ddpm", "models")
    files = os.listdir(models_dir)
    assert "latest_NN.ckpt" in files

    monkeypatch.setattr(sys, "argv", ["testUM.py", f"-opt={ddpm_env['cfg']}"])
    results = testUM.main()
    out = capsys.readouterr().out
    assert "AVG PSNR" in out
    assert results["Gaussian noise in MRI"]["num"] >= 1
