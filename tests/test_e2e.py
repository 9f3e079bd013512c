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


def _render_resume_cfg(root, index, nepoch, resume_state="~", name="resume_e2e"):
    return textwrap.dedent(f"""
    name: {name}
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
        max_dataset_size: 4
        batch_size: 2
        resolution: 16
        emb_dim: 16
        dataset_file: {index}
        use_artifact_type: ['speckle in OCT']
    path:
      root: {root}
      resume_state: {resume_state}
    train:
      dist: False
      which_sde: driftSDE
      which_model: DriftNoise
      nepoch: {nepoch}
      manual_seed: 0
      val_freq: 1000000
    logger:
      print_freq: 1000
      save_checkpoint_freq: 2
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


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    """VERDICT r1 item 7: resume from `{iter}.state` must reproduce the
    uninterrupted run exactly — params AND EMA — even when the rolling
    lastest_*_ema files were clobbered by saves after the resume point."""
    import trainUM
    from instancediff_tpu.data.synthetic import write_synthetic_index

    index = write_synthetic_index(
        str(tmp_path / "data"), n_train=4, n_val=0, n_test=0, res=16,
        artifact_types=["speckle in OCT"], emb_dim=16, seed=0)

    def run(root, nepoch, resume_state="~"):
        os.makedirs(root, exist_ok=True)
        cfg_path = os.path.join(root, f"cfg_{nepoch}.yml")
        with open(cfg_path, "w") as f:
            f.write(_render_resume_cfg(root, index, nepoch, resume_state))
        monkeypatch.chdir(root)
        monkeypatch.setattr(sys, "argv", ["trainUM.py", f"-opt={cfg_path}"])
        trainUM.main()
        return os.path.join(root, "experiments", "resume_e2e")

    # A: uninterrupted 3 epochs (6 iters; checkpoints at 2, 4, 6)
    exp_a = run(str(tmp_path / "a"), nepoch=3)
    # B: 2 epochs — saves 2.state at epoch-0 end, then KEEPS TRAINING through
    # epoch 1 (overwriting the rolling lastest_*_ema files at iter 4)
    exp_b = run(str(tmp_path / "b"), nepoch=2)
    state_2 = os.path.join(exp_b, "training_state", "2.state")
    assert os.path.isfile(state_2)
    # C: resume from B's epoch-0 checkpoint, run to 3 epochs total
    exp_c = run(str(tmp_path / "b"), nepoch=3, resume_state=state_2)

    for fname in ("latest_DN.ckpt", "latest_NN.ckpt", "latest_DP.ckpt",
                  "latest_NP.ckpt", "lastest_DN_ema.ckpt", "lastest_NN_ema.ckpt"):
        fa = os.path.join(exp_a, "models", fname)
        fc = os.path.join(exp_c, "models", fname)
        assert os.path.isfile(fa), fname
        with open(fa, "rb") as a, open(fc, "rb") as c:
            assert a.read() == c.read(), f"{fname} differs after resume"


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


def test_testUM_spatial_matches_single_device(e2e_env, monkeypatch, capsys):
    """`testUM --spatial N` (H sharded over an ('sp',) mesh) must drive end
    to end and reproduce the single-device metrics: the sampler noise is
    threefry (value-identical under any sharding) and the H-sharded graph is
    proven bit-identical at the library level (test_spatial.py)."""
    import trainUM
    import testUM

    monkeypatch.chdir(e2e_env["root"])
    models_dir = os.path.join(e2e_env["root"], "experiments", "e2e_test",
                              "models")
    if not os.path.isdir(models_dir):  # run standalone: train first
        monkeypatch.setattr(sys, "argv",
                            ["trainUM.py", f"-opt={e2e_env['cfg']}"])
        trainUM.main()

    monkeypatch.setattr(sys, "argv", ["testUM.py", f"-opt={e2e_env['cfg']}"])
    ref = testUM.main()
    monkeypatch.setattr(
        sys, "argv", ["testUM.py", f"-opt={e2e_env['cfg']}", "--spatial", "2"])
    sharded = testUM.main()
    capsys.readouterr()

    rb, sb = ref["speckle in OCT"], sharded["speckle in OCT"]
    assert sb["num"] == rb["num"] >= 1
    for k in ("PSNR", "SSIM", "RMSE"):
        for a, b in zip(rb[k], sb[k]):
            assert abs(a - b) < 1e-4, (k, a, b)
