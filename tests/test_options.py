import os
import textwrap

from instancediff_tpu.config import parse, dict_to_nonedict, NoneDict, check_resume


CFG = textwrap.dedent(
    """
    name: unit_test_exp
    model: learnableFD
    gpu_ids: [0, 1]
    artifact_type: ['speckle in OCT', 'Gaussian noise in MRI']
    type_map_ind:
      speckle in OCT: 0
      Gaussian noise in MRI: 4
    degradation:
      sigma: 25
      noise_type: G
      scale: 4
    datasets:
      train:
        name: train_dataset
        mode: SpeckleMed
        batch_size: 4
        dataset_file: dataset/dataset_file.json
      val:
        name: val_dataset
        mode: SpeckleMed
        batch_size: 1
        dataset_file: dataset/dataset_file.json
    path:
      pretrain_model_G: ~
      resume_state: ~
    train:
      which_sde: driftSDE
      which_model: DriftNoise
      nepoch: 5
    logger:
      print_freq: 2
      save_checkpoint_freq: 4
    sdes:
      driftSDE:
        class_name: driftSDE
        T: 10
        max_sigma: 0.4
        drift_schedule: sigmoid
        noise_schedule: sigmoid
    """
)


def _write_cfg(tmp_path, text=CFG):
    p = tmp_path / "cfg.yml"
    p.write_text(text)
    return str(p)


def test_parse_train(tmp_path):
    opt = parse(_write_cfg(tmp_path), is_train=True)
    assert opt["is_train"] is True
    assert opt["n_devices"] == 2
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 4
    assert opt["datasets"]["val"]["phase"] == "val"
    assert opt["path"]["experiments_root"].endswith("experiments/unit_test_exp")
    assert opt["path"]["models"].endswith("models")
    assert opt["path"]["training_state"].endswith("training_state")


def test_parse_test_mode(tmp_path):
    opt = parse(_write_cfg(tmp_path), is_train=False)
    assert "results_root" in opt["path"]
    assert "experiments_root" not in opt["path"]


def test_debug_overrides(tmp_path):
    opt = parse(_write_cfg(tmp_path, CFG.replace("unit_test_exp", "debug_exp")), is_train=True)
    assert opt["train"]["val_freq"] == 8
    assert opt["logger"]["print_freq"] == 2
    assert opt["logger"]["save_checkpoint_freq"] == 8


def test_nonedict():
    nd = dict_to_nonedict({"a": 1, "b": {"c": None}, "lst": [{"d": 2}]})
    assert isinstance(nd, NoneDict)
    assert nd["missing_key"] is None
    assert nd["b"]["also_missing"] is None
    assert nd["lst"][0]["d"] == 2


def test_check_resume(tmp_path):
    opt = parse(_write_cfg(tmp_path), is_train=True)
    opt = dict_to_nonedict(opt)
    opt["path"]["resume_state"] = "some/state/100.state"
    check_resume(opt, 100)
    # rewrites the names load_bundle actually consumes (DN/NN/DP/NP), with
    # the reference's G key aliased to the drift-net bundle
    for tag in ("DN", "NN", "DP", "NP"):
        assert opt["path"][f"pretrain_model_{tag}"].endswith(f"100_{tag}.ckpt")
        assert opt["path"][f"pretrain_model_{tag}"].startswith(opt["path"]["models"])
    assert opt["path"]["pretrain_model_G"] == opt["path"]["pretrain_model_DN"]
