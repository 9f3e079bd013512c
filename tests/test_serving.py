"""Serving API: Restorer padding/chunking and config loading."""

import numpy as np
import pytest

from instancediff_tpu.serving import Restorer
from instancediff_tpu.models.drift_model import CLIPDriftEngine
from instancediff_tpu.sde import DriftSDE

TINY = dict(in_nc=2, out_nc=5, nf=4, ch_mult=[1, 2], context_dim=8,
            text_module="scoremap", score_map_chan=2, if_MultiScoreMap=True,
            num_res_blocks=1)


@pytest.fixture(scope="module")
def restorer():
    eng = CLIPDriftEngine(
        dnet_settings=TINY, nnet_settings=TINY, score_map_ch_mult=(1, 1),
        score_map_ngf=4, use_image_context=True, CLIP_Type="CLIP",
        tiny_text_encoder=True, sde=DriftSDE(T=4, max_sigma=0.4),
        image_size=8, if_train=False, seed=0)
    return Restorer(eng, batch_size=4, use_ema=False)


def test_restore_ragged_batch(restorer):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (6, 8, 8, 1)).astype(np.float32)  # 6 % 4 != 0
    out = restorer.restore(imgs, "speckle in OCT")
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()


def test_restore_mixed_types(restorer):
    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    out = restorer.restore(imgs, ["speckle in OCT", "Gaussian noise in MRI"])
    assert out.shape == imgs.shape


def test_restore_deterministic_padding(restorer):
    """Padded samples must not change the real samples' outputs (same
    compiled batch, per-sample independence up to batch statistics — there
    are none: no batchnorm)."""
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32)
    eng = restorer.engine
    # fresh Restorers so both calls fold the same RNG key
    full = Restorer(eng, batch_size=4, use_ema=False).restore(imgs, "speckle in OCT")
    part = Restorer(eng, batch_size=4, use_ema=False).restore(imgs[:3], "speckle in OCT")
    np.testing.assert_allclose(part, full[:3], atol=1e-5)


def test_restorer_from_config(tmp_path):
    """Config-driven construction (tiny_cpu.yml schema) builds a working
    Restorer without a checkpoint (random weights)."""
    import textwrap

    cfg = textwrap.dedent("""
    name: serving_cfg
    resolution: 8
    type_map_ind:
      speckle in OCT: 0
      Gaussian noise in MRI: 4
    train:
      which_sde: driftSDE
      which_model: DriftNoise
    models:
      DriftNoise:
        module_name: drift_noise_model
        class_name: CLIPDriftModel
        nnet_settings: &n
          in_nc: 2
          out_nc: 5
          nf: 4
          ch_mult: [1, 2]
          num_res_blocks: 1
          context_dim: 8
          text_module: scoremap
          score_map_chan: 2
          if_MultiScoreMap: True
        dnet_settings: *n
        use_image_context: True
        if_MultiScoreMap: True
        score_map_ch_mult: [1, 1]
        score_map_ngf: 4
        CLIP_Type: CLIP
        tiny_text_encoder: True
    sdes:
      driftSDE:
        class_name: driftSDE
        T: 4
        max_sigma: 0.4
        drift_schedule: sigmoid
        noise_schedule: sigmoid
    """)
    p = tmp_path / "cfg.yml"
    p.write_text(cfg)
    r = Restorer.from_config(str(p), batch_size=2)
    assert r.type_map["Gaussian noise in MRI"] == 4
    imgs = np.zeros((1, 8, 8, 1), np.float32)
    out = r.restore(imgs, "Gaussian noise in MRI")
    assert out.shape == imgs.shape and np.isfinite(out).all()


def test_restore_cli(tmp_path, capsys):
    """tools/restore.py end-to-end: .raw + .npy inputs -> restored raw/png
    files, with per-modality normalisation applied on the way in."""
    import sys
    import textwrap

    sys.path.insert(0, "tools")
    import restore as restore_cli

    cfg = textwrap.dedent("""
    name: serving_cli_cfg
    resolution: 8
    type_map_ind:
      speckle in OCT: 0
      Gaussian noise in MRI: 4
    train:
      which_sde: driftSDE
      which_model: DriftNoise
    models:
      DriftNoise:
        module_name: drift_noise_model
        class_name: CLIPDriftModel
        nnet_settings: &n
          in_nc: 2
          out_nc: 5
          nf: 4
          ch_mult: [1, 2]
          num_res_blocks: 1
          context_dim: 8
          text_module: scoremap
          score_map_chan: 2
          if_MultiScoreMap: True
        dnet_settings: *n
        use_image_context: True
        if_MultiScoreMap: True
        score_map_ch_mult: [1, 1]
        score_map_ngf: 4
        CLIP_Type: CLIP
        tiny_text_encoder: True
    sdes:
      driftSDE:
        class_name: driftSDE
        T: 4
        max_sigma: 0.4
        drift_schedule: sigmoid
        noise_schedule: sigmoid
    """)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(cfg)

    rng = np.random.default_rng(0)
    raw_in = tmp_path / "scan0.raw"
    rng.uniform(0, 1, (8, 8)).astype(np.float32).tofile(raw_in)
    npy_in = tmp_path / "scan1.npy"
    np.save(npy_in, rng.uniform(0, 1, (8, 8)).astype(np.float32))

    out_dir = tmp_path / "out"
    restore_cli.main([
        f"-opt={cfg_path}", "--images", str(raw_in), str(npy_in),
        "--type", "speckle in OCT", "Gaussian noise in MRI",
        "--out", str(out_dir), "--no-ema", "--sample-steps", "2",
    ])
    for stem in ("scan0", "scan1"):
        raw_out = out_dir / f"{stem}_restored.raw"
        assert raw_out.exists()
        rec = np.fromfile(raw_out, dtype=np.float32)
        assert rec.shape == (64,) and np.isfinite(rec).all()


def test_restore_cli_type_count_mismatch(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import pytest
    import restore as restore_cli

    raw_in = tmp_path / "x.raw"
    np.zeros((8, 8), np.float32).tofile(raw_in)
    with pytest.raises(SystemExit):
        restore_cli.main(["--images", str(raw_in), str(raw_in),
                          "--type", "a", "b", "c", "--out", str(tmp_path)])


def test_restore_eta_passthrough(restorer):
    """eta=0 (deterministic DDIM-style steps) flows through to the sampler:
    two eta=0 restores with different seeds agree (the only remaining
    randomness is the x_T init), and differ from the eta=1 ancestral path."""
    rng = np.random.default_rng(3)
    imgs = rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    eng = restorer.engine
    a = Restorer(eng, batch_size=2, use_ema=False, eta=0.0, seed=1).restore(
        imgs, "speckle in OCT")
    b = Restorer(eng, batch_size=2, use_ema=False, eta=1.0, seed=1).restore(
        imgs, "speckle in OCT")
    assert a.shape == imgs.shape and np.isfinite(a).all()
    assert not np.allclose(a, b)


def test_restore_spatial_matches_single_device(restorer):
    """Serving with image-H sharding (spatial=2) returns the same result as
    the unsharded path (same keys, same compiled math; XLA SPMD inserts the
    conv halos/GN reductions — tests/test_spatial.py proves the engine-level
    equality, this covers the Restorer wiring)."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    rng = np.random.default_rng(4)
    imgs = rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    eng = restorer.engine
    base = Restorer(eng, batch_size=2, use_ema=False, seed=7).restore(
        imgs, "speckle in OCT")
    shard = Restorer(eng, batch_size=2, use_ema=False, seed=7,
                     spatial=2).restore(imgs, "speckle in OCT")
    np.testing.assert_allclose(shard, base, atol=1e-5)


def test_restore_cli_png_and_unknown_type(tmp_path):
    """PNG inputs are unit-range (no second modality clamp-division — it
    would collapse CT/cryo-EM PNGs to ~0), and a typo'd --type is rejected
    instead of silently conditioning on artifact index 0."""
    import sys

    import pytest
    from PIL import Image

    sys.path.insert(0, "tools")
    import restore as restore_cli

    png = tmp_path / "x.png"
    Image.fromarray((np.ones((8, 8)) * 200).astype(np.uint8)).save(png)
    arr, unit = restore_cli.load_image(str(png), None)
    assert unit is True and abs(float(arr.max()) - 200 / 255) < 1e-6

    raw = tmp_path / "x.raw"
    np.full((8, 8), 100.0, np.float32).tofile(raw)
    arr2, unit2 = restore_cli.load_image(str(raw), 8)
    assert unit2 is False

    import textwrap

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(textwrap.dedent("""
    name: cli_badtype
    resolution: 8
    type_map_ind: {speckle in OCT: 0}
    train: {which_sde: driftSDE, which_model: DriftNoise}
    models:
      DriftNoise:
        module_name: drift_noise_model
        class_name: CLIPDriftModel
        nnet_settings: &n {in_nc: 2, out_nc: 5, nf: 4, ch_mult: [1, 2],
                           num_res_blocks: 1, context_dim: 8,
                           text_module: scoremap, score_map_chan: 2,
                           if_MultiScoreMap: True}
        dnet_settings: *n
        use_image_context: True
        if_MultiScoreMap: True
        score_map_ch_mult: [1, 1]
        score_map_ngf: 4
        CLIP_Type: CLIP
        tiny_text_encoder: True
    sdes:
      driftSDE: {class_name: driftSDE, T: 2, max_sigma: 0.4,
                 drift_schedule: sigmoid, noise_schedule: sigmoid}
    """))
    with pytest.raises(SystemExit, match="unknown --type"):
        restore_cli.main([f"-opt={cfg}", "--images", str(raw),
                          "--type", "no such artifact", "--res", "8",
                          "--out", str(tmp_path / "out"), "--no-ema"])


def test_restore_rejects_unknown_type(restorer):
    imgs = np.zeros((1, 8, 8, 1), np.float32)
    with pytest.raises(KeyError, match="unknown artifact type"):
        restorer.restore(imgs, "gaussian noise in MRI")  # wrong case


def test_restore_rejects_type_count_mismatch(restorer):
    imgs = np.zeros((3, 8, 8, 1), np.float32)
    with pytest.raises(ValueError, match="artifact types"):
        restorer.restore(imgs, ["speckle in OCT"] * 2)
