"""Native C++ IO runtime: correctness vs the NumPy reference path and
integration through the file dataset's batch_load."""

import numpy as np
import pytest

from instancediff_tpu.data import native_io
from instancediff_tpu.data.synthetic import write_synthetic_index
from instancediff_tpu.data.med_dataset import SpeckleMedDataset, DEFAULT_TYPE_MAP


def test_native_lib_builds():
    assert native_io.available(), "native IO lib failed to build/load"


def test_read_batch_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    paths, modes, refs = [], [], []
    specs = [("affine", lambda a: a * 2 - 1),
             ("ct", lambda a: np.clip(a, 0, 1800) / 1800 * 2 - 1),
             ("cryo", lambda a: np.clip(a, 0, 255) / 255 * 2 - 1),
             ("raw", lambda a: a)]
    for i, (mode, fn) in enumerate(specs):
        arr = (rng.uniform(-10, 2000, 64)).astype(np.float32)
        p = str(tmp_path / f"f{i}.raw")
        arr.tofile(p)
        paths.append(p)
        modes.append(native_io.MODES[mode])
        refs.append(fn(arr.astype(np.float64)).astype(np.float32))
    out = native_io.read_batch(paths, 64, modes, n_threads=2)
    for i, ref in enumerate(refs):
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


def test_read_batch_missing_file_falls_back_cleanly(tmp_path):
    p = str(tmp_path / "exists.raw")
    np.ones(8, np.float32).tofile(p)
    with pytest.raises(FileNotFoundError):
        native_io.read_batch([p, str(tmp_path / "missing.raw")], 8,
                             [3, 3])


def test_mode_for_artifact_names():
    # only 'scatter artifact in CT' gets the /1800 clamp (MedSpeckle.py:56-61);
    # low-dose CT is already-[0,1] data and must be plain affine
    assert native_io.mode_for("noise in low dose CT") == native_io.MODES["affine"]
    assert native_io.mode_for("scatter artifact in CT") == native_io.MODES["ct"]
    assert native_io.mode_for("noise in cryo-EM image") == native_io.MODES["cryo"]
    assert native_io.mode_for("speckle in OCT") == native_io.MODES["affine"]


def test_dataset_batch_load_matches_getitem(tmp_path):
    index = write_synthetic_index(str(tmp_path / "d"), n_train=4, n_val=0,
                                  n_test=0, res=16, emb_dim=8)
    ds = SpeckleMedDataset(index, phase="train", resolution=16, emb_dim=8,
                           use_artifact_type=list(DEFAULT_TYPE_MAP))
    batch = ds.batch_load([0, 1, 2, 3])
    assert batch["input"].shape == (4, 16, 16, 1)
    assert batch["A_emb"].shape == (4, 1, 8)
    for i in range(4):
        item = ds[i]
        np.testing.assert_allclose(batch["input"][i], item["LQ"], atol=1e-6)
        np.testing.assert_allclose(batch["target"][i], item["GT"], atol=1e-6)
        np.testing.assert_allclose(batch["A_emb"][i], item["A_emb"], atol=1e-6)
        assert batch["type_idx"][i] == item["type_idx"]
        assert batch["names"][i] == item["name"]
