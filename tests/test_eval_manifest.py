"""Pinned eval-set manifest (tools/eval_manifest.py): the mechanism that
makes cross-round quality tables comparable (VERDICT r4 weak #3)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.eval_manifest import verify_manifest, write_manifest


def _mkdata(root):
    os.makedirs(root, exist_ok=True)
    for name, payload in [("a.raw", b"\x00\x01\x02"), ("idx.json", b"{}"),
                          ("sub/b.raw", b"zzzz")]:
        p = os.path.join(root, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(payload)


def test_write_then_verify_roundtrip(tmp_path):
    root = str(tmp_path / "ds")
    _mkdata(root)
    path, n = write_manifest(root, generator="python gen.py --seed 0")
    assert n == 3 and os.path.isfile(path)
    ok, problems, generator = verify_manifest(root)
    assert ok and not problems
    assert generator == "python gen.py --seed 0"


def test_verify_catches_mismatch_missing_and_extra(tmp_path):
    root = str(tmp_path / "ds")
    _mkdata(root)
    write_manifest(root)
    with open(os.path.join(root, "a.raw"), "wb") as f:
        f.write(b"corrupted")
    os.remove(os.path.join(root, "idx.json"))
    with open(os.path.join(root, "new.raw"), "wb") as f:
        f.write(b"x")
    ok, problems, _ = verify_manifest(root)
    assert not ok
    kinds = {p.split(":")[0] for p in problems}
    assert kinds == {"hash mismatch", "missing", "extra (not in manifest)"}


def test_verify_without_manifest_fails(tmp_path):
    root = str(tmp_path / "ds")
    _mkdata(root)
    ok, problems, _ = verify_manifest(root)
    assert not ok and "no MANIFEST.sha256" in problems[0]


def test_flagship_manifest_is_committed_and_records_generator():
    """The flagship eval set must stay pinned: manifest present, carries the
    exact regeneration command (seed-0 regeneration verified bit-exact at
    pin time)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "dataset", "flagship224", "MANIFEST.sha256")
    assert os.path.isfile(path), "dataset/flagship224/MANIFEST.sha256 missing"
    first = open(path).readline()
    assert first.startswith("# generator: ") and "--seed 0" in first
