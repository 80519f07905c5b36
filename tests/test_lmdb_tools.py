"""Dataset-specific LMDB builders (tools/create_lmdb.py --dataset ...)
against synthesized IAM/CVL/OpenImages directory layouts.

Covers the annotation parsing the reference hardcodes in
tools/create_iam_lmdb.py:99-124, create_iam_lmdb_from_fullImg.py:101-155,
create_cvl_lmdb.py:91-104 and create_opentext_lmdb.py:84-92.
"""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dig_tpu.data.lmdb_store import LmdbReader  # noqa: E402

TOOL = os.path.join(REPO, "tools", "create_lmdb.py")


def _img(path, w=40, h=24):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(0)
    cv2.imwrite(path, rng.integers(0, 255, (h, w, 3)).astype(np.uint8))


def _run(*args):
    return subprocess.run([sys.executable, TOOL, *args], capture_output=True,
                          text=True, check=True)


def _read_all(db):
    r = LmdbReader(db)
    try:
        n = int(r.get(b"num-samples"))
        return [(r.get(b"image-%09d" % i), r.get(b"label-%09d" % i).decode())
                for i in range(1, n + 1)]
    finally:
        r.close()


def test_iam_builder(tmp_path):
    root = tmp_path / "words"
    # words.txt: id seg gray x y w h tag label
    annot = tmp_path / "words.txt"
    annot.write_text(
        "# comment line\n"
        "a01-000u-00-00 ok 154 408 768 27 51 AT A\n"
        "a01-000u-00-01 ok 154 507 766 213 48 NN MOVE\n"
        "a01-000u-00-02 err 154 796 764 70 50 TO to\n"     # bad segmentation
        "b02-000-00-00 ok 154 10 10 20 20 NN other\n"      # not in split
    )
    split = tmp_path / "trainset.txt"
    split.write_text("a01-000u-00\n")
    _img(str(root / "a01" / "a01-000u" / "a01-000u-00-00.png"))
    _img(str(root / "a01" / "a01-000u" / "a01-000u-00-01.png"))
    out = str(tmp_path / "iam_db")
    _run(out, "--dataset", "iam", "--root", str(root),
         "--annot", str(annot), "--split", str(split))
    samples = _read_all(out)
    assert [s[1] for s in samples] == ["A", "MOVE"]


def test_iam_fullimg_builder(tmp_path):
    pages = tmp_path / "images"
    _img(str(pages / "a01-000u.png"), w=600, h=900)
    annot = tmp_path / "words.txt"
    annot.write_text(
        "a01-000u-00-00 ok 154 10 20 40 30 AT A\n"
        "a01-000u-00-01 ok 154 100 200 50 40 NN MOVE\n"
    )
    split = tmp_path / "trainset.txt"
    split.write_text("a01-000u-00\n")
    crop_dir = str(tmp_path / "crops")
    out = str(tmp_path / "iamf_db")
    _run(out, "--dataset", "iam_fullimg", "--root", str(pages),
         "--annot", str(annot), "--split", str(split), "--crop_dir", crop_dir)
    samples = _read_all(out)
    assert [s[1] for s in samples] == ["A", "MOVE"]
    # crops actually cut from the page at the annotated boxes
    crop = cv2.imread(os.path.join(crop_dir, "a01-000u-00-00.png"))
    assert crop.shape[:2] == (30, 40)


def test_cvl_builder(tmp_path):
    root = tmp_path / "words"
    _img(str(root / "0053" / "0053-1-0-0-Imagine.tif"))
    _img(str(root / "0053" / "0053-1-0-1-all.tif"))
    _img(str(root / "0071" / "0071-2-3-4-Grüße.tif"))  # umlaut -> dropped
    out = str(tmp_path / "cvl_db")
    _run(out, "--dataset", "cvl", "--root", str(root))
    samples = _read_all(out)
    assert [s[1] for s in samples] == ["Imagine", "all"]


def test_opentext_builder(tmp_path):
    root = tmp_path / "open_images"
    _img(str(root / "training_1_set" / "x.jpg"))
    _img(str(root / "training_1_set" / "skip.png"))  # non-jpg excluded
    _img(str(root / "validation_set" / "y.jpg"))
    out = str(tmp_path / "ot_db")
    _run(out, "--dataset", "opentext", "--root", str(root),
         "--subdirs", "training_1_set", "validation_set")
    samples = _read_all(out)
    assert [s[1] for s in samples] == ["###", "###"]
