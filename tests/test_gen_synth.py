"""tools/gen_synth.py smoke: splits land in the reference LMDB schema,
train/labeled share a word pool disjoint from test, both difficulty
regimes decode."""

import os
import subprocess
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dig_tpu.data.lmdb_store import LmdbReader  # noqa: E402


def _labels(db):
    r = LmdbReader(db)
    try:
        n = int(r.get(b"num-samples"))
        out = []
        for i in range(1, n + 1):
            buf = r.get(b"image-%09d" % i)
            img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
            assert img is not None and img.size > 0
            out.append(r.get(b"label-%09d" % i).decode())
        return out
    finally:
        r.close()


def test_gen_synth_splits(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_synth.py"),
         str(tmp_path), "--train", "12", "--labeled", "6", "--test", "8",
         "--train_words", "20", "--test_words", "10", "--max_word_len", "6",
         "--easy", "--seed", "3"],
        check=True, capture_output=True, text=True)
    train = _labels(str(tmp_path / "train"))
    labeled = _labels(str(tmp_path / "labeled"))
    test = _labels(str(tmp_path / "test"))
    assert (len(train), len(labeled), len(test)) == (12, 6, 8)
    assert all(2 <= len(w) <= 6 for w in train + labeled + test)
    # labeled draws from the train pool; test pool is disjoint
    assert not (set(train) | set(labeled)) & set(test)
