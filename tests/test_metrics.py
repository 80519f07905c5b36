import numpy as np

from dig_tpu.metrics.text import (
    accuracy,
    ctc_accuracy,
    edit_distance,
    levenshtein,
    recognition_f_measure,
)
from dig_tpu.utils.charset import build_charset

CS = build_charset("ALLCASES_SYMBOLS", max_len=10)


def enc(word):
    label, _ = CS.encode(word)
    return label


def test_accuracy_case_insensitive():
    preds = np.stack([enc("Hello"), enc("world")])
    targs = np.stack([enc("HELLO"), enc("word")])
    assert accuracy(preds, targs, CS) == 0.5


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_edit_distance():
    preds = np.stack([enc("abc")])
    targs = np.stack([enc("abd")])
    assert edit_distance(preds, targs, CS) == 1


def test_f_measure_perfect():
    preds = np.stack([enc("abc")])
    assert recognition_f_measure(preds, preds, CS) > 0.99


def test_ctc_accuracy_collapse():
    blank = CS.num_classes
    # a a blank b b -> "ab"
    a, b = CS.char_to_id("a"), CS.char_to_id("b")
    pred = np.array([[a, a, blank, b, b, blank, blank, blank, blank, blank]])
    targ = np.stack([enc("ab")])
    assert ctc_accuracy(pred, targ, CS) == 1.0
