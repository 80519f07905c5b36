import numpy as np
import pytest

from dig_tpu.utils.charset import build_charset, normalize_text


def test_vocab_sizes():
    assert build_charset("ALLCASES_SYMBOLS").num_classes == 97
    assert build_charset("ALLCASES").num_classes == 65
    assert build_charset("LOWERCASE").num_classes == 71


def test_special_ids_order():
    cs = build_charset("ALLCASES_SYMBOLS")
    assert cs.classes[-3:] == ("EOS", "PADDING", "UNKNOWN")
    assert cs.eos_id == 94 and cs.padding_id == 95 and cs.unknown_id == 96
    assert cs.bos_id == 97


def test_encode_roundtrip():
    cs = build_charset("ALLCASES_SYMBOLS", max_len=25)
    label, length = cs.encode("Hello!")
    assert length == 7  # 6 chars + EOS
    assert label[6] == cs.eos_id
    assert (label[7:] == cs.padding_id).all()
    assert cs.decode(label) == "Hello!"


def test_lowercase_folding():
    cs = build_charset("LOWERCASE", max_len=25)
    label, _ = cs.encode("HeLLo")
    assert cs.decode(label) == "hello"


def test_unknown_mapping():
    cs = build_charset("ALLCASES", max_len=25)  # no symbols
    label, _ = cs.encode("a!b")
    assert label[1] == cs.unknown_id
    # decode skips UNKNOWN, like the reference metric decode
    assert cs.decode(label) == "ab"


def test_too_long_rejected():
    cs = build_charset("ALLCASES_SYMBOLS", max_len=5)
    assert cs.encode("abcd") is None  # len+1 == max_len -> rejected
    assert cs.encode("abc") is not None


def test_normalize_text():
    assert normalize_text("He-LLo, 42!") == "hello42"
