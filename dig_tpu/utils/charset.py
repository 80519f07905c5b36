"""Character vocabulary and label codec.

Behavioral parity with the reference vocabulary semantics
(reference: dataset/dataset_lmdb.py:75-97 `_find_classes`,
dataset/dataset_lmdb.py:185-204 label encoding):

* three voc types (LOWERCASE / ALLCASES / ALLCASES_SYMBOLS),
* EOS, PADDING, UNKNOWN appended (in that order) at the end,
* labels are fixed `max_len` int arrays padded with PADDING, with one EOS
  appended after the characters,
* words with ``len(word) + 1 >= max_len`` are rejected (host-side filter),
* the BOS id used by autoregressive decoders is ``num_classes`` (one past
  the vocabulary; reference: models/decoder.py:152).
"""

from __future__ import annotations

import dataclasses
import string

import numpy as np

VOC_TYPES = ("LOWERCASE", "ALLCASES", "ALLCASES_SYMBOLS")

_LOWERCASE_CHARS = "0123456789abcdefghijklmnopqrstuvwxyz!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

EOS = "EOS"
PADDING = "PADDING"
UNKNOWN = "UNKNOWN"


@dataclasses.dataclass(frozen=True)
class Charset:
    """Immutable vocabulary with label encode/decode."""

    voc_type: str
    classes: tuple
    max_len: int = 25

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    @property
    def eos_id(self) -> int:
        return self.num_classes - 3

    @property
    def padding_id(self) -> int:
        return self.num_classes - 2

    @property
    def unknown_id(self) -> int:
        return self.num_classes - 1

    @property
    def bos_id(self) -> int:
        # One past the vocabulary: decoders embed num_classes + 1 symbols.
        return self.num_classes

    @property
    def lowercase(self) -> bool:
        return self.voc_type == "LOWERCASE"

    def char_to_id(self, ch: str) -> int:
        try:
            return self.classes.index(ch)
        except ValueError:
            return self.unknown_id

    def encode(self, word: str):
        """Encode one word to (label[max_len], label_len) or None if too long.

        Mirrors the reference filter: a word is usable only when
        ``len(word) + 1 < max_len``.
        """
        if self.lowercase:
            word = word.lower()
        if len(word) + 1 >= self.max_len:
            return None
        label = np.full((self.max_len,), self.padding_id, dtype=np.int32)
        lut = self._lut()
        ids = [lut.get(ch, self.unknown_id) for ch in word]
        ids.append(self.eos_id)
        label[: len(ids)] = np.asarray(ids, dtype=np.int32)
        return label, len(ids)

    def _lut(self):
        lut = getattr(self, "_lut_cache", None)
        if lut is None:
            lut = {c: i for i, c in enumerate(self.classes)}
            object.__setattr__(self, "_lut_cache", lut)
        return lut

    def decode(self, ids) -> str:
        """Decode id sequence to string: stop at EOS, drop UNKNOWN/PADDING.

        Matches the eval-time decode (reference:
        evaluation_metric/metrics.py:19-64): iteration stops at the first
        EOS; UNKNOWN ids are skipped (PADDING never appears before EOS in
        well-formed labels but is also skipped defensively).
        """
        out = []
        for i in np.asarray(ids).reshape(-1):
            i = int(i)
            if i == self.eos_id:
                break
            if i in (self.unknown_id, self.padding_id) or i >= self.num_classes:
                continue
            out.append(self.classes[i])
        return "".join(out)


def build_charset(voc_type: str = "ALLCASES_SYMBOLS", max_len: int = 25) -> Charset:
    if voc_type == "LOWERCASE":
        voc = list(_LOWERCASE_CHARS)
    elif voc_type == "ALLCASES":
        voc = list(string.digits + string.ascii_letters)
    elif voc_type == "ALLCASES_SYMBOLS":
        voc = list(string.printable[:-6])
    else:
        raise KeyError(
            "voc_type must be one of 'LOWERCASE', 'ALLCASES', 'ALLCASES_SYMBOLS'"
        )
    voc += [EOS, PADDING, UNKNOWN]
    return Charset(voc_type=voc_type, classes=tuple(voc), max_len=max_len)


def normalize_text(text: str) -> str:
    """Case-insensitive alphanumeric normalization used by all string metrics
    (reference: evaluation_metric/metrics.py:14-16)."""
    alnum = string.digits + string.ascii_letters
    return "".join(ch for ch in text if ch in alnum).lower()
