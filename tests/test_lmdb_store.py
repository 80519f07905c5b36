"""Round-trip tests of the from-scratch LMDB store: the Python writer's
output must be readable by both the native C++ reader and the pure-Python
parser (same on-disk format liblmdb uses)."""

import os

import numpy as np
import pytest

from dig_tpu.data.lmdb_store import LmdbReader, LmdbWriter, _PyReader, native_lib


def make_db(tmp_path, n=300, big_every=7):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "db")
    items = {}
    with LmdbWriter(path) as w:
        for i in range(1, n + 1):
            size = 8000 if i % big_every == 0 else rng.integers(10, 200)
            img = rng.integers(0, 256, size=int(size), dtype=np.uint8).tobytes()
            label = f"word{i}".encode()
            w.put(b"image-%09d" % i, img)
            w.put(b"label-%09d" % i, label)
            items[b"image-%09d" % i] = img
            items[b"label-%09d" % i] = label
        w.put(b"num-samples", str(n).encode())
        items[b"num-samples"] = str(n).encode()
    return path, items


def test_python_reader_roundtrip(tmp_path):
    path, items = make_db(tmp_path)
    r = _PyReader(path)
    assert r.entries == len(items)
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get(b"missing-key") is None
    r.close()


def test_native_reader_roundtrip(tmp_path):
    if native_lib() is None:
        pytest.skip("no C++ toolchain")
    path, items = make_db(tmp_path)
    r = LmdbReader(path, backend="native")
    assert r.backend == "native"
    assert r.entries == len(items)
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get(b"zzz") is None
    r.close()


def test_reader_auto_backend(tmp_path):
    path, items = make_db(tmp_path, n=20)
    r = LmdbReader(path)
    assert r.get(b"num-samples") == b"20"
    r.close()


def test_multi_level_tree(tmp_path):
    # enough entries to force >=2 branch levels
    path = str(tmp_path / "big")
    with LmdbWriter(path) as w:
        for i in range(40000):
            w.put(b"key-%09d" % i, b"v%d" % i)
    r = _PyReader(path)
    assert r.depth >= 2
    for i in (0, 1, 9999, 39999, 12345):
        assert r.get(b"key-%09d" % i) == b"v%d" % i
    if native_lib() is not None:
        rn = LmdbReader(path, backend="native")
        for i in (0, 777, 39999):
            assert rn.get(b"key-%09d" % i) == b"v%d" % i
        rn.close()
    r.close()
