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


def test_meta_carries_page_size(tmp_path):
    """liblmdb reads the page size from mm_psize (= mm_dbs[0].md_pad);
    writing 0 there makes files unopenable by real liblmdb."""
    import struct

    path, _ = make_db(tmp_path, n=5)
    data = open(os.path.join(path, "data.mdb"), "rb").read()
    for meta_off in (0, 4096):
        psize = struct.unpack_from("<I", data, meta_off + 16 + 24)[0]
        assert psize == 4096


def test_reader_nondefault_page_size(tmp_path, monkeypatch):
    """Files written by liblmdb on 16K-page hosts carry mm_psize=16384;
    both readers must honor the meta field, not assume 4096."""
    import dig_tpu.data.lmdb_store as ls

    monkeypatch.setattr(ls, "PAGE_SIZE", 16384)
    monkeypatch.setattr(ls, "NODE_MAX", ((16384 - ls.PAGEHDRSZ) // 2) & ~1)
    path, items = make_db(tmp_path, n=100)
    monkeypatch.undo()

    r = ls._PyReader(path)
    assert r.psize == 16384
    for k, v in list(items.items())[:20]:
        assert r.get(k) == v, k
    r.close()
    if native_lib() is not None:
        rn = LmdbReader(path, backend="native")
        for k, v in list(items.items())[:20]:
            assert rn.get(k) == v, k
        rn.close()


def test_reader_legacy_zero_psize(tmp_path):
    """Files from the older writer (mm_psize left 0) must still open via
    the second-meta probe fallback."""
    import struct

    path, items = make_db(tmp_path, n=30)
    f = os.path.join(path, "data.mdb")
    data = bytearray(open(f, "rb").read())
    for meta_off in (0, 4096):
        struct.pack_into("<I", data, meta_off + 16 + 24, 0)
    open(f, "wb").write(bytes(data))

    r = _PyReader(path)
    assert r.psize == 4096
    assert r.get(b"num-samples") == b"30"
    r.close()
    if native_lib() is not None:
        rn = LmdbReader(path, backend="native")
        assert rn.get(b"num-samples") == b"30"
        rn.close()
