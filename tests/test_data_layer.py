"""Dataset / sampler / pipeline tests over a synthetic LMDB fixture built
with the same `image-%09d`/`label-%09d`/`num-samples` schema as the
reference tools (tools/create_mae_lmdb.py:37-85)."""

import numpy as np
import pytest

from dig_tpu.data.dataset import (
    AloneImageLmdb,
    ConcatDataset,
    ImageLmdb,
    build_dataset,
    build_pretraining_dataset,
)
from dig_tpu.data.lmdb_store import LmdbWriter
from dig_tpu.data.pipeline import DataLoader
from dig_tpu.data.samplers import MultiSourceBatchSampler, ShardedSampler

WORDS = ["hello", "World", "42abc", "x", "jumping", "Foo-Bar!", "qt", "zebra12"]


def encode_jpeg(img):
    import cv2

    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


@pytest.fixture(scope="module")
def fixture_lmdb(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "train_lmdb")
    rng = np.random.default_rng(0)
    with LmdbWriter(path) as w:
        for i, word in enumerate(WORDS, start=1):
            h, wd = int(rng.integers(20, 60)), int(rng.integers(40, 200))
            img = rng.integers(0, 255, size=(h, wd, 3), dtype=np.uint8)
            w.put(b"image-%09d" % i, encode_jpeg(img))
            w.put(b"label-%09d" % i, word.encode())
        w.put(b"num-samples", str(len(WORDS)).encode())
    return path


def test_image_lmdb_basic(fixture_lmdb):
    ds = ImageLmdb(fixture_lmdb, "ALLCASES_SYMBOLS", max_len=25)
    assert len(ds) == len(WORDS)
    img, label, length = ds[0]
    # uint8 transport: datasets ship raw uint8; normalization happens
    # in-jit (ops/images.to_model_images), bit-identical to the old
    # host-side float path (see test_uint8_transport.py)
    assert img.shape == (32, 128, 3) and img.dtype == np.uint8
    assert ds.charset.decode(label) == WORDS[0]
    assert int(length) == len(WORDS[0]) + 1


def test_image_lmdb_skips_too_long(fixture_lmdb):
    ds = ImageLmdb(fixture_lmdb, "ALLCASES_SYMBOLS", max_len=5)
    # "hello"(5)+1 >= 5 -> skipped, lands on next usable word
    img, label, length = ds[0]
    assert len(ds.charset.decode(label)) + 1 < 5 or length < 5


def test_image_lmdb_with_abi_aug(fixture_lmdb):
    ds = ImageLmdb(fixture_lmdb, max_len=25, use_aug=True, use_abi_aug=True,
                   rng=np.random.default_rng(1))
    img, _, _ = ds[1]
    assert img.shape == (32, 128, 3)


def test_image_lmdb_with_seqclr_aug(fixture_lmdb):
    ds = ImageLmdb(fixture_lmdb, max_len=25, use_aug=True, use_abi_aug=False,
                   rng=np.random.default_rng(2))
    img, _, _ = ds[2]
    assert img.shape == (32, 128, 3)


def test_alone_image_lmdb(fixture_lmdb):
    ds = AloneImageLmdb(fixture_lmdb, mask_ratio=0.7, num_view=2,
                        rng=np.random.default_rng(3))
    ori, aug, mask = ds[0]
    assert ori.shape == (32, 128, 3) and aug.shape == (32, 128, 3)
    assert mask.shape == (2, 256) and mask.dtype == bool
    assert mask.sum(-1).tolist() == [179, 179]  # int(0.7 * 256)


def test_concat_dataset(fixture_lmdb):
    a = ImageLmdb(fixture_lmdb, max_len=25)
    b = ImageLmdb(fixture_lmdb, max_len=25)
    cat = ConcatDataset([a, b])
    assert len(cat) == 2 * len(WORDS)
    img, label, _ = cat[len(WORDS)]  # first item of the second source
    assert cat.charset.decode(label) == WORDS[0]


def test_sharded_sampler_partitions():
    n, world = 103, 4
    seen = []
    for rank in range(world):
        s = ShardedSampler(n, rank=rank, world=world, seed=7)
        s.set_epoch(3)
        seen.append(list(s))
    lens = {len(x) for x in seen}
    assert lens == {26}  # padded to 104 / 4
    flat = [i for sub in seen for i in sub]
    assert set(flat) == set(range(n))  # full cover (with 1 duplicate pad)


def test_sharded_sampler_epoch_changes_order():
    s = ShardedSampler(50, seed=1)
    s.set_epoch(0)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b and sorted(a) == sorted(b)


def test_multisource_batches_homogeneous(fixture_lmdb):
    a = ImageLmdb(fixture_lmdb, max_len=25)
    cat = ConcatDataset([a, ImageLmdb(fixture_lmdb, max_len=25)])
    bs = MultiSourceBatchSampler(cat.cumulative_sizes, batch_size=2, rank=0, world=2)
    batches = list(bs)
    assert batches
    for batch in batches:
        srcs = {cat.source_of(i) for i in batch}
        assert len(srcs) == 1
        assert len(batch) == 2


def test_dataloader_batches(fixture_lmdb):
    ds = ImageLmdb(fixture_lmdb, max_len=25)
    sampler = ShardedSampler(len(ds), shuffle=False)
    loader = DataLoader(ds, sampler, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    imgs, labels, lens = batches[0]
    assert imgs.shape == (4, 32, 128, 3)
    assert labels.shape == (4, 25)
    assert lens.shape == (4,)


def test_dataloader_propagates_errors(fixture_lmdb):
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("boom")

    loader = DataLoader(Bad(), ShardedSampler(4, shuffle=False), batch_size=2)
    with pytest.raises(ValueError):
        list(loader)


def test_build_dataset_factories(fixture_lmdb):
    ds = build_dataset([fixture_lmdb, fixture_lmdb], is_train=True)
    assert isinstance(ds, ConcatDataset)
    pre = build_pretraining_dataset(fixture_lmdb, num_view=2)
    ori, aug, mask = pre[1]
    assert mask.shape == (2, 256)


def test_dataloader_abandoned_iterator_releases_producer(fixture_lmdb):
    """Breaking out of iteration with the prefetch queue full must not
    park the producer thread (and its worker pool) forever."""
    import threading
    import time

    ds = ImageLmdb(fixture_lmdb, max_len=25)
    sampler = ShardedSampler(len(ds), shuffle=False)
    before = threading.active_count()
    loader = DataLoader(ds, sampler, batch_size=1, num_workers=2, prefetch=2)
    for _ in loader:
        break  # abandon with batches still queued
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_multi_source_datasets_share_rng(fixture_lmdb):
    """build_dataset must hand every sub-dataset ONE ThreadLocalRng:
    per-dataset wrappers around a shared base generator would race on
    SeedSequence.spawn across loader threads."""
    import numpy as np

    from dig_tpu.data.pipeline import ThreadLocalRng

    base = np.random.default_rng(0)
    ds = build_dataset([fixture_lmdb, fixture_lmdb], is_train=True,
                       use_aug=True, rng=base)
    rngs = {id(sub.rng) for sub in ds.datasets}
    assert len(rngs) == 1
    assert isinstance(ds.datasets[0].rng, ThreadLocalRng)


def test_dataloader_process_workers_match_thread_workers(fixture_lmdb):
    """worker_type="process" (forked workers) must deliver the same
    batches in the same order as the thread pool for a deterministic
    (no-aug) dataset — the executor is an implementation detail."""
    ds = ImageLmdb(fixture_lmdb, max_len=25)
    sampler = ShardedSampler(len(ds), shuffle=False)
    want = list(DataLoader(ds, sampler, batch_size=4, num_workers=2))
    got = list(DataLoader(ds, sampler, batch_size=4, num_workers=2,
                          worker_type="process"))
    assert len(got) == len(want)
    for (wi, wl, wn), (gi, gl, gn) in zip(want, got):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_array_equal(gl, wl)
        np.testing.assert_array_equal(gn, wn)


def test_process_workers_reseed_rng_streams(fixture_lmdb):
    """Forked children inherit the parent RNG state bit-for-bit; the
    process pool must reseed per worker (pipeline._proc_init) or every
    worker produces IDENTICAL augmentation streams.  With 2 workers and
    an augmenting dataset, the same index fetched by different workers
    must not be deterministically equal across epochs."""
    from dig_tpu.data.dataset import build_pretraining_dataset

    ds = build_pretraining_dataset(fixture_lmdb, num_view=2,
                                   rng=np.random.default_rng(0))
    sampler = ShardedSampler(len(ds), shuffle=False)
    # two epochs through the SAME loader config: per-epoch pools fork
    # fresh children; without the reseed both epochs replay the parent's
    # inherited stream and the augmented views come out identical
    a = list(DataLoader(ds, sampler, batch_size=4, num_workers=2,
                        worker_type="process", seed=1))
    b = list(DataLoader(ds, sampler, batch_size=4, num_workers=2,
                        worker_type="process", seed=2))
    aug_a = np.concatenate([x[1] for x in a])
    aug_b = np.concatenate([x[1] for x in b])
    assert not np.array_equal(aug_a, aug_b)
