"""Threaded host input pipeline with device prefetch.

Replaces torch `DataLoader(num_workers=10, pin_memory=True)` (reference:
run_mae_pretraining_moco.py:365-372).  Decode + augmentation are
CPU-bound but mostly GIL-releasing (cv2, numpy), so the default thread
pool suffices and avoids process-spawn overhead; `worker_type="process"`
switches to forked process workers (torch-DataLoader style) for hosts
where Python-level augmentation serializes on the GIL.  Batches are
assembled as contiguous numpy arrays and double-buffered onto the device
so the TPU never waits on the host (HBM boundary: the only H2D copies
per step happen here).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


class ThreadLocalRng:
    """numpy Generator facade that hands each thread its own independent
    child stream (``Generator.spawn``).  numpy Generators are not
    thread-safe; with the loader's per-sample fan-out, augmentation code
    holding one shared Generator would race.  Single-threaded use sees
    exactly one child stream, so seeded runs stay reproducible."""

    def __init__(self, base: np.random.Generator):
        self._base = base
        self._lock = threading.Lock()
        self._tl = threading.local()

    def _rng(self) -> np.random.Generator:
        g = getattr(self._tl, "g", None)
        if g is None:
            with self._lock:
                g = self._base.spawn(1)[0]
            self._tl.g = g
        return g

    def reseed(self, seed: int) -> None:
        """Replace the base stream and drop any cached thread-local
        children.  Used by process workers after fork: every child
        inherits the parent's RNG state bit-for-bit, so without a
        per-worker reseed all workers would produce IDENTICAL
        augmentation streams (the reference guards the same hazard with
        `seed_worker`, utils/utils.py)."""
        with self._lock:
            self._base = np.random.default_rng(seed)
            self._tl = threading.local()

    def __getattr__(self, name):
        return getattr(self._rng(), name)


def reseed_dataset_rngs(dataset, seed: int) -> None:
    """Best-effort walk reseeding every ThreadLocalRng a dataset (or a
    ConcatDataset of them) holds.  Augment objects share the dataset's
    `rng` reference, so reseeding the dataset covers them too."""
    rng = getattr(dataset, "rng", None)
    if isinstance(rng, ThreadLocalRng):
        rng.reseed(seed)
    for i, child in enumerate(getattr(dataset, "datasets", []) or []):
        reseed_dataset_rngs(child, seed * 1000003 + i)


# ---------------------------------------------------------------------------
# Process workers (fork).  The dataset is made visible to children by
# forking AFTER it exists — read-only mmap LMDB handles are fork-safe and
# shared copy-on-write, so nothing is pickled per task except the integer
# index and the returned sample.  Children must reseed their RNGs (see
# ThreadLocalRng.reseed).  Use when host augmentation is pure-Python
# (GIL-bound) or the host has cores to spare; the default thread pool is
# cheaper when the per-sample work releases the GIL (cv2/numpy).
# ---------------------------------------------------------------------------

_proc_dataset = None


def _proc_init(dataset, base_seed: int) -> None:
    global _proc_dataset
    _proc_dataset = dataset
    import os

    reseed_dataset_rngs(dataset, base_seed + os.getpid())
    try:  # cv2 workers must not spawn their own thread pools (1 core each)
        import cv2

        cv2.setNumThreads(0)
    except ImportError:
        pass


def _proc_getitem(i: int):
    return _proc_dataset[i]


def _stack(samples):
    """Collate a list of per-sample tuples/dicts into batched numpy arrays."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: np.stack([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return tuple(np.stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack(samples)


def device_prefetch(iterator, to_device: Callable, depth: int = 2):
    """Double-buffer batches onto the device: keep `depth` batches in
    flight so the H2D copy of batch N+1 overlaps the compute of batch N
    (the reference relies on pinned-memory non_blocking copies for this;
    engine_for_pretraining_moco.py:77-80)."""
    import collections

    queue_ = collections.deque()
    for item in iterator:
        queue_.append(to_device(item))
        if len(queue_) >= depth:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


def make_train_loader(dataset, *, local_batch: int, rank: int, world: int,
                      seed: int, num_workers: int,
                      batch_wise_shuffle: bool = False,
                      worker_type: str = "thread"):
    """The training sampler/loader wiring shared by both CLIs: either a
    per-host `ShardedSampler` + fixed batch size, or — with
    ``batch_wise_shuffle`` — the `MultiSourceBatchSampler` that draws every
    batch from ONE source LMDB (the sampler the reference ships but never
    wires; dist_multisrc_batch_sampler.py:14-154)."""
    from dig_tpu.data.samplers import MultiSourceBatchSampler, ShardedSampler

    if batch_wise_shuffle:
        sampler = MultiSourceBatchSampler(
            getattr(dataset, "cumulative_sizes", [len(dataset)]),
            batch_size=local_batch, rank=rank, world=world, seed=seed)
        return DataLoader(dataset, sampler, batch_size=None,
                          num_workers=num_workers, worker_type=worker_type,
                          seed=seed)
    sampler = ShardedSampler(len(dataset), rank=rank, world=world, seed=seed)
    return DataLoader(dataset, sampler, batch_size=local_batch,
                      num_workers=num_workers, worker_type=worker_type,
                      seed=seed)


class DataLoader:
    """Minimal threaded loader: sampler -> fetch pool -> prefetch queue.

    `sampler` yields either ints (then `batch_size` groups them) or lists
    of ints (batch samplers).  Iteration order is deterministic given the
    sampler; worker threads only parallelize the per-sample work.
    """

    def __init__(
        self,
        dataset,
        sampler: Iterable,
        batch_size: Optional[int] = None,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
        collate: Callable = _stack,
        to_device: Optional[Callable] = None,
        worker_type: str = "thread",
        seed: int = 0,
    ):
        assert worker_type in ("thread", "process"), worker_type
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.collate = collate
        self.to_device = to_device
        self.worker_type = worker_type
        self.seed = seed

    def _batches(self) -> Iterator[list]:
        if self.batch_size is None:
            yield from self.sampler
            return
        cur = []
        for idx in self.sampler:
            cur.append(idx)
            if len(cur) == self.batch_size:
                yield cur
                cur = []
        if cur and not self.drop_last:
            yield cur

    def __len__(self):
        try:
            n = len(self.sampler)
        except TypeError:
            return 0
        if self.batch_size is None:
            return n
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks stop: the consumer may abandon
            # iteration (break/exception) with the queue full, and a plain
            # put() would park this thread — and its worker pool — forever
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def make_pool():
            if self.worker_type == "process":
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor

                return ProcessPoolExecutor(
                    self.num_workers, mp_context=mp.get_context("fork"),
                    initializer=_proc_init,
                    initargs=(self.dataset, self.seed)), _proc_getitem
            return (ThreadPoolExecutor(self.num_workers),
                    self.dataset.__getitem__)

        def produce():
            pool, fetch = make_pool()
            with pool:
                pending = []

                def drain(futs) -> bool:
                    return put(("ok", self.collate([f.result() for f in futs])))

                try:
                    for batch_idx in self._batches():
                        if stop.is_set():
                            break
                        # fan out per SAMPLE, not per batch: decode/aug of one
                        # batch spreads over all workers (cv2/numpy release
                        # the GIL), so batch latency is ~1/num_workers of the
                        # serial cost on multi-core hosts
                        pending.append(
                            [pool.submit(fetch, i) for i in batch_idx]
                        )
                        while len(pending) >= self.prefetch:
                            if not drain(pending.pop(0)):
                                break
                    for futs in pending:
                        if stop.is_set():
                            break
                        drain(futs)
                    put(("end", None))
                except Exception as e:  # propagate into the consumer
                    put(("err", e))
                finally:
                    if stop.is_set():  # abandoned: skip queued decode work
                        for futs in pending:
                            for f in futs:
                                f.cancel()

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "end":
                    break
                if kind == "err":
                    raise payload
                if self.to_device is not None:
                    payload = self.to_device(payload)
                yield payload
        finally:
            stop.set()
