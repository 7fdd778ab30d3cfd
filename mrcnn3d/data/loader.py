"""Batching + double-buffered host→device pipeline.

Replaces the reference's torch DataLoader + GroupSampler + patched collate
(mmdet/datasets/loader/, mod_package_files/collate.py).  Static crop sizes
make collation a plain stack; a background thread prefetches and transfers
the next batch while the device computes — addressing the reference's
biggest real-world bottleneck, the synchronous host-side np.load/skimage
pipeline (SURVEY.md section 3 hot loops).

Per-host sharding for multi-process DP mirrors DistributedGroupSampler's
epoch-seeded deterministic shard (sampler.py:166-247).
"""
from __future__ import annotations

import os
import pickle
import queue
import threading

import jax
import numpy as np

# process-pool worker state: the dataset is shipped once per worker via
# the pool initializer (pickling dataset.__getitem__ per task would
# re-serialize the whole dataset on every submit)
_WORKER_DS = None


def _worker_init(ds_bytes):
    global _WORKER_DS
    _WORKER_DS = pickle.loads(ds_bytes)
    # decorrelate per-worker augmentation randomness (same caveat as
    # torch DataLoader workers / the thread pool: nondeterministic
    # across worker scheduling)
    rng = getattr(_WORKER_DS, "rng", None)
    if rng is not None:
        _WORKER_DS.rng = np.random.RandomState(os.getpid() % (2**31))
        crop = getattr(_WORKER_DS, "crop", None)
        if crop is not None:
            for t in getattr(crop, "transforms", []):
                if hasattr(t, "rng"):
                    t.rng = _WORKER_DS.rng


def _worker_get(i):
    return _WORKER_DS[i]


def _worker_get_shm(i):
    """Fetch a sample and ship its large arrays via POSIX shared memory.

    Pickling multi-MB volumes through the result pipe dominates process-
    worker cost (measured ~1.7 s/sample for ~55 MB 2-scale samples on
    this box); a shm segment turns that into one memcpy on each side.
    Returns {key: value-or-(shm_name, shape, dtype)} descriptors.
    """
    from multiprocessing import shared_memory

    sample = _WORKER_DS[i]
    out = {}
    for k, v in sample.items():
        if isinstance(v, np.ndarray) and v.nbytes >= 1 << 20:
            shm = shared_memory.SharedMemory(create=True, size=v.nbytes)
            np.ndarray(v.shape, v.dtype, buffer=shm.buf)[...] = v
            out[k] = ("__shm__", shm.name, v.shape, str(v.dtype))
            shm.close()  # consumer unlinks
        else:
            out[k] = v
    return out


def _shm_decode(sample):
    from multiprocessing import shared_memory

    out = {}
    for k, v in sample.items():
        if isinstance(v, tuple) and len(v) == 4 and v[0] == "__shm__":
            _, name, shape, dtype = v
            shm = shared_memory.SharedMemory(name=name)
            arr = np.ndarray(shape, np.dtype(dtype), buffer=shm.buf).copy()
            shm.close()
            shm.unlink()
            out[k] = arr
        else:
            out[k] = v
    return out


def collate(samples):
    """Stack a list of same-shape sample dicts into batch arrays."""
    out = {}
    for k in samples[0]:
        if k in ("img_info", "ori_shape", "ori_shape_2", "ori_shape_3"):
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


def epoch_indices(n, epoch, shuffle=True, rank=0, world=1, seed=0):
    """Deterministic epoch-seeded shard (reference DistributedGroupSampler)."""
    rng = np.random.RandomState(seed + epoch)
    idx = rng.permutation(n) if shuffle else np.arange(n)
    # pad to a multiple of world so every rank sees the same count
    pad = (-len(idx)) % world
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[rank::world]


class Prefetcher:
    """Multi-worker batch producer with device-transfer overlap.

    A pool of sample workers (reference workers_per_gpu role) feeds a
    collator thread that stacks fixed-shape samples and device_puts the
    batch while the previous one is being consumed.  The device-side
    train step measures ~5 ms at the reference crop geometry, so sample
    preparation (np.load + crop + C++ resize) is the throughput limiter —
    hence the pool.  (Like torch DataLoader workers, augmentation
    randomness is nondeterministic across workers when num_workers > 1.)
    """

    def __init__(self, dataset, batch_size, epoch=0, shuffle=True,
                 rank=0, world=1, depth=2, device_put=True, seed=0,
                 num_workers=4, mode="thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_put = device_put
        self.q = queue.Queue(maxsize=depth)
        self.indices = epoch_indices(
            len(dataset), epoch, shuffle, rank, world, seed
        )
        self.num_workers = max(1, num_workers)
        # mode="process": spawn-based worker pool — sample prep (json,
        # np.load, crop, mask relabel) holds the GIL, so thread workers
        # stop scaling once the python share dominates; processes
        # sidestep the GIL at the cost of one dataset pickle per worker.
        # spawn (not fork): forking a process with an initialized TPU
        # client is unsafe.
        self.mode = mode
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            self._produce()
        except BaseException as e:  # surface worker errors to the consumer
            self.q.put(e)
        else:
            self.q.put(None)

    def _produce(self):
        from collections import deque
        from concurrent.futures import (
            ProcessPoolExecutor,
            ThreadPoolExecutor,
        )

        if self.mode == "process":
            import multiprocessing as mp

            pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=mp.get_context("spawn"),
                initializer=_worker_init,
                initargs=(pickle.dumps(self.dataset),),
            )
            submit = lambda i: pool.submit(  # noqa: E731
                _worker_get_shm, i
            )
            decode = _shm_decode
        else:
            pool = ThreadPoolExecutor(self.num_workers)
            submit = lambda i: pool.submit(  # noqa: E731
                self.dataset.__getitem__, i
            )
            decode = lambda s: s  # noqa: E731

        window = self.num_workers * 2  # bounded look-ahead
        with pool:
            pending: deque = deque()
            it = iter(self.indices)
            batch = []

            def refill():
                while len(pending) < window:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                    pending.append(submit(int(i)))

            try:
                refill()
                while pending:
                    fut = pending.popleft()
                    batch.append(decode(fut.result()))
                    refill()
                    if len(batch) == self.batch_size:
                        b = collate(batch)
                        if self.device_put:
                            b = jax.tree.map(
                                lambda x: jax.device_put(x)
                                if isinstance(x, np.ndarray)
                                else x,
                                b,
                            )
                        self.q.put(b)
                        batch = []
            finally:
                # decode-and-discard any in-flight results so their
                # shared-memory segments are unlinked (process mode);
                # without this an error path leaks /dev/shm space
                for fut in pending:
                    try:
                        decode(fut.result(timeout=5))
                    except Exception:
                        pass

    def __iter__(self):
        while True:
            b = self.q.get()
            if b is None:
                return
            if isinstance(b, BaseException):
                raise b
            yield b
