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

import queue
import threading

import jax
import numpy as np


def collate(samples):
    """Stack a list of same-shape sample dicts into batch arrays."""
    out = {}
    for k in samples[0]:
        if k in ("img_info", "ori_shape", "ori_shape_2"):
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
                 num_workers=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_put = device_put
        self.q = queue.Queue(maxsize=depth)
        self.indices = epoch_indices(
            len(dataset), epoch, shuffle, rank, world, seed
        )
        self.num_workers = max(1, num_workers)
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
        from concurrent.futures import ThreadPoolExecutor

        window = self.num_workers * 2  # bounded look-ahead
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque()
            it = iter(self.indices)
            batch = []

            def refill():
                while len(pending) < window:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                    pending.append(
                        pool.submit(self.dataset.__getitem__, int(i))
                    )

            refill()
            while pending:
                fut = pending.popleft()
                batch.append(fut.result())
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

    def __iter__(self):
        while True:
            b = self.q.get()
            if b is None:
                return
            if isinstance(b, BaseException):
                raise b
            yield b
