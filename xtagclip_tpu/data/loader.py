"""Threaded, prefetching data loader (replaces torch DataLoader workers).

TPU-first: the host pipeline keeps N worker threads decoding/transforming
(PIL releases the GIL in decode/resize), collates numpy batches, and
double-buffers `jax.device_put` so the next batch is on-device before the
current step finishes. Deterministic per-epoch shuffling matches the
reference's DistributedSampler + SharedEpoch contract (data.py:50-58).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


def default_collate(samples: Sequence):
    """Collate a list of samples (tuples/dicts/arrays/scalars) into batches."""
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate([s[i] for s in samples])
                           for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (int, np.integer)):
        return np.asarray(samples, dtype=np.int32)
    if isinstance(first, (float, np.floating)):
        return np.asarray(samples, dtype=np.float32)
    return list(samples)  # strings and other objects stay as lists


class DataLoader:
    """Map-style dataset loader with epoch-seeded shuffle and prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        collate_fn: Callable = default_collate,
        prefetch: int = 4,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.rank = rank
        self.world_size = world_size
        self._epoch = 0

        # must match _indices exactly: ranks PAD up to ceil(n/world)
        # (reference DistributedSampler), so len() is ceil-based — a floor
        # here disagrees with the yielded batch count and poisons the LR
        # schedule's total_steps
        n = len(dataset)
        per_rank = (n + world_size - 1) // world_size if world_size > 1 else n
        if drop_last:
            self.num_batches = per_rank // batch_size
        else:
            self.num_batches = (per_rank + batch_size - 1) // batch_size
        self.num_samples = (self.num_batches * batch_size if drop_last
                            else per_rank)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            g = np.random.default_rng(self.seed + self._epoch)
            idx = g.permutation(n)
        else:
            idx = np.arange(n)
        if self.world_size > 1:
            # pad to a multiple of world (reference DistributedSampler pads)
            total = ((n + self.world_size - 1) // self.world_size) * self.world_size
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.rank :: self.world_size]
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        return idx

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if not batches:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            # never block forever on a full queue: an early-exiting consumer
            # sets stop, and an unconditional put() would leak this thread
            # (and its worker pool) for the process lifetime
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        if not put_checked(self.collate_fn(samples)):
                            return
                finally:
                    put_checked(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        break
                    yield item
            finally:
                stop.set()
                # drain so the producer can exit
                while not out_q.empty():
                    out_q.get_nowait()

        return gen()


@dataclass
class DataInfo:
    """Reference data.py:61-71 contract: dataloader + sampler epoch hook."""

    dataloader: DataLoader
    shared_epoch: Any = None

    def set_epoch(self, epoch: int):
        self.dataloader.set_epoch(epoch)


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Overlap host->device transfer with compute: keep `size` batches in
    flight via jax.device_put (double buffering)."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding)
                if isinstance(x, np.ndarray) else x,
                batch,
            )
        return jax.tree.map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
            batch,
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        batch = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
