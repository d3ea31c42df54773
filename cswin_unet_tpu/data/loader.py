"""Host data loading: threaded prefetching batcher + device double-buffering.

Replaces torch ``DataLoader(num_workers=8, pin_memory=True)``
(reference ``trainer.py:35``) with a TPU-appropriate pipeline:

  * a thread pool decodes/augments samples ahead of consumption (numpy,
    scipy and h5py release the GIL in their hot paths);
  * batches are assembled into contiguous numpy arrays of a FIXED shape —
    the final partial batch is padded by wrapping around the shuffled epoch
    (static shapes keep XLA from recompiling);
  * ``device_prefetch`` ships batches to the device mesh one step ahead of
    the train loop (the host->device copy overlaps the previous step's
    compute).

Determinism: worker RNG is derived from (seed, epoch, sample index), so
results are independent of thread scheduling — stronger than the reference's
``worker_init_fn`` (trainer.py:17-18) which seeds each torch worker once.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Iterator

import jax
import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 1234,
        num_workers: int = 8,
        drop_last: bool = False,
        pad_final: bool = True,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        if self.drop_last:
            idx = idx[: (n // self.batch_size) * self.batch_size]
        elif self.pad_final and n % self.batch_size:
            pad = self.batch_size - n % self.batch_size
            idx = np.concatenate([idx, idx[:pad]])
        return idx

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        epoch = self.epoch
        self.epoch += 1  # next __iter__ = next epoch, even if partially consumed

        def fetch(i: int):
            rng = np.random.default_rng((self.seed, epoch, int(i)))
            return self.dataset.__getitem__(int(i), rng)

        with ThreadPoolExecutor(self.num_workers) as pool:
            sample_iter = pool.map(fetch, indices)
            batch = []
            for sample in sample_iter:
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield _collate(batch)
                    batch = []
            if batch:
                yield _collate(batch)


def _collate(samples: list[dict]) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Move numpy batches to device ahead of time (double-buffered).

    Non-array entries (e.g. case_name lists) pass through on host.
    """
    queue: Queue = Queue(maxsize=size)
    _sentinel = object()

    def _put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = (
                    jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
                )
            else:
                out[k] = v
        return out

    def producer():
        try:
            for batch in iterator:
                queue.put(_put(batch))
            queue.put(_sentinel)
        except BaseException as e:  # propagate into the consumer
            queue.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = queue.get()
        if item is _sentinel:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
