"""Host input pipeline: shuffling, batching, prefetching loader.

TPU-native replacement for the reference's torch DataLoader
(training/trainer.py:39): worker threads decode/transform frames and
collate batches ahead of the training loop, optionally transferring them to
device (overlapping host decode with device compute).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from playablevideogeneration_tpu.data.video_dataset import Batch, VideoDataset, collate


class DataLoader:
    """Iterates shuffled, collated batches with background prefetch.

    drop_last semantics match the reference (incomplete final batch is
    dropped; reference trainer.py:39).
    """

    def __init__(self, dataset: VideoDataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 2,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        limit = (len(indices) // self.batch_size) * self.batch_size \
            if self.drop_last else len(indices)
        for start in range(0, limit, self.batch_size):
            yield indices[start : start + self.batch_size]

    def __iter__(self) -> Iterator[Batch]:
        batches = list(self._batch_indices())
        if not batches:
            return
        task_q: "queue.Queue" = queue.Queue()
        results = {}
        cond = threading.Condition()
        stop = threading.Event()
        max_ahead = self.prefetch + self.num_workers
        next_needed = [0]

        for i, idxs in enumerate(batches):
            task_q.put((i, idxs))

        def worker():
            while not stop.is_set():
                try:
                    i, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                # Backpressure: don't run more than `prefetch` batches ahead
                # of the consumer.
                with cond:
                    while not stop.is_set() and i - next_needed[0] >= max_ahead:
                        cond.wait(timeout=1.0)
                if stop.is_set():
                    return
                try:
                    batch = collate([self.dataset[int(j)] for j in idxs])
                except Exception as e:  # propagate to the consumer
                    batch = e
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for i in range(len(batches)):
                with cond:
                    next_needed[0] = i
                    cond.notify_all()
                    while i not in results:
                        cond.wait(timeout=5.0)
                        if i not in results and all(not t.is_alive() for t in threads):
                            raise RuntimeError("Data loader workers died")
                    value = results.pop(i)
                if isinstance(value, Exception):
                    raise value
                yield value
        finally:
            stop.set()
            with cond:
                cond.notify_all()


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Moves batches to device ahead of consumption.

    :param sharding: optional jax.sharding.Sharding used for the transfer
        (e.g. batch-axis NamedSharding for data parallelism)
    """
    import jax

    buf = []

    def _put(batch: Batch) -> Batch:
        def transfer(x):
            return jax.device_put(x, sharding) if sharding is not None else jnp_put(x)

        def jnp_put(x):
            return jax.device_put(x)

        return Batch(
            observations=transfer(batch.observations),
            actions=transfer(batch.actions),
            rewards=transfer(batch.rewards),
            dones=transfer(batch.dones),
            videos=batch.videos,
            initial_frames=batch.initial_frames,
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
