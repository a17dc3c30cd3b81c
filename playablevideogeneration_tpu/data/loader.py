"""Host input pipeline: shuffling, batching, prefetching loader.

TPU-native replacement for the reference's torch DataLoader
(training/trainer.py:39): workers decode/transform frames and collate
batches ahead of the training loop, optionally transferring them to device
(overlapping host decode with device compute).

Two decode backends:
- ``worker_mode="thread"``: in-process threads — zero IPC cost, but PNG
  decode holds the GIL, so throughput caps at ~1 core;
- ``worker_mode="process"``: a fork-based worker pool matching the
  reference's multi-process loader (reference trainer.py:39 num_workers
  processes) — scales decode across cores for real-data training.
  Process batches carry no Video back-references (arrays only).
  Fork-safety: workers only decode PNGs with PIL/numpy and never touch
  the JAX runtime inherited from the parent (calling JAX in a fork()ed
  child of an initialized runtime is undefined behavior — same caveat as
  torch's fork-based workers with CUDA).

Multi-host: pass (shard_index, shard_count) = (jax.process_index(),
jax.process_count()); every process shuffles with the same seed and takes a
disjoint strided slice of the epoch.
"""
from __future__ import annotations

import itertools
import queue
import threading
from collections import deque
from typing import Iterator, Optional

import numpy as np

from playablevideogeneration_tpu.data.video_dataset import Batch, VideoDataset, collate

# Dataset handle inherited by fork()ed pool workers (set right before the
# pool is created; fork snapshots it without pickling the dataset).
_FORK_DATASET: Optional[VideoDataset] = None


def _collate_indices_arrays_only(idxs) -> Batch:
    batch = collate([_FORK_DATASET[int(j)] for j in idxs])
    # Video back-references don't cross the process boundary (they would
    # pickle decoded frames); training consumes arrays only.
    return Batch(observations=batch.observations, actions=batch.actions,
                 rewards=batch.rewards, dones=batch.dones,
                 videos=[], initial_frames=batch.initial_frames)


class DataLoader:
    """Iterates shuffled, collated batches with background prefetch.

    drop_last semantics match the reference (incomplete final batch is
    dropped; reference trainer.py:39).
    """

    def __init__(self, dataset: VideoDataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 2,
                 prefetch: int = 2, seed: int = 0, worker_mode: str = "thread",
                 shard_index: int = 0, shard_count: int = 1,
                 worker_timeout: float = 300.0):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"Unknown worker_mode '{worker_mode}'")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.worker_mode = worker_mode
        self.shard_index = shard_index
        self.shard_count = max(1, shard_count)
        self.worker_timeout = worker_timeout
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        # Mirrors _batch_indices: truncate-to-common-multiple, then shard.
        n = (len(self.dataset) - len(self.dataset) % self.shard_count) \
            // self.shard_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        if self.shard_count > 1:
            # Same-seed shuffle on every process -> disjoint strided shards.
            # Truncate to a common multiple FIRST: unequal shard lengths
            # would leave one process running an extra collective step at
            # epoch end, deadlocking the others.
            limit = len(indices) - (len(indices) % self.shard_count)
            indices = indices[:limit][self.shard_index::self.shard_count]
        limit = (len(indices) // self.batch_size) * self.batch_size \
            if self.drop_last else len(indices)
        for start in range(0, limit, self.batch_size):
            yield indices[start : start + self.batch_size]

    def _iter_process(self, batches) -> Iterator[Batch]:
        """Fork-based pool decode with bounded in-flight batches."""
        import multiprocessing as mp

        global _FORK_DATASET
        _FORK_DATASET = self.dataset
        ctx = mp.get_context("fork")
        max_ahead = self.prefetch + self.num_workers
        it = iter(batches)
        with ctx.Pool(self.num_workers) as pool:
            pending = deque(
                pool.apply_async(_collate_indices_arrays_only, (idxs.tolist(),))
                for idxs in itertools.islice(it, max_ahead))
            while pending:
                # A bounded get: if a forked worker is OOM-killed or
                # segfaults, Pool respawns it but the in-flight result
                # never completes — an unbounded get() would freeze
                # training silently.
                try:
                    batch = pending.popleft().get(timeout=self.worker_timeout)
                except mp.TimeoutError:
                    raise RuntimeError(
                        "process-mode loader worker produced no batch "
                        f"within {self.worker_timeout}s — a forked worker "
                        "likely died (see fork-safety note in the module "
                        "docstring); try worker_mode='thread'")
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.apply_async(
                        _collate_indices_arrays_only, (nxt.tolist(),)))
                yield batch

    def __iter__(self) -> Iterator[Batch]:
        batches = list(self._batch_indices())
        if not batches:
            return
        if self.worker_mode == "process":
            yield from self._iter_process(batches)
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
