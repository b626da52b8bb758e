"""Batched episode assembly + background prefetch for the jitted meta step.

Counterpart of the reference MultiLoader / InfiniteDataLoader
(/root/reference/adaptive_nerf/data/multi_loader.py:5-40,
infinite_loader.py:5-39). Where the reference yields {cell_id: [Task, ...]}
python structures for a serial loop, this loader assembles the fixed-shape
stacked batch the compiled TPU step consumes directly:

  { support_rays (K,B,S,8), support_rgbs (K,B,S,3),
    query_rays (K,B,Q,8),  query_rgbs (K,B,Q,3),  valid (K,B) }

Regions that fail to produce a task (empty pools) are zero-padded and masked
out via `valid`. A single background thread keeps `prefetch` batches ready so
host sampling overlaps device compute (the reference's worker processes play
this role).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional

import numpy as np

from nerfsys_tpu.data.task_dataset import TaskDataset


class MetaBatcher:
    """Assemble (K regions x B tasks) fixed-shape episode batches."""

    def __init__(self, task_datasets: List[TaskDataset], batch_size: int):
        assert task_datasets, "need at least one region TaskDataset"
        self.tds = task_datasets
        self.B = int(batch_size)
        self.K = len(task_datasets)
        self.S = task_datasets[0].S
        self.Q = task_datasets[0].Q

    def next_batch(self) -> Dict[str, np.ndarray]:
        K, B, S, Q = self.K, self.B, self.S, self.Q
        out = {
            "support_rays": np.zeros((K, B, S, 8), np.float32),
            "support_rgbs": np.zeros((K, B, S, 3), np.float32),
            "query_rays": np.zeros((K, B, Q, 8), np.float32),
            "query_rgbs": np.zeros((K, B, Q, 3), np.float32),
            "valid": np.zeros((K, B), np.float32),
        }
        # invalid (padded) tasks still need renderable rays: mark far<near
        out["support_rays"][..., 6] = 1.0
        out["query_rays"][..., 6] = 1.0
        for k, td in enumerate(self.tds):
            for b in range(self.B):
                t = td.sample_task()
                if t is None:
                    continue
                out["support_rays"][k, b] = t.support["rays"]
                out["support_rgbs"][k, b] = t.support["rgbs"]
                out["query_rays"][k, b] = t.query["rays"]
                out["query_rgbs"][k, b] = t.query["rgbs"]
                out["valid"][k, b] = 1.0
        return out

    def __iter__(self):
        while True:
            yield self.next_batch()


class PrefetchLoader:
    """Wrap any infinite batch iterator with a daemon prefetch thread."""

    def __init__(self, source, prefetch: int = 2):
        self._source = iter(source)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            for item in self._source:
                if self._stop.is_set():
                    return
                self._q.put(item)
        except Exception as e:  # surface worker errors to the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            self._q.get_nowait()
        except queue.Empty:
            pass


class InfiniteBatchSampler:
    """Uniform random ray batches from a RamRaysDataset, forever.

    The plain (non-episodic) data path used by single-scene training and
    runtime adaptation (reference InfiniteDataLoader semantics).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)

    def next_batch(self) -> Dict[str, np.ndarray]:
        n = len(self.ds)
        idx = self.rng.integers(0, n, size=self.batch_size)
        return {
            "rays": self.ds.rays[idx],
            "rgbs": self.ds.rgbs[idx],
            "img_indices": self.ds.img_indices[idx],
        }

    def __iter__(self):
        while True:
            yield self.next_batch()


class EpochBatchSampler:
    """Shuffled single pass over a RamRaysDataset in fixed-size batches.

    Used by runtime_adapt's one-epoch mode; the final short batch is padded
    by wrap-around so shapes stay static for jit.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        n = len(self.ds)
        order = self.rng.permutation(n)
        for s in range(0, n, self.batch_size):
            idx = order[s : s + self.batch_size]
            if idx.size < self.batch_size:
                pad = order[: self.batch_size - idx.size]
                idx = np.concatenate([idx, pad])
            yield {
                "rays": self.ds.rays[idx],
                "rgbs": self.ds.rgbs[idx],
                "img_indices": self.ds.img_indices[idx],
            }
