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

    def next_index_plan(self) -> Dict[str, np.ndarray]:
        """One batch as RAY-INDEX arrays, before gathering ray data.

        The plan is tiny ((K, B, S) int64) and — given identical TaskDataset
        seeds — identical on every host, which is what lets multi-host
        training stride the expensive data materialization per process
        (MultiHostBatcher) while episode semantics stay coherent."""
        K, B, S, Q = self.K, self.B, self.S, self.Q
        plan = {
            "sup_idx": np.zeros((K, B, S), np.int64),
            "qry_idx": np.zeros((K, B, Q), np.int64),
            "valid": np.zeros((K, B), np.float32),
        }
        for k, td in enumerate(self.tds):
            for b in range(self.B):
                t = td.sample_task()
                if t is None:
                    continue
                plan["sup_idx"][k, b] = t.support["idx"]
                plan["qry_idx"][k, b] = t.query["idx"]
                plan["valid"][k, b] = 1.0
        return plan

    def materialize(
        self, plan: Dict[str, np.ndarray], name: str, index=None
    ) -> np.ndarray:
        """Gather ray data for (a slice of) an index plan.

        index: tuple of slices over the GLOBAL array shape (K, B, S|Q, C)
        (or (K, B) for 'valid'), as produced by jax sharding index maps;
        None gathers everything. Only the requested stripe is touched."""
        if name == "valid":
            return plan["valid"] if index is None else plan["valid"][index]
        split, leaf = name.split("_")  # support|query _ rays|rgbs
        idx_all = plan["sup_idx"] if split == "support" else plan["qry_idx"]
        K, B, S = idx_all.shape
        C = 8 if leaf == "rays" else 3
        ks, bs, ss, cs = (
            index if index is not None
            else (slice(None),) * 4
        )
        k_range = range(*ks.indices(K))
        b_range = range(*bs.indices(B))
        s_idx = idx_all[:, :, ss]
        n_s = s_idx.shape[2]
        out = np.zeros((len(k_range), len(b_range), n_s, C), np.float32)
        if leaf == "rays":
            out[..., 6] = 1.0  # padded/invalid tasks: far(0) < near(1)
        for ko, k in enumerate(k_range):
            src = self.tds[k].ds.rays if leaf == "rays" else self.tds[k].ds.rgbs
            for bo, b in enumerate(b_range):
                if plan["valid"][k, b]:
                    out[ko, bo] = src[s_idx[k, b]]
        return out[..., cs]

    def batch_from_plan(self, plan: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {
            name: self.materialize(plan, name)
            for name in ("support_rays", "support_rgbs", "query_rays",
                         "query_rgbs", "valid")
        }

    def next_batch(self) -> Dict[str, np.ndarray]:
        return self.batch_from_plan(self.next_index_plan())

    def __iter__(self):
        while True:
            yield self.next_batch()


class MultiHostBatcher:
    """Multi-host episode loader: stride data materialization by process.

    Every process runs the SAME episode plan (identical TaskDataset seeds ->
    identical cell/image/ray-index choices; the plan itself is (K, B, S)
    int64, trivially cheap), but gathers and uploads ONLY the ray stripes
    its addressable devices hold: jax.make_array_from_callback asks for the
    local shard indices and the batch arrives globally sharded without any
    host ever building the full (K, B, S, 8) arrays.

    This is the train-loop analogue of the reference's rank-strided
    preprocessing split (/root/reference/scripts/create_clusters.py:799),
    which the reference never had for training.
    """

    def __init__(self, batcher: MetaBatcher, mesh):
        import jax as _jax

        from nerfsys_tpu.parallel.mesh import batch_sharding

        self.batcher = batcher
        self.mesh = mesh
        self.shardings = batch_sharding(mesh)
        self._jax = _jax

    def _global_shape(self, name):
        K, B, S, Q = (self.batcher.K, self.batcher.B, self.batcher.S,
                      self.batcher.Q)
        if name == "valid":
            return (K, B)
        n = S if name.startswith("support") else Q
        c = 8 if name.endswith("rays") else 3
        return (K, B, n, c)

    def next_batch(self):
        plan = self.batcher.next_index_plan()
        out = {}
        for name, sh in self.shardings.items():
            shape = self._global_shape(name)
            out[name] = self._jax.make_array_from_callback(
                shape, sh,
                lambda index, name=name: self.batcher.materialize(
                    plan, name, index
                ),
            )
        return out

    def __iter__(self):
        while True:
            yield self.next_batch()


class PrefetchLoader:
    """Wrap any infinite batch iterator with a daemon prefetch thread."""

    def __init__(self, source, prefetch: int = 2):
        self.source = source  # kept for rewrapping (multi-host path)
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
