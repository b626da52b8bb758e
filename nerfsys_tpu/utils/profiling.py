"""Phase timing + JAX profiler integration.

Counterpart of the reference's hand-rolled phase telemetry
(/root/reference/adaptive_nerf/pipelines/offline_stage/meta_train_step.py:37-57,
179-253: perf_counter buckets setup/data/inner/outer/misc exported as
train/time_* TensorBoard scalars), upgraded with the TPU-native tooling the
reference lacks: `jax.profiler` device traces (viewable in TensorBoard /
Perfetto) and explicit device sync at bucket boundaries so host wall-clock
buckets actually mean something under async dispatch.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Named wall-clock buckets for one step; mirrors the reference's
    setup/data/inner/outer/misc accounting.

    Usage:
        pt = PhaseTimer(sync=jax.block_until_ready)
        with pt.phase("data"):
            batch = next(loader)
        with pt.phase("step", sync_args=(aux,)):
            params, aux = step(...)
        logger.scalars(pt.scalars(), step, prefix="train/")
    """

    def __init__(self, sync=None):
        self._sync = sync
        self.buckets: Dict[str, float] = {}
        self._t_start = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str, sync_args=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync is not None and sync_args is not None:
                self._sync(sync_args)
            self.buckets[name] = self.buckets.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def total(self) -> float:
        return time.perf_counter() - self._t_start

    def scalars(self) -> Dict[str, float]:
        out = {f"time_{k}": v for k, v in self.buckets.items()}
        total = self.total()
        out["batch_time"] = total
        accounted = sum(self.buckets.values())
        out["time_misc"] = max(total - accounted, 0.0)
        return out

    def reset(self):
        self.buckets.clear()
        self._t_start = time.perf_counter()


@contextlib.contextmanager
def device_trace(logdir, enabled: bool = True):
    """jax.profiler trace context writing a TensorBoard/Perfetto trace.

    The TPU-native replacement for the reference's cuda-synchronize timing:
    captures real device timelines (kernel durations, HBM traffic, infeed).
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a device trace (shows up on the host timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def memory_stats(device=None) -> Optional[Dict[str, float]]:
    """Live device memory stats (bytes) when the backend exposes them."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dict(stats())
    except Exception:
        return None
