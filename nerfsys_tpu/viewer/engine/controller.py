"""Thread-based viewer training controller.

Counterpart of /root/reference/adaptive_nerf/viewer/engine/controller.py
(:18-428): owns the active runner, a background loop thread stepping it
toward a target step count, pause/resume/stop events, single-step, fast-reset
and checkpoint forwarding, and exposes the adapted params snapshot to the
render callback. Start-while-running EXTENDS the target (reference
controller.py start semantics).
"""
from __future__ import annotations

import threading
import traceback
from typing import Callable, Dict, Optional

from nerfsys_tpu.viewer.engine.runners.base import BaseRunner, ViewRunner


class Controller:
    MODES = ("view", "runtime_adapt", "meta_train")

    def __init__(
        self,
        runner_factory: Callable[[str], BaseRunner],
        *,
        mode: str = "view",
        on_metrics: Optional[Callable[[Dict], None]] = None,
    ):
        """runner_factory(mode) builds the runner for a mode on demand;
        built runners are cached so adaptation survives mode toggles."""
        self._factory = runner_factory
        self._runners: Dict[str, BaseRunner] = {}
        self._mode = mode if mode in self.MODES else "view"
        self._on_metrics = on_metrics

        self._thread: Optional[threading.Thread] = None
        self._pause = threading.Event()  # set -> paused
        self._stop = threading.Event()
        self._state_lock = threading.Lock()
        self._target_steps = 0
        self._running = False
        self._last_metrics: Dict = {}
        self._last_error: Optional[str] = None

    # ------------------------------- runners ----------------------------------
    @property
    def mode(self) -> str:
        return self._mode

    def set_mode(self, mode: str):
        if mode not in self.MODES:
            raise ValueError(f"unknown mode {mode!r}; expected one of {self.MODES}")
        if self._running:
            raise RuntimeError("stop the current run before switching modes")
        self._mode = mode

    @property
    def runner(self) -> BaseRunner:
        r = self._runners.get(self._mode)
        if r is None:
            r = self._factory(self._mode) if self._mode != "view" else None
            if r is None:
                r = ViewRunner(params=None)
            self._runners[self._mode] = r
        return r

    # ------------------------------- lifecycle --------------------------------
    @property
    def is_running(self) -> bool:
        return self._running

    @property
    def is_paused(self) -> bool:
        return self._pause.is_set()

    @property
    def last_error(self) -> Optional[str]:
        return self._last_error

    def start(self, steps: int):
        """Run `steps` more steps in the background. If already running,
        extend the target (reference 'Start' button semantics)."""
        with self._state_lock:
            if self._running:
                self._target_steps += int(steps)
                return
            self._target_steps = self.runner.steps + int(steps)
            self._stop.clear()
            self._pause.clear()
            self._last_error = None
            self._running = True
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def pause(self):
        self._pause.set()

    def resume(self):
        self._pause.clear()

    def stop(self, join: bool = True, timeout: float = 30.0):
        self._stop.set()
        self._pause.clear()
        t = self._thread
        if join and t is not None and t.is_alive():
            t.join(timeout=timeout)

    def step_once(self) -> Dict:
        """One synchronous step (reference 'Step' button)."""
        if self._running:
            raise RuntimeError("cannot single-step while the loop is running")
        m = self.runner.step()
        self._last_metrics = m
        if self._on_metrics and m:
            self._on_metrics(m)
        return m

    def _loop(self):
        """Background stepping (reference controller.py:353-384)."""
        try:
            while not self._stop.is_set():
                if self._pause.is_set():
                    self._pause.wait(timeout=0.1)
                    continue
                with self._state_lock:
                    if self.runner.steps >= self._target_steps:
                        break
                m = self.runner.step()
                self._last_metrics = m
                if self._on_metrics and m:
                    self._on_metrics(m)
        except Exception:
            self._last_error = traceback.format_exc()
        finally:
            self._running = False

    # ------------------------------- forwarding --------------------------------
    def get_render_params(self):
        """Adapted params snapshot for the render callback; None means 'use
        the base checkpoint params' (view mode)."""
        r = self._runners.get(self._mode)
        if r is None or isinstance(r, ViewRunner):
            return None
        return r.get_render_params()

    def reset_fast(self):
        if self._running:
            raise RuntimeError("stop before resetting")
        r = self._runners.get(self._mode)
        if r is not None:
            r.reset_fast()

    def update_train_hparams(self, **kw):
        self.runner.update_train_hparams(**kw)

    def update_data_hparams(self, **kw):
        self.runner.update_data_hparams(**kw)

    def save_checkpoint(self, path):
        return self.runner.save_checkpoint(path)

    def load_checkpoint(self, path):
        return self.runner.load_checkpoint(path)

    def status(self) -> Dict:
        r = self._runners.get(self._mode)
        return {
            "mode": self._mode,
            "running": self._running,
            "paused": self.is_paused,
            "steps": r.steps if r else 0,
            "target_steps": self._target_steps,
            "last_metrics": self._last_metrics,
            "error": self._last_error,
        }
