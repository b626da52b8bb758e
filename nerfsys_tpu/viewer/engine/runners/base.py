"""Runner base: param-snapshot exchange between train thread and renderer.

Counterpart of /root/reference/adaptive_nerf/viewer/engine/runners/base.py
(:8 model_lock, :11-184 BaseRunner). The reference serializes render vs train
on one global lock around a mutable torch module. Here params are immutable
JAX pytrees, so the contract is lighter: the train thread replaces
`self.params` atomically under `model_lock`, and the renderer grabs a
snapshot under the same lock — after that both sides run lock-free (a render
can overlap the next optimizer step on device).
"""
from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Dict, Optional

from flax import serialization

# Serializes snapshot/replace of runner state (params, counters) between the
# controller's train thread and render callbacks.
model_lock = threading.RLock()


class BaseRunner:
    """Holds the live params pytree + optimizer state for a viewer mode.

    Subclasses implement `step()` (one optimizer update) and may override
    `invalidate_data()` when data hyperparameters change.
    """

    name = "base"

    def __init__(self, params, *, hparams: Optional[Dict] = None):
        self.base_params = params  # reset_fast target (meta-learned base)
        self.params = params
        self.opt_state = None
        self.steps = 0
        self.loss_history: list = []
        self.psnr_history: list = []
        self.hparams: Dict = dict(hparams or {})
        self._data_dirty = True

    # ------------------------------- stepping --------------------------------
    def step(self) -> Dict:
        """One training step; returns a metrics dict. Default: no-op."""
        return {}

    # ------------------------------- state -----------------------------------
    def get_render_params(self):
        """Snapshot of the current (possibly adapted) params for rendering
        (reference controller.get_render_params :328-348)."""
        with model_lock:
            return self.params

    def reset_fast(self):
        """Drop all adaptation: back to the base params, clear optimizer
        state and counters (reference base.py reset_fast)."""
        with model_lock:
            self.params = self.base_params
            self.opt_state = None
            self.steps = 0
            self.loss_history.clear()
            self.psnr_history.clear()

    # ------------------------------- hparams ---------------------------------
    def update_train_hparams(self, **kw):
        """Live training hyperparameter change (LR etc.); optimizer state is
        rebuilt lazily by the subclass on next step."""
        self.hparams.update(kw)
        self.opt_state = None

    def update_data_hparams(self, **kw):
        """Data hyperparameter change (batch dir, ray batch, downscale);
        invalidates any cached loader."""
        self.hparams.update(kw)
        self._data_dirty = True

    def invalidate_data(self):
        self._data_dirty = True

    # ------------------------------- checkpoints -----------------------------
    def save_checkpoint(self, path) -> Path:
        """Lightweight viewer checkpoint: adapted params + steps + hparams
        (reference base.py:45-81 'runtime_adapt' checkpoints)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with model_lock:
            params, steps = self.params, self.steps
        path.write_bytes(serialization.to_bytes(params))
        meta = {
            "steps": int(steps),
            "runner": self.name,
            "hparams": {
                k: v for k, v in self.hparams.items()
                if isinstance(v, (int, float, str, bool))
            },
        }
        path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta))
        return path

    def load_checkpoint(self, path):
        path = Path(path)
        with model_lock:
            self.params = serialization.from_bytes(
                self.params, path.read_bytes()
            )
            self.opt_state = None
        meta_path = path.with_suffix(path.suffix + ".json")
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            self.steps = int(meta.get("steps", 0))
        return self.params


class ViewRunner(BaseRunner):
    """Pure viewing: no training, step() is a no-op (reference ViewRunner)."""

    name = "view"
