"""In-viewer meta-training runner.

Counterpart of /root/reference/adaptive_nerf/viewer/engine/runners/
meta_train.py:1-43 — in the reference this is a stub the controller reports
as 'not wired yet' (controller.py:164-169). Here one step() runs one REAL
jitted outer meta-step when episode loaders are provided, and degrades to a
clear error otherwise.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax

from nerfsys_tpu.models.container import param_group_labels
from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer
from nerfsys_tpu.viewer.engine.runners.base import BaseRunner, model_lock


class MetaTrainRunner(BaseRunner):
    name = "meta_train"

    def __init__(
        self,
        params,
        cfg,
        statics,
        *,
        meta_cfg=None,
        optim_cfg: Optional[OptimConfig] = None,
        train_loader=None,  # yields stacked episode batches (data.loaders)
        seed: int = 0,
    ):
        super().__init__(params)
        self.cfg = cfg
        self.statics = statics
        self.meta_cfg = meta_cfg
        self.optim_cfg = optim_cfg or OptimConfig()
        self.train_loader = train_loader
        self._loader_iter = iter(train_loader) if train_loader is not None else None
        self._key = jax.random.PRNGKey(seed)
        self._step_fn = None

    def _ensure_step_fn(self):
        if self._step_fn is not None:
            return
        if self.meta_cfg is None or self._loader_iter is None:
            raise RuntimeError(
                "MetaTrainRunner needs meta_cfg and a train_loader; launch the "
                "viewer from a train context to enable in-viewer meta-training"
            )
        from nerfsys_tpu.pipelines.offline.meta_train_step import make_train_step

        self._tx = build_optimizer(self.optim_cfg, param_group_labels(self.params))
        self.opt_state = self._tx.init(self.params)
        self._step_fn = make_train_step(self.meta_cfg, self.cfg, self._tx)

    def step(self) -> Dict:
        self._ensure_step_fn()
        batch = next(self._loader_iter)
        self._key, k = jax.random.split(self._key)
        new_params, new_opt, aux = self._step_fn(
            self.params, self.opt_state, self.statics, batch, k
        )
        loss = float(aux["loss_out"])
        with model_lock:
            self.params = new_params
            self.opt_state = new_opt
            self.steps += 1
            self.loss_history.append(loss)
        return {"loss": loss, "steps": self.steps}
