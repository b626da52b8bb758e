"""Runtime-adaptation runner: one viewer step = one jitted optimizer update.

Counterpart of /root/reference/adaptive_nerf/viewer/engine/runners/
runtime_adapt.py:139-249. Support rays stream endlessly from a RamRaysDataset
built over the current metadata batch (a continual batch directory or the
checkpoint's validation split); each step() draws a fixed-size batch and
applies one Adam update through the full routed container.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import numpy as np

from nerfsys_tpu.data.loaders import InfiniteBatchSampler
from nerfsys_tpu.data.ram_rays import RamRaysDataset
from nerfsys_tpu.models.container import param_group_labels
from nerfsys_tpu.pipelines.online.runtime_adapt import make_adapt_step
from nerfsys_tpu.utils.optim import OptimConfig, build_optimizer
from nerfsys_tpu.viewer.engine.runners.base import BaseRunner, model_lock


class RuntimeAdaptRunner(BaseRunner):
    name = "runtime_adapt"

    def __init__(
        self,
        params,
        cfg,
        statics,
        metadata: Optional[List] = None,  # List[ImageMetadata]
        *,
        optim_cfg: Optional[OptimConfig] = None,
        ray_samples: int = 96,
        support_batch: int = 4096,
        color_space: str = "linear",
        bg_policy: str = "random",
        global_aabb: Optional[np.ndarray] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        seed: int = 0,
        occ_state=None,  # stacked expert occupancy (occ-guided adaptation)
    ):
        super().__init__(params, hparams={
            "ray_samples": int(ray_samples),
            "support_batch": int(support_batch),
            "color_space": color_space,
            "bg_policy": bg_policy,
            "lr_scale": 1.0,
        })
        self.cfg = cfg
        self.statics = statics
        self.metadata = list(metadata or [])
        self.optim_cfg = optim_cfg or OptimConfig(use_scheduler=False)
        self.global_aabb = global_aabb
        self.near, self.far = near, far
        self.occ_state = occ_state
        self.seed = int(seed)
        self._key = jax.random.PRNGKey(seed)
        self._loader_iter = None
        self._adapt_step = None
        self._tx = None
        self.num_support_rays = 0

    # ------------------------------- data ------------------------------------
    def set_metadata(self, metadata: List):
        """Swap the adaptation image set (e.g. a new continual batch)."""
        self.metadata = list(metadata)
        self.invalidate_data()

    def _ensure_data(self):
        if not self._data_dirty and self._loader_iter is not None:
            return
        if not self.metadata:
            raise RuntimeError("RuntimeAdaptRunner has no metadata to adapt on")
        ds = RamRaysDataset(
            self.metadata,
            scene_aabb=self.global_aabb,
            near_far_override=(self.near, self.far),
        )
        self.num_support_rays = len(ds)
        sampler = InfiniteBatchSampler(
            ds, int(self.hparams["support_batch"]), seed=self.seed
        )
        self._loader_iter = iter(sampler)
        self._data_dirty = False

    # ------------------------------- optimizer --------------------------------
    def _ensure_step_fn(self):
        if self._adapt_step is not None and self.opt_state is not None:
            return
        scale = float(self.hparams.get("lr_scale", 1.0))
        oc = self.optim_cfg

        def s(v):
            return None if v is None else v * scale

        oc = dataclasses.replace(
            oc,
            lr=oc.lr * scale,
            encoding_lr=s(oc.encoding_lr),
            sigma_lr=s(oc.sigma_lr),
            color_lr=s(oc.color_lr),
            bg_lr=s(oc.bg_lr),
            use_scheduler=False,
        )
        self._tx = build_optimizer(oc, param_group_labels(self.params))
        self.opt_state = self._tx.init(self.params)
        self._adapt_step = make_adapt_step(
            self.cfg,
            self._tx,
            ray_samples=int(self.hparams["ray_samples"]),
            color_space=str(self.hparams["color_space"]),
            bg_policy=str(self.hparams["bg_policy"]),
        )

    def update_train_hparams(self, **kw):
        super().update_train_hparams(**kw)
        self._adapt_step = None  # static args may have changed -> rebuild

    # ------------------------------- step -------------------------------------
    def step(self) -> Dict:
        self._ensure_data()
        self._ensure_step_fn()
        batch = next(self._loader_iter)
        self._key, k = jax.random.split(self._key)
        if self.occ_state is not None:
            new_params, new_opt_state, loss = self._adapt_step(
                self.params, self.opt_state, self.statics,
                batch["rays"], batch["rgbs"], k, self.occ_state,
            )
        else:
            new_params, new_opt_state, loss = self._adapt_step(
                self.params, self.opt_state, self.statics,
                batch["rays"], batch["rgbs"], k,
            )
        loss_f = float(loss)
        psnr = float(-10.0 * np.log10(max(loss_f, 1e-12)))
        with model_lock:
            self.params = new_params
            self.opt_state = new_opt_state
            self.steps += 1
            self.loss_history.append(loss_f)
            self.psnr_history.append(psnr)
        return {"loss": loss_f, "psnr": psnr, "steps": self.steps}
