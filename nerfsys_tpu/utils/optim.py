"""Optimizer construction with named per-group learning rates.

Counterpart of the reference get_optimizer/get_scheduler
(/root/reference/adaptive_nerf/common/utils.py:16-96): Adam/AdamW/SGD with
independent LRs for the 'encoding' / 'sigma' / 'color' / 'background' groups,
optional shared exponential decay lr_t = lr_0 * gamma^t with
gamma = (1/decay_factor)^(1/outer_steps), and global-norm gradient clipping
across ALL groups jointly (meta_core.py:186-196).

Implemented as one optax.multi_transform over the param-group labels from
models.container.param_group_labels.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"  # adam | adamw | sgd
    lr: float = 1e-4  # base lr (used when a group lr is None)
    encoding_lr: Optional[float] = 1e-2
    sigma_lr: Optional[float] = 2e-3
    color_lr: Optional[float] = 2e-3
    bg_lr: Optional[float] = 1e-3
    weight_decay: float = 0.0
    momentum: float = 0.9  # sgd only
    grad_clip: Optional[float] = 1.0
    # exponential decay: lr -> lr / decay_factor over outer_steps
    use_scheduler: bool = True
    decay_factor: float = 10.0
    outer_steps: int = 20000

    def group_lrs(self) -> Dict[str, float]:
        return {
            "encoding": self.encoding_lr if self.encoding_lr is not None else self.lr,
            "sigma": self.sigma_lr if self.sigma_lr is not None else self.lr,
            "color": self.color_lr if self.color_lr is not None else self.lr,
            "background": self.bg_lr if self.bg_lr is not None else self.lr,
        }


def _lr_schedule(cfg: OptimConfig, init_lr: float):
    if not cfg.use_scheduler or cfg.outer_steps <= 0 or cfg.decay_factor <= 1.0:
        return init_lr
    gamma = (1.0 / cfg.decay_factor) ** (1.0 / cfg.outer_steps)
    return optax.exponential_decay(
        init_value=init_lr, transition_steps=1, decay_rate=gamma
    )


def _group_optimizer(cfg: OptimConfig, lr) -> optax.GradientTransformation:
    name = cfg.optimizer.lower()
    # torch Adam/SGD treat weight_decay as L2 added to the gradient BEFORE
    # the moment updates (the reference passes it to both,
    # common/utils.py:54-70) — optax.add_decayed_weights before the
    # optimizer reproduces that; adamw keeps its decoupled form.
    l2 = (optax.add_decayed_weights(cfg.weight_decay)
          if cfg.weight_decay else optax.identity())
    if name == "adam":
        return optax.chain(l2, optax.adam(learning_rate=lr))
    if name == "adamw":
        return optax.adamw(learning_rate=lr, weight_decay=cfg.weight_decay)
    if name == "sgd":
        return optax.chain(l2, optax.sgd(learning_rate=lr,
                                         momentum=cfg.momentum))
    raise ValueError(f"Unknown optimizer: {cfg.optimizer}")


def build_optimizer(cfg: OptimConfig, labels) -> optax.GradientTransformation:
    """One transformation: global-norm clip -> per-group optimizer+schedule.

    `labels` is the pytree of group names matching the params structure
    (see models.container.param_group_labels).
    """
    transforms = {
        group: _group_optimizer(cfg, _lr_schedule(cfg, lr))
        for group, lr in cfg.group_lrs().items()
    }
    tx = optax.multi_transform(transforms, labels)
    if cfg.grad_clip is not None and cfg.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
