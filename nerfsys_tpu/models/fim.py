"""Fisher information tracking + FIM-weighted losses (functional).

Counterpart of /root/reference/adaptive_nerf/models/fim.py:4-93 and
nerfs/losses.py:35-151. The reference version is a dangling capability: its
`--fim` flag silently degrades to plain MSE because `fisher_store`/`fim_loss`
are never attached to experts (SURVEY.md §2.5). This rebuild makes the same
math actually operational in the functional setting:

  - Fisher state is a pytree shaped like the tracked params holding an EMA of
    squared gradients: F <- beta * F + (1 - beta) * g².
  - Batch mode: loss scaled by w = (1 + lam * mean(g² / (F + eps))),
    normalized around 1 — upweights steps whose gradients are surprising
    under the current Fisher.
  - Per-sample mode: per-ray MSE re-weighted by
    w_i = 1 + lam * mean(1/(F + eps)) * mse_i, mean-normalized.

All functions are pure; the Fisher state threads through the train loop like
optimizer state.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class FIMConfig:
    lam: float = 0.1
    beta: float = 0.95
    eps: float = 1e-6
    per_sample: bool = False
    clamp: Optional[Tuple[float, float]] = (0.2, 5.0)


def init_fisher(params: Params) -> Params:
    """Zero Fisher state matching the tracked params' structure."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def update_fisher(fisher: Params, grads: Params, cfg: FIMConfig) -> Params:
    """EMA of squared (unweighted) gradients: F <- beta F + (1-beta) g²."""
    return jax.tree_util.tree_map(
        lambda f, g: cfg.beta * f + (1.0 - cfg.beta) * jnp.square(
            jax.lax.stop_gradient(g)
        ),
        fisher,
        grads,
    )


def fim_batch_weight(fisher: Params, grads: Params, cfg: FIMConfig) -> Array:
    """Scalar loss weight from Fisher-normalized gradient energy
    (fim.py:43-63)."""
    leaves_f = jax.tree_util.tree_leaves(fisher)
    leaves_g = jax.tree_util.tree_leaves(grads)
    if not leaves_f:
        return jnp.asarray(1.0)
    terms = [
        jnp.mean(jnp.square(g.astype(jnp.float32)) / (f.astype(jnp.float32) + cfg.eps))
        for f, g in zip(leaves_f, leaves_g)
    ]
    num = jnp.mean(jnp.stack(terms))
    w = 1.0 + cfg.lam * num
    w = w / jnp.maximum(jax.lax.stop_gradient(w), 1e-8)  # normalize around 1
    if cfg.clamp is not None:
        w = jnp.clip(w, cfg.clamp[0], cfg.clamp[1])
    return w


def fim_sample_weights(fisher: Params, mse_i: Array, cfg: FIMConfig) -> Array:
    """Per-sample weights from inverse-Fisher scale (fim.py:65-78)."""
    leaves = jax.tree_util.tree_leaves(fisher)
    if leaves:
        s = jnp.mean(
            jnp.stack([jnp.mean(1.0 / (f.astype(jnp.float32) + 1e-8)) for f in leaves])
        )
    else:
        s = jnp.asarray(0.0)
    w = 1.0 + cfg.lam * s * jax.lax.stop_gradient(mse_i)
    w = w / jnp.maximum(jnp.mean(w), 1e-8)
    if cfg.clamp is not None:
        w = jnp.clip(w, cfg.clamp[0], cfg.clamp[1])
    return w


def fim_weighted_loss(
    loss_fn,  # params -> (mse_i (B,), aux)
    params: Params,
    fisher: Params,
    cfg: FIMConfig,
) -> Tuple[Array, Params, dict]:
    """One forward/backward with Fisher re-weighting.

    Returns (weighted scalar loss, updated fisher, aux). The Fisher update
    uses the UNWEIGHTED gradients, matching compute_fim_loss's support path.
    """
    def base(p):
        mse_i, aux = loss_fn(p)
        return jnp.mean(mse_i), (mse_i, aux)

    (base_loss, (mse_i, aux)), grads = jax.value_and_grad(base, has_aux=True)(params)
    new_fisher = update_fisher(fisher, grads, cfg)

    if cfg.per_sample:
        w_i = fim_sample_weights(new_fisher, mse_i, cfg)
        loss = jnp.mean(w_i * mse_i)
    else:
        w = fim_batch_weight(new_fisher, grads, cfg)
        loss = w * base_loss
    aux = dict(aux)
    aux["base_loss"] = base_loss
    return loss, new_fisher, aux
