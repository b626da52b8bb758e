"""One outer meta-training step over a batched episode tensor, fully jitted.

TPU-native counterpart of the reference train_step
(/root/reference/adaptive_nerf/pipelines/offline_stage/meta_train_step.py:18-253)
and eval_step (meta_eval_step.py:16-148). The reference loops regions and
tasks serially in Python; here the whole step is ONE compiled program over:

  batch = {
    'support_rays': (K, B, S, 8), 'support_rgbs': (K, B, S, 3),
    'query_rays':   (K, B, Q, 8), 'query_rgbs':   (K, B, Q, 3),
    'valid':        (K, B)  -- padding mask for heterogeneous regions
  }

Parallelization layout (chosen for HBM fit at production scale — K=4, S=4000,
96 samples, 2^20 hash tables):
  - the K expert/region axis is vmapped (regions train concurrently on the
    MXU; each region uses its own expert params, so no dynamic indexing);
  - the B task axis is a lax.scan with GRADIENT ACCUMULATION — a fully
    vmapped (K x B) inner loop would materialize B parallel fast-weight
    copies and 8-corner hash-gather activations (~5 GB+) at once.

The sample-weighted region reduction and fed-avg scaling
loss_out_meta = K * loss_out match the reference exactly (with fixed S and Q,
per-task means ARE the reference's ray-count weighting). Padded tasks are
masked via select-then-sum so NaNs can't leak.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from nerfsys_tpu.models.container import ContainerConfig, ContainerStatics
from nerfsys_tpu.ops.losses import psnr_from_mse
from nerfsys_tpu.pipelines.offline.meta_core import (
    MetaConfig,
    query_loss,
    task_adapt,
)

Array = jax.Array
Params = Dict


def _per_task_slice(
    meta: MetaConfig,
    cfg: ContainerConfig,
    experts: Params,  # stacked (K, ...)
    expert_aabbs: Array,  # (K, 2, 3)
    bg_params,
    slice_b: Dict[str, Array],  # one task per region: (K, S, 8) etc.
    keys: Array,  # (K, 2, key)
    tto: Optional[int] = None,
    occ_binary: Optional[Array] = None,  # (K, L, R, R, R) stacked grids
    occ_on: Optional[Array] = None,  # traced bool scalar
    occ_values: Optional[Array] = None,  # (K, L, R, R, R) EMA densities
):
    """Adapt+query for one task of every region at once (vmap over K).

    Returns (fast (K, ...), qloss (K,), qpsnr (K,), inner_last (K,)).
    """

    def one(p_k, aabb_k, sup_r, sup_c, qry_r, qry_c, kk, occ_k, occv_k):
        fast, inner_losses = task_adapt(
            meta, cfg, p_k, aabb_k, bg_params, sup_r, sup_c, kk[0],
            iterations=tto, occ_binary=occ_k, occ_on=occ_on,
            occ_values=occv_k,
        )
        qloss, qpsnr = query_loss(
            meta, cfg, fast, aabb_k, bg_params, qry_r, qry_c, kk[1],
            occ_binary=occ_k, occ_on=occ_on, occ_values=occv_k,
        )
        return fast, qloss, qpsnr, inner_losses[-1]

    common = (
        experts, expert_aabbs,
        slice_b["support_rays"], slice_b["support_rgbs"],
        slice_b["query_rays"], slice_b["query_rgbs"], keys,
    )

    # lax.map runs experts as serial single-expert programs (1.56x faster
    # than vmap on one chip — see MetaConfig.expert_map); vmap keeps the
    # expert axis batched for mesh-sharded expert parallelism;
    # expert_unroll trades compile size for cross-expert overlap
    # (MetaConfig.expert_unroll).
    def run(fn, *extra):
        if meta.expert_map:
            args = (*common, *extra)
            if meta.expert_unroll:
                K = jax.tree_util.tree_leaves(experts)[0].shape[0]
                outs = [
                    fn(*jax.tree_util.tree_map(lambda a, k=k: a[k], args))
                    for k in range(K)
                ]
                return jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *outs)
            return jax.lax.map(lambda a: fn(*a), args)
        return jax.vmap(fn)(*common, *extra)

    if occ_binary is None:
        return run(
            lambda p, a, sr, sc, qr, qc, kk: one(
                p, a, sr, sc, qr, qc, kk, None, None
            )
        )
    if occ_values is None:
        return run(
            lambda p, a, sr, sc, qr, qc, kk, ob: one(
                p, a, sr, sc, qr, qc, kk, ob, None
            ),
            occ_binary,
        )
    return run(one, occ_binary, occ_values)


def _batch_to_task_major(batch: Dict[str, Array]) -> Dict[str, Array]:
    """(K, B, ...) -> (B, K, ...) so lax.scan iterates the task axis."""
    return {k: jnp.swapaxes(v, 0, 1) for k, v in batch.items()}


def _occ_args(occ_state, importance: bool = False):
    """(stacked binary (K,L,R,R,R), ready scalar, EMA values or None)."""
    if occ_state is None:
        return None, None, None
    from nerfsys_tpu.models.occupancy import occ_ready

    values = occ_state["occs"] if importance else None
    return occ_state["binary"], occ_ready(occ_state), values


def _finalize_metrics(region_q_sum, region_in_sum, region_n, total_n):
    region_out = region_q_sum / jnp.maximum(region_n, 1e-8)
    region_in = region_in_sum / jnp.maximum(region_n, 1e-8)
    loss_out = region_q_sum.sum() / total_n
    loss_in = region_in_sum.sum() / total_n
    return {
        "loss_in": loss_in,
        "loss_out": loss_out,
        "region_loss_in": region_in,
        "region_loss_out": region_out,
        "psnr_out": psnr_from_mse(loss_out),
        "region_psnr_out": psnr_from_mse(region_out),
    }


def make_train_step(
    meta: MetaConfig,
    cfg: ContainerConfig,
    optimizer: optax.GradientTransformation,
):
    """Build the jitted outer step: (params, opt_state, statics, batch, key)
    -> (params, opt_state, metrics)."""

    def maml_like_step(params, opt_state, statics: ContainerStatics, batch,
                       key, occ_state=None):
        K, B = batch["valid"].shape
        valid = batch["valid"].astype(jnp.float32)
        total_n = jnp.maximum(valid.sum(), 1e-8)
        tm = _batch_to_task_major(batch)
        all_keys = jax.random.split(key, B * K * 2).reshape(B, K, 2, -1)
        occ_binary, occ_on, occ_values = _occ_args(
            occ_state, meta.occ_importance)

        def loss_b(p, slice_b, keys_b):
            fast, qloss, qpsnr, inner_last = _per_task_slice(
                meta, cfg, p["experts"], statics.expert_aabbs, p.get("bg"),
                slice_b, keys_b, occ_binary=occ_binary, occ_on=occ_on,
                occ_values=occ_values,
            )
            v = slice_b["valid"].astype(jnp.float32)  # (K,)
            qloss = jnp.where(v > 0, qloss, 0.0)
            inner_last = jnp.where(v > 0, inner_last, 0.0)
            # fed-avg scaling: total loss_out_meta = K * sum(qloss*v)/total_n
            contrib = K * (qloss * v).sum() / total_n
            aux = (qloss * v, inner_last * v, v)
            return contrib, aux

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        zero_m = (jnp.zeros(K), jnp.zeros(K), jnp.zeros(K))

        def body(carry, xs):
            g_acc, m_acc, loss_acc = carry
            slice_b, keys_b = xs
            (contrib, aux), g = jax.value_and_grad(loss_b, has_aux=True)(
                params, slice_b, keys_b
            )
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            m_acc = tuple(a + b for a, b in zip(m_acc, aux))
            return (g_acc, m_acc, loss_acc + contrib), None

        if meta.task_unroll:
            # unrolled task bodies: same accumulation order as the scan
            # (bit-parity up to XLA reassociation), but the scheduler may
            # overlap neighboring tasks' programs (MetaConfig.task_unroll)
            carry = (zero_grads, zero_m, jnp.zeros(()))
            for b in range(B):
                carry, _ = body(carry, jax.tree_util.tree_map(
                    lambda a, b=b: a[b], (tm, all_keys)))
            grads, m_acc, loss_meta = carry
        else:
            (grads, m_acc, loss_meta), _ = jax.lax.scan(
                body, (zero_grads, zero_m, jnp.zeros(())), (tm, all_keys)
            )
        aux = _finalize_metrics(m_acc[0], m_acc[1], m_acc[2], total_n)

        finite = jnp.isfinite(loss_meta)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_params, params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
        )
        aux["loss_out_meta"] = loss_meta
        aux["grad_norm"] = optax.global_norm(grads)
        aux["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_params, new_opt_state, aux

    def reptile_step(params, opt_state, statics: ContainerStatics, batch,
                     key, occ_state=None):
        K, B = batch["valid"].shape
        valid = batch["valid"].astype(jnp.float32)
        total_n = jnp.maximum(valid.sum(), 1e-8)
        tm = _batch_to_task_major(batch)
        all_keys = jax.random.split(key, B * K * 2).reshape(B, K, 2, -1)
        occ_binary, occ_on, occ_values = _occ_args(
            occ_state, meta.occ_importance)
        experts = params["experts"]

        zero_delta = jax.tree_util.tree_map(jnp.zeros_like, experts)
        zero_m = (jnp.zeros(K), jnp.zeros(K), jnp.zeros(K))

        def body(carry, xs):
            d_acc, m_acc = carry
            slice_b, keys_b = xs
            fast, qloss, qpsnr, inner_last = _per_task_slice(
                meta, cfg, experts, statics.expert_aabbs, params.get("bg"),
                slice_b, keys_b, occ_binary=occ_binary, occ_on=occ_on,
                occ_values=occ_values,
            )
            v = slice_b["valid"].astype(jnp.float32)  # (K,)
            qloss = jnp.where(v > 0, qloss, 0.0)
            inner_last = jnp.where(v > 0, inner_last, 0.0)

            def add_delta(acc, f, theta):
                w = v.reshape(-1, *((1,) * (f.ndim - 1)))
                return acc + jnp.where(w > 0, f - theta, 0.0) * w

            d_acc = jax.tree_util.tree_map(
                lambda acc, f, theta: add_delta(acc, f, theta),
                d_acc, fast, experts,
            )
            m_acc = tuple(a + b for a, b in zip(m_acc, (qloss * v, inner_last * v, v)))
            return (d_acc, m_acc), None

        (delta_sum, m_acc), _ = jax.lax.scan(body, (zero_delta, zero_m), (tm, all_keys))
        region_n = jnp.maximum(m_acc[2], 1.0)  # (K,) valid tasks per region

        def apply(theta, dsum):
            n = region_n.reshape(-1, *((1,) * (dsum.ndim - 1)))
            return theta + meta.reptile_lr * dsum / n

        new_params = dict(params)
        new_params["experts"] = jax.tree_util.tree_map(apply, experts, delta_sum)

        aux = _finalize_metrics(m_acc[0], m_acc[1], m_acc[2], total_n)
        aux["loss_out_meta"] = aux["loss_out"]
        aux["grad_norm"] = jnp.zeros(())
        aux["skipped_nonfinite"] = jnp.zeros(())
        return new_params, opt_state, aux

    step_fn = reptile_step if meta.algo == "reptile" else maml_like_step
    return jax.jit(step_fn)


def make_eval_step(meta: MetaConfig, cfg: ContainerConfig, tto: int):
    """Episodic eval: adapt `tto` iterations on support, PSNR on query.

    Counterpart of meta_eval_step.py:16-148. Scan over tasks, vmap over
    regions, same memory layout as training.
    """

    def eval_step(params, statics: ContainerStatics, batch, key,
                  occ_state=None):
        K, B = batch["valid"].shape
        valid = batch["valid"].astype(jnp.float32)
        total_n = jnp.maximum(valid.sum(), 1e-8)
        tm = _batch_to_task_major(batch)
        all_keys = jax.random.split(key, B * K * 2).reshape(B, K, 2, -1)
        occ_binary, occ_on, occ_values = _occ_args(
            occ_state, meta.occ_importance)

        zero_m = (jnp.zeros(K), jnp.zeros(K), jnp.zeros(K))

        def body(m_acc, xs):
            slice_b, keys_b = xs
            _, qloss, qpsnr, inner_last = _per_task_slice(
                meta, cfg, params["experts"], statics.expert_aabbs,
                params.get("bg"), slice_b, keys_b, tto=tto,
                occ_binary=occ_binary, occ_on=occ_on,
                occ_values=occ_values,
            )
            v = slice_b["valid"].astype(jnp.float32)
            qloss = jnp.where(v > 0, qloss, 0.0)
            inner_last = jnp.where(v > 0, inner_last, 0.0)
            m_acc = tuple(
                a + b for a, b in zip(m_acc, (qloss * v, inner_last * v, v))
            )
            return m_acc, None

        m_acc, _ = jax.lax.scan(body, zero_m, (tm, all_keys))
        return _finalize_metrics(m_acc[0], m_acc[1], m_acc[2], total_n)

    return jax.jit(eval_step)
