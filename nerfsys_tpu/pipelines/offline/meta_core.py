"""Meta-learning core: inner-loop task adaptation + outer meta updates.

TPU-native counterpart of the reference meta_core
(/root/reference/adaptive_nerf/pipelines/offline_stage/meta_core.py:14-178).
The reference's MetaModule fast-weight machinery dissolves entirely: fast
weights are just another params pytree, the inner loop is a lax.scan of
SGD steps with jax.grad inside, and the algo zoo falls out of autodiff
structure:

  - MAML:   differentiate the query loss through the whole inner scan
            (second-order); each inner step is jax.checkpoint-ed so the
            backward pass rematerializes instead of storing 8 renderings.
  - FoMAML: stop_gradient on the inner gradients — the adapted params keep
            their identity dependence on the base params, so outer grads
            equal query-loss grads at the adapted point (exactly the
            reference's create_graph=False semantics).
  - Reptile: pure pytree algebra, theta += lr * mean(W_adapted - theta).

Inner adaptation touches ONLY the active expert's params (hash table + MLPs);
the background model participates in rendering as a constant during the inner
loop and receives gradients only from the outer query loss — matching
extract_module_params scoping in the reference (:196-205).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.models.container import (
    ContainerConfig,
    background_color,
    _expert_apply_fn,
)
from nerfsys_tpu.ops.losses import compute_mse_loss

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class MetaConfig:
    """Static hyperparameters of meta-training."""

    algo: str = "fomaml"  # maml | fomaml | reptile
    inner_iter: int = 8
    inner_lr: float = 0.015
    reptile_lr: float = 1e-4  # outer lr for the reptile rule (reference P.lr)
    ray_samples: int = 96
    color_space: str = "srgb"
    bg_policy: str = "white"  # used when the container has no bg model
    sigma_scale: float = 1.0
    randomized: bool = True
    # density-proportional importance sampling inside occupied space (uses
    # the occ grid's EMA values as the pdf; free — no extra MLP evals)
    occ_importance: bool = False
    # mask sigma by the sample's probe-interval bit instead of re-querying
    # the binary grid at every sample point: saves one grid gather per
    # sample per inner iteration; interval-resolution masking is strictly
    # more conservative (keeps sigma wherever the probe saw occupancy)
    occ_probe_mask: bool = False
    # False: occupancy only STEERS sample placement (pure importance
    # sampling); sigma is never hard-zeroed, so grid imperfections cannot
    # delete geometry — the quality-first occ mode
    occ_hard_mask: bool = True
    # whole-ray uniform pdf floor for the soft mode: keeps unmarked space
    # sampled (and hence trainable) even when the grid missed it
    occ_ray_floor: float = 0.25
    # probes per ray for the occupancy CDF (pass 1); 128 matches the occ
    # grid resolution, 64 halves the probe gather cost at coarser pdf
    occ_probes: int = 128
    # Evaluate the K expert/region axis with lax.map (serial per-expert
    # programs) instead of vmap. Measured on v5e: 343 vs 536 ms/inner-iter
    # at K=4 — each single-expert program saturates the chip on its own, and
    # vmap's batched gathers/contractions carry overhead serialization
    # avoids. MUST be False when the expert axis is sharded over a device
    # mesh ('expert' > 1): scanning a sharded axis would serialize experts
    # that vmap keeps parallel across devices.
    expert_map: bool = True
    # Unroll the expert axis as K independent single-expert programs in ONE
    # traced graph instead of lax.map's while-loop. lax.map's serial
    # semantics forbid XLA from overlapping expert i+1's table gathers with
    # expert i's MLP/compositing tail — the step's non-gather ~30%
    # (BASELINE.md hardware-accounting row) runs between gather bursts with
    # nothing hidden behind it; unrolling lets the scheduler interleave the
    # K chains. Costs ~K x the compile/program size. Only meaningful with
    # expert_map=True (ignored under vmap / sharded expert axis).
    expert_unroll: bool = False
    # Same trade for the B-task gradient-accumulation scan in the
    # maml-like outer step: unrolled task bodies only depend on each other
    # through the grad-accumulator adds, so XLA may overlap task b+1's
    # probe/gathers with task b's tail. Costs ~B x compile/program size
    # and lets activations of neighboring tasks coexist (watch HBM).
    task_unroll: bool = False

    @property
    def first_order(self) -> bool:
        return self.algo in ("fomaml", "reptile")


def _expert_loss_fn(
    meta: MetaConfig,
    cfg: ContainerConfig,
    expert_params: Params,
    aabb: Array,
    bg_params: Optional[Params],
    rays: Array,
    rgbs: Array,
    key: Optional[jax.Array],
    randomized: bool,
    occ_binary: Optional[Array] = None,  # (L, R, R, R) this expert's grid
    occ_on: Optional[Array] = None,  # traced bool: grid ready
    occ_values: Optional[Array] = None,  # (L, R, R, R) EMA densities
    occ_cdf=None,  # precomputed probe CDF for fixed support rays
):
    """Single-expert render loss (reference compute_loss with active_module).

    With an occupancy grid attached, rendering dispatches stratified->occ
    exactly like the reference render_rays once the grid is ready."""
    apply_fn, _ = _expert_apply_fn(cfg)

    def field(pts, dirs):
        return apply_fn(expert_params, cfg.expert, aabb, pts, dirs)

    bg_fn = None
    if cfg.use_bg_nerf and bg_params is not None:
        def bg_fn(dirs):
            return background_color({"bg": bg_params}, cfg, dirs)

    binary_fn = value_fn = pair_fn = None
    if occ_binary is not None:
        from nerfsys_tpu.ops.occupancy import (
            query_binary,
            query_pair,
            query_values,
        )

        def binary_fn(pts):
            return query_binary(occ_binary, aabb, pts)

        if meta.occ_importance and occ_values is not None:
            def value_fn(pts):
                return query_values(occ_values, aabb, pts)

            def pair_fn(pts):  # one fused 2-wide row per probe point
                return query_pair(occ_values, occ_binary, aabb, pts)

    loss, aux = compute_mse_loss(
        field,
        rays,
        rgbs,
        ray_samples=meta.ray_samples,
        key=key,
        randomized=randomized,
        color_space=meta.color_space,
        bg_policy=meta.bg_policy,
        bg_fn=bg_fn,
        sigma_scale=meta.sigma_scale,
        binary_fn=binary_fn,
        occ_on=occ_on,
        value_fn=value_fn,
        pair_fn=pair_fn,
        occ_cdf=occ_cdf,
        occ_probe_mask=meta.occ_probe_mask,
        occ_hard_mask=meta.occ_hard_mask,
        occ_ray_floor=meta.occ_ray_floor,
        n_probes=meta.occ_probes,
    )
    return loss, aux


def task_adapt(
    meta: MetaConfig,
    cfg: ContainerConfig,
    expert_params: Params,  # one expert's pytree (no K axis)
    aabb: Array,  # (2, 3)
    bg_params: Optional[Params],
    support_rays: Array,  # (S, 8)
    support_rgbs: Array,  # (S, 3)
    key: jax.Array,
    iterations: Optional[int] = None,
    inner_lr: Optional[float] = None,
    occ_binary: Optional[Array] = None,
    occ_on: Optional[Array] = None,
    occ_values: Optional[Array] = None,
) -> Tuple[Params, Array]:
    """Inner-loop adaptation: `iterations` SGD steps on the support loss.

    Returns (fast_params, inner_losses (iterations,)). Differentiable through
    the scan for MAML; first-order algorithms cut the gradient path at the
    inner gradients (but keep the identity path to the base params).
    """
    iterations = meta.inner_iter if iterations is None else iterations
    lr = meta.inner_lr if inner_lr is None else inner_lr
    if iterations <= 0:
        # tto=0: no adaptation; report a zero inner loss so metric shapes
        # stay static (reference eval supports tto 0, nerf_runner.py:339)
        return expert_params, jnp.zeros((1,))
    bg_const = jax.lax.stop_gradient(bg_params) if bg_params is not None else None

    occ_cdf = None
    if occ_binary is not None:
        # Support rays and the grid are CONSTANT across the inner scan, so
        # the probe pass (the dominant occupancy-sampling cost) runs ONCE
        # per task; each iteration draws fresh randomized samples from the
        # cached CDF. Exact — same quantities, just hoisted.
        from nerfsys_tpu.ops.occupancy import (
            occupancy_probe_cdf,
            query_binary,
            query_pair,
        )

        o, d = support_rays[:, 0:3], support_rays[:, 3:6]
        near, far = support_rays[:, 6], support_rays[:, 7]
        s_valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (
            far < 1e9
        )
        near_s = jnp.where(s_valid, near, 0.0)
        far_s = jnp.where(s_valid, far, 1.0)
        # importance probing fetches (binary, value) as ONE fused 2-wide
        # row per probe point (query_pair) — half the probe transactions
        pfn = None
        if meta.occ_importance and occ_values is not None:
            pfn = lambda pts: query_pair(occ_values, occ_binary, aabb, pts)

        def build_cdf():
            return occupancy_probe_cdf(
                lambda pts: query_binary(occ_binary, aabb, pts),
                o, d, near_s, far_s, meta.occ_probes, pair_fn=pfn,
                ray_floor=0.0 if meta.occ_hard_mask else meta.occ_ray_floor,
            )

        if occ_on is None:
            occ_cdf = build_cdf()
        else:
            # during stratified warmup the occ branch is never taken; skip
            # the probe pass entirely (lax.cond executes one branch)
            n, P = o.shape[0], meta.occ_probes
            occ_cdf = jax.lax.cond(
                occ_on,
                build_cdf,
                lambda: {"cdf": jnp.zeros((n, P + 1), o.dtype),
                         "alive": jnp.zeros((n,), bool),
                         "occ": jnp.zeros((n, P), bool)},
            )

    def loss_fn(p, k):
        loss, _ = _expert_loss_fn(
            meta, cfg, p, aabb, bg_const, support_rays, support_rgbs, k,
            randomized=meta.randomized,
            occ_binary=occ_binary, occ_on=occ_on, occ_values=occ_values,
            occ_cdf=occ_cdf,
        )
        return loss

    @jax.checkpoint
    def step(p, k):
        loss, g = jax.value_and_grad(loss_fn)(p, k)
        p = jax.tree_util.tree_map(lambda w, gg: w - lr * gg.astype(w.dtype), p, g)
        return p, loss

    keys = jax.random.split(key, iterations)

    if meta.first_order:
        # First-order path: keep the inner scan OUT of the autodiff graph
        # entirely (a differentiated scan stores every per-step params carry —
        # iterations x full fast-weight copies of HBM). The adapted VALUE is
        # computed under stop_gradient and reattached through the identity
        # path p0 + sg(fast - p0), so outer grads equal query-loss grads at
        # the adapted point — exactly FoMAML (create_graph=False) semantics.
        p0_const = jax.lax.stop_gradient(expert_params)
        fast_const, losses = jax.lax.scan(step, p0_const, keys)
        fast = jax.tree_util.tree_map(
            lambda base, f: base + jax.lax.stop_gradient(f - base),
            expert_params,
            fast_const,
        )
        return fast, losses

    # MAML: differentiate through the scan (each step rematerialized).
    fast, losses = jax.lax.scan(step, expert_params, keys)
    return fast, losses


def query_loss(
    meta: MetaConfig,
    cfg: ContainerConfig,
    fast_params: Params,
    aabb: Array,
    bg_params: Optional[Params],
    query_rays: Array,
    query_rgbs: Array,
    key: Optional[jax.Array] = None,
    occ_binary: Optional[Array] = None,
    occ_on: Optional[Array] = None,
    occ_values: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Query-set loss at the adapted weights -> (loss, psnr)."""
    loss, aux = _expert_loss_fn(
        meta, cfg, fast_params, aabb, bg_params, query_rays, query_rgbs, key,
        randomized=meta.randomized and key is not None,
        occ_binary=occ_binary, occ_on=occ_on, occ_values=occ_values,
    )
    return loss, aux["psnr"]


def reptile_update(
    base_experts: Params,  # stacked (K, ...)
    fast_experts: Params,  # adapted (K, B, ...)
    valid: Array,  # (K, B) float/bool task mask
    lr: float,
) -> Params:
    """theta_k += lr * mean_b(W_kb - theta_k), over valid tasks only.

    Spec: reference reptile_meta_update (meta_core.py:144-178).
    """
    v = valid.astype(jnp.float32)
    denom = jnp.maximum(v.sum(axis=1), 1.0)  # (K,)

    def upd(theta, fast):
        # theta: (K, ...), fast: (K, B, ...)
        extra = (1,) * (fast.ndim - 2)
        w = v.reshape(v.shape[0], v.shape[1], *extra)
        # select-then-sum so NaNs from padded/failed tasks can't leak
        diff = jnp.where(w > 0, fast - theta[:, None], 0.0)
        delta = (diff * w).sum(axis=1)
        delta = delta / denom.reshape(-1, *((1,) * (delta.ndim - 1)))
        return theta + lr * delta

    return jax.tree_util.tree_map(upd, base_experts, fast_experts)
