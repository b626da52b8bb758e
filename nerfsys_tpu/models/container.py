"""Mixture-of-experts NeRF container: spatial routing + background model.

TPU-native counterpart of the reference MetaContainer
(/root/reference/adaptive_nerf/models/inr/meta_container.py:21-503). The
redesign replaces the reference's serial per-expert Python loops
(index_select / index_add per expert) with ONE batched program:

  - All K experts share an architecture, so their params are stacked along a
    leading K axis and evaluated with jax.vmap — on TPU this becomes one
    batched matmul chain on the MXU instead of K kernel launches.
  - Routing produces dense (N, K) weights (soft inverse-distance with
    boundary-margin masking, or a one-hot argmin for hard routing); expert
    outputs are blended as sigma = sum_k w_k sigma_k, rgb = sum_k w_k rgb_k
    BEFORE integration, exactly matching the reference's soft-MoE semantics
    (meta_container.py:97-343, ray_rendering.py:473-475).

Evaluating all K experts on all points trades FLOPs for shape regularity —
the right trade on TPU for small expert MLPs: the blend masks most weights to
zero, but the compute stays static-shaped and fusable. For large K, shard the
expert axis over the device mesh (see parallel/).

Routing/centroid semantics (cdist over YZ if cluster_2d else XYZ, margin
mask, inverse-distance normalization) are preserved exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.models.ngp import (
    NGPConfig,
    init_ngp_params,
    ngp_apply,
    ngp_density,
)
from nerfsys_tpu.ops.encodings import (
    frequency_encode,
    frequency_out_dim,
    sh_encode,
    sh_out_dim,
)

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class ContainerConfig:
    """Static hyperparameters of the MoE container."""

    num_experts: int
    nerf_variant: str = "instant"  # 'instant' | 'vanilla'
    boundary_margin: float = 1.0  # > 1.0 -> soft routing
    cluster_2d: bool = True  # route on (y, z) only (aerial scenes)
    use_bg_nerf: bool = True
    bg_hidden: int = 32
    bg_encoding: str = "spherical"  # 'spherical' | 'fourier'
    expert: NGPConfig = dataclasses.field(default_factory=NGPConfig)

    @property
    def bg_enc_dim(self) -> int:
        if self.bg_encoding == "spherical":
            return sh_out_dim(4)
        return frequency_out_dim(3, 4, include_input=True)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ContainerStatics:
    """Non-learnable geometry buffers: centroids and scene boxes.

    Kept separate from params so meta-learning / optimizers never touch them,
    but still a pytree so they flow through jit without retracing.
    """

    centroids: Array  # (K, 3) world DRB
    expert_aabbs: Array  # (K, 2, 3)
    global_aabb: Array  # (2, 3)

    def tree_flatten(self):
        return (self.centroids, self.expert_aabbs, self.global_aabb), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# ------------------------------- init ---------------------------------------
def _linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -1.0, 1.0) * bound,
        "b": jax.random.uniform(kb, (out_dim,), dtype, -1.0, 1.0) * bound,
    }


def init_container_params(
    key: jax.Array, cfg: ContainerConfig, dtype=jnp.float32
) -> Params:
    """{'experts': stacked expert pytree (leading K), 'bg': {...} or {}}."""
    k_exp, k_bg1, k_bg2 = jax.random.split(key, 3)
    if cfg.nerf_variant == "instant":
        expert_keys = jax.random.split(k_exp, cfg.num_experts)
        experts = jax.vmap(lambda k: init_ngp_params(k, cfg.expert, dtype))(
            expert_keys
        )
    elif cfg.nerf_variant == "vanilla":
        from nerfsys_tpu.models.vanilla import init_vanilla_params

        expert_keys = jax.random.split(k_exp, cfg.num_experts)
        experts = jax.vmap(lambda k: init_vanilla_params(k, cfg.expert, dtype))(
            expert_keys
        )
    else:
        raise ValueError(f"Unknown nerf_variant: {cfg.nerf_variant}")

    params: Params = {"experts": experts}
    if cfg.use_bg_nerf:
        params["bg"] = {
            "l0": _linear_init(k_bg1, cfg.bg_enc_dim, cfg.bg_hidden, dtype),
            "l1": _linear_init(k_bg2, cfg.bg_hidden, 3, dtype),
        }
    return params


# ------------------------------- routing ------------------------------------
def routing_weights(
    statics: ContainerStatics, cfg: ContainerConfig, pts: Array
) -> Array:
    """Dense per-point expert weights (N, K).

    Soft (boundary_margin > 1): inverse distance over experts within
    margin * min-distance, normalized. Hard: one-hot of argmin. Spec:
    meta_container.py:97-134, expressed branch-free as a dense one-hot for
    the hard case so downstream code has a single (N, K) contract.
    """
    coord_idx = (1, 2) if cfg.cluster_2d else (0, 1, 2)
    x = pts[:, coord_idx].astype(jnp.float32)  # (N, d)
    c = statics.centroids[:, coord_idx].astype(jnp.float32)  # (K, d)
    # cdist
    dist = jnp.sqrt(
        jnp.maximum(
            jnp.sum(x**2, -1)[:, None]
            - 2.0 * x @ c.T
            + jnp.sum(c**2, -1)[None, :],
            0.0,
        )
    )  # (N, K)
    if cfg.boundary_margin > 1.0:
        dist = jnp.maximum(dist, 1e-6)
        invd = 1.0 / dist
        mind = jnp.min(dist, axis=1, keepdims=True)
        mask = dist <= cfg.boundary_margin * mind
        invd = invd * mask
        denom = jnp.maximum(jnp.sum(invd, axis=1, keepdims=True), 1e-6)
        return (invd / denom).astype(pts.dtype)
    hard = jnp.argmin(dist, axis=1)
    return jax.nn.one_hot(hard, cfg.num_experts, dtype=pts.dtype)


# ------------------------------- expert eval ---------------------------------
def _expert_apply_fn(cfg: ContainerConfig):
    if cfg.nerf_variant == "instant":
        return ngp_apply, ngp_density
    from nerfsys_tpu.models.vanilla import vanilla_apply, vanilla_density

    return vanilla_apply, vanilla_density


def _eval_all_experts(
    params: Params, cfg: ContainerConfig, statics: ContainerStatics,
    pts: Array, dirs: Optional[Array],
):
    """vmap over the stacked expert axis -> (rgb (K,N,3), sigma (K,N))."""
    apply_fn, density_fn = _expert_apply_fn(cfg)
    if dirs is None:
        sigma = jax.vmap(
            lambda p, box: density_fn(p, cfg.expert, box, pts)
        )(params["experts"], statics.expert_aabbs)
        return None, sigma
    rgb, sigma = jax.vmap(
        lambda p, box: apply_fn(p, cfg.expert, box, pts, dirs)
    )(params["experts"], statics.expert_aabbs)
    return rgb, sigma


# ------------------------------- public API ----------------------------------
def container_density(
    params: Params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    pts: Array,  # (N, 3)
    active_expert: Optional[int] = None,
) -> Array:
    """Routed density (N,). Spec: meta_container.py:228-343."""
    if active_expert is not None:
        _, density_fn = _expert_apply_fn(cfg)
        p_k = jax.tree_util.tree_map(lambda a: a[active_expert], params["experts"])
        return density_fn(p_k, cfg.expert, statics.expert_aabbs[active_expert], pts)
    _, sigma_k = _eval_all_experts(params, cfg, statics, pts, None)
    w = routing_weights(statics, cfg, pts)  # (N, K)
    return jnp.sum(w.T * sigma_k, axis=0)


def container_apply(
    params: Params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    pts: Array,  # (N, 3)
    dirs: Array,  # (N, 3)
    active_expert: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Routed field evaluation -> (rgb (N,3), sigma (N,)).

    Soft weights blend BOTH sigma and rgb before integration; hard routing is
    the one-hot special case of the same contraction.
    """
    if active_expert is not None:
        apply_fn, _ = _expert_apply_fn(cfg)
        p_k = jax.tree_util.tree_map(lambda a: a[active_expert], params["experts"])
        return apply_fn(
            p_k, cfg.expert, statics.expert_aabbs[active_expert], pts, dirs
        )
    rgb_k, sigma_k = _eval_all_experts(params, cfg, statics, pts, dirs)
    w = routing_weights(statics, cfg, pts)  # (N, K)
    sigma = jnp.sum(w.T * sigma_k, axis=0)  # (N,)
    rgb = jnp.sum(w.T[..., None] * rgb_k, axis=0)  # (N, 3)
    return rgb, sigma


def background_color(params: Params, cfg: ContainerConfig, d: Array) -> Array:
    """Learned background RGB from view direction (meta_container.py:347-382)."""
    if not cfg.use_bg_nerf or "bg" not in params:
        raise RuntimeError("background_color called but use_bg_nerf=False")
    lead = d.shape[:-1]
    dn = d.reshape(-1, 3)
    dn = dn / jnp.maximum(jnp.linalg.norm(dn, axis=-1, keepdims=True), 1e-9)
    if cfg.bg_encoding == "spherical":
        enc = sh_encode(dn, 4)
    else:
        enc = frequency_encode(dn, 4, include_input=True)
    bg = params["bg"]
    h = jax.nn.relu(enc @ bg["l0"]["w"] + bg["l0"]["b"])
    rgb = jax.nn.sigmoid(h @ bg["l1"]["w"] + bg["l1"]["b"])
    return rgb.reshape(*lead, 3)


def container_field_fn(
    params: Params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    active_expert: Optional[int] = None,
):
    """Bind into a FieldFn for ops.volrend renderers."""

    def field(pts: Array, dirs: Array):
        return container_apply(params, cfg, statics, pts, dirs, active_expert)

    return field


def container_bg_fn(params: Params, cfg: ContainerConfig):
    """Bind the learned background for renderers, or None if disabled."""
    if not cfg.use_bg_nerf or "bg" not in params:
        return None

    def bg(dirs: Array):
        return background_color(params, cfg, dirs)

    return bg


# ------------------------------- param groups --------------------------------
def param_group_labels(params: Params) -> Params:
    """Label every leaf with its optimizer group.

    Groups mirror the reference's named param groups (common/utils.py:16-76):
    'encoding' (hash tables / PE), 'sigma' (density trunk + heads), 'color'
    (color MLPs), 'background'. Use with optax.multi_transform for per-group
    learning rates.
    """

    def label_expert(experts):
        return {
            k: jax.tree_util.tree_map(
                lambda _: (
                    "encoding" if k in ("hash_table", "planes_enc") else
                    "color" if k == "color_mlp" else "sigma"
                ),
                v,
            )
            for k, v in experts.items()
        }

    labels = {"experts": label_expert(params["experts"])}
    if "bg" in params:
        labels["bg"] = jax.tree_util.tree_map(lambda _: "background", params["bg"])
    return labels
