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
import math
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
    # Bucketed (block-sparse) expert dispatch: evaluate each point under its
    # top-E nearest experts only, batched per expert in fixed-capacity
    # buckets — O(E*N) field evals instead of the dense O(K*N). Exact vs the
    # dense blend whenever the margin support set fits in E experts and no
    # bucket overflows (capacity_factor headroom); pays off for K >~ 8.
    bucketed: bool = False
    experts_per_point: int = 2
    capacity_factor: float = 1.5
    # When a bucket overflows (spatially COHERENT point sets — e.g. a render
    # chunk whose rays all cross one expert's region — concentrate up to N
    # points on one expert while C is only ~N*E/K*cf), fall back to the
    # dense all-experts blend for that call via lax.cond instead of silently
    # dropping overflow pairs to the trash slot (sigma 0 — measured -3.5 dB
    # on real-scene renders, BASELINE.md). Both branches compile; only the
    # taken one executes, so balanced workloads keep the bucketed speed.
    bucket_overflow_dense: bool = True
    # Evaluate the stacked expert axis with lax.map (serial single-expert
    # programs) instead of vmap. Same trade as MetaConfig.expert_map:
    # batched table gathers under vmap fall off the TPU fast path, so on
    # one chip K serial programs beat one K-batched program (measured
    # 295 ms vs 2497 ms for a 3.1M-point dense render chunk at K=4).
    # MUST be False when the 'expert' mesh axis is sharded — lax.map would
    # serialize what the mesh parallelizes (runner.maybe_shard_training
    # flips both this and MetaConfig.expert_map). Runtime perf knob, not
    # an architecture key: checkpoints are unaffected.
    expert_map: bool = True

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
def _routing_dist(
    statics: ContainerStatics, cfg: ContainerConfig, pts: Array
) -> Array:
    """(N, K) centroid distances in the routing subspace (YZ if cluster_2d)."""
    coord_idx = (1, 2) if cfg.cluster_2d else (0, 1, 2)
    x = pts[:, coord_idx].astype(jnp.float32)  # (N, d)
    c = statics.centroids[:, coord_idx].astype(jnp.float32)  # (K, d)
    return jnp.sqrt(
        jnp.maximum(
            jnp.sum(x**2, -1)[:, None]
            - 2.0 * x @ c.T
            + jnp.sum(c**2, -1)[None, :],
            0.0,
        )
    )


def routing_weights(
    statics: ContainerStatics, cfg: ContainerConfig, pts: Array
) -> Array:
    """Dense per-point expert weights (N, K).

    Soft (boundary_margin > 1): inverse distance over experts within
    margin * min-distance, normalized. Hard: one-hot of argmin. Spec:
    meta_container.py:97-134, expressed branch-free as a dense one-hot for
    the hard case so downstream code has a single (N, K) contract.
    """
    dist = _routing_dist(statics, cfg, pts)  # (N, K)
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


def routing_coherent_expert(
    statics: ContainerStatics, cfg: ContainerConfig, pts_ns: Array
) -> Array:
    """Per-ray coherent expert id (N,) int32, or -1 for boundary rays.

    A ray is coherent on expert k iff at EVERY sample position the routed
    blend degenerates to expert k alone: argmin-distance == k at all
    samples, and (soft routing, boundary_margin > 1) no other expert sits
    inside the margin support (d2 > margin * d1 strictly — the weight
    mask is d <= margin * d_min, routing_weights above). For such rays
    the full routed render and the single-expert render are the SAME
    function — the exactness contract of the coherent-chunk dispatch
    (runtime_adapt.coherent_dispatch; the fast live path for spatially
    clustered scenes where bucketed top-1 degrades to dense on skewed
    frames). Reference analogue: the hard `_routing` path
    (/root/reference/adaptive_nerf/models/inr/meta_container.py:97-134)
    — the reference evaluates it per point serially; here whole rays
    collapse to one-expert programs."""
    N, S = pts_ns.shape[0], pts_ns.shape[1]
    dist = _routing_dist(statics, cfg, pts_ns.reshape(N * S, 3))
    dist = dist.reshape(N, S, -1)
    a1 = jnp.argmin(dist, axis=-1)  # (N, S)
    same = jnp.all(a1 == a1[:, :1], axis=1)
    if cfg.boundary_margin > 1.0:
        # the SAME 1e-6 clamp as routing_weights: its margin mask is built
        # on clamped distances, so the singleton test must see them too —
        # unclamped, a point with d1 < 1e-6/margin <= d2 < 1e-6 would read
        # as coherent while the blend is genuinely two-expert
        top2 = -jax.lax.top_k(-jnp.maximum(dist, 1e-6), 2)[0]  # (N, S, 2)
        singleton = jnp.all(
            top2[..., 1] > cfg.boundary_margin * top2[..., 0], axis=1
        )
        same = same & singleton
    return jnp.where(same, a1[:, 0], -1).astype(jnp.int32)


# ------------------------------- expert eval ---------------------------------
def _expert_apply_fn(cfg: ContainerConfig):
    if cfg.nerf_variant == "instant":
        return ngp_apply, ngp_density
    from nerfsys_tpu.models.vanilla import vanilla_apply, vanilla_density

    return vanilla_apply, vanilla_density


def over_experts(cfg: ContainerConfig):
    """Map `f(xs_slice)` over the stacked expert axis of the pytree `xs`.

    cfg.expert_map selects serial per-expert lax.map programs (the
    single-chip fast path — batched table gathers under vmap fall off the
    TPU fast path) vs vmap (kept when the 'expert' mesh axis is sharded:
    lax.map would serialize what the mesh parallelizes). One definition so
    every expert-axis dispatch changes in one place."""
    if cfg.expert_map:
        return jax.lax.map
    return lambda f, xs: jax.vmap(lambda *a: f(a))(*xs)


def _eval_all_experts(
    params: Params, cfg: ContainerConfig, statics: ContainerStatics,
    pts: Array, dirs: Optional[Array],
):
    """Stacked-expert evaluation -> (rgb (K,N,3), sigma (K,N)).

    cfg.expert_map selects lax.map (serial per-expert programs, the
    single-chip fast path) vs vmap (kept for a sharded expert axis)."""
    apply_fn, density_fn = _expert_apply_fn(cfg)
    over = over_experts(cfg)
    if dirs is None:
        sigma = over(
            lambda pb: density_fn(pb[0], cfg.expert, pb[1], pts),
            (params["experts"], statics.expert_aabbs),
        )
        return None, sigma
    rgb, sigma = over(
        lambda pb: apply_fn(pb[0], cfg.expert, pb[1], pts, dirs),
        (params["experts"], statics.expert_aabbs),
    )
    return rgb, sigma


def _bucketed_eval(
    params: Params, cfg: ContainerConfig, statics: ContainerStatics,
    pts: Array, dirs: Optional[Array],
):
    """Top-E block-sparse expert dispatch -> (rgb (N,3) or None, sigma (N,)).

    Dense evaluation costs O(K*N) field evals; here each point is routed to
    its E nearest experts only, and the (point, expert) pairs are batched
    into per-expert fixed-capacity buckets so every expert still runs as ONE
    static-shape vmapped program on the MXU:

      1. top-E selection per point + margin weights renormalized over E
         (exact vs the dense blend when the margin support fits in E);
      2. counting-sort of pairs into (K, C) buckets via a one-hot cumsum —
         no argsort; C = ceil(N*E/K * capacity_factor), overflow pairs are
         routed to a trash slot (rare under spatial clustering: points near
         a centroid are exactly the points routed to it);
      3. one packed (pts|dirs) row gather per bucket, experts over (K, C)
         via lax.map (or vmap when the expert axis is mesh-sharded);
      4. weighted blend back to the N points as a reshape-sum over each
         point's E contiguous pair slots (no scatter-add).
    """
    apply_fn, density_fn = _expert_apply_fn(cfg)
    N, K = pts.shape[0], cfg.num_experts
    E = min(cfg.experts_per_point, K)
    C = int(math.ceil(N * E / K * cfg.capacity_factor))
    C = max(128, (C + 127) // 128 * 128)  # lane-aligned bucket rows

    dist = _routing_dist(statics, cfg, pts)  # (N, K)
    neg_d, idx = jax.lax.top_k(-dist, E)  # (N, E) nearest-first
    dsel = -neg_d
    if cfg.boundary_margin > 1.0:
        dsel = jnp.maximum(dsel, 1e-6)
        mind = dsel[:, :1]  # top-1 IS the global min distance
        mask = dsel <= cfg.boundary_margin * mind
        invd = (1.0 / dsel) * mask
        w = invd / jnp.maximum(jnp.sum(invd, axis=1, keepdims=True), 1e-6)
    else:
        w = jnp.zeros((N, E), pts.dtype).at[:, 0].set(1.0)

    k_flat = idx.reshape(-1)  # (N*E,)
    w_flat = w.reshape(-1).astype(jnp.float32)
    n_flat = jnp.repeat(jnp.arange(N, dtype=jnp.int32), E)

    onehot = jax.nn.one_hot(k_flat, K, dtype=jnp.int32)  # (N*E, K)
    # zero-weight pairs (hard routing always has E-1 of them per point,
    # soft routing its out-of-margin picks) are dropped by `keep` below —
    # mask them out of the counting sort so they don't consume bucket
    # capacity and push real-weight pairs into the trash slot early
    onehot = onehot * (w_flat > 0).astype(jnp.int32)[:, None]
    rank = jnp.cumsum(onehot, axis=0) - onehot  # exclusive per-expert rank
    slot = jnp.sum(rank * onehot, axis=1)  # (N*E,)
    keep = (slot < C) & (w_flat > 0)
    trash = K * C
    dest = jnp.where(keep, k_flat * C + slot, trash)

    def bucketed_branch(_):
        buf_idx = jnp.zeros(K * C + 1, jnp.int32).at[dest].set(n_flat)
        bucket_rows = buf_idx[:trash].reshape(K, C)

        over = over_experts(cfg)
        if dirs is None:
            pts_b = pts[bucket_rows]  # (K, C, 3)
            sigma_b = over(
                lambda pbx: density_fn(pbx[0], cfg.expert, pbx[1], pbx[2]),
                (params["experts"], statics.expert_aabbs, pts_b),
            )  # (K, C)
            rgb_flat = None
        else:
            # one 6-wide row gather instead of separate pts/dirs gathers —
            # gathers are transaction-rate bound, row width is free
            pd_b = jnp.concatenate([pts, dirs], axis=1)[bucket_rows]  # (K,C,6)
            rgb_b, sigma_b = over(
                lambda pbx: apply_fn(pbx[0], cfg.expert, pbx[1],
                                     pbx[2][:, 0:3], pbx[2][:, 3:6]),
                (params["experts"], statics.expert_aabbs, pd_b),
            )
            rgb_flat = jnp.concatenate(
                [rgb_b.reshape(-1, 3), jnp.zeros((1, 3), rgb_b.dtype)], axis=0
            )
        sigma_flat = jnp.concatenate(
            [sigma_b.reshape(-1), jnp.zeros((1,), sigma_b.dtype)], axis=0
        )

        # n_flat is repeat(arange(N), E): each point's E pair slots are
        # contiguous, so the blend is a reshape-sum — never a scatter-add
        # (duplicate-row scatter-adds serialize on TPU; CLAUDE.md)
        wk = jnp.where(keep, w_flat, 0.0)
        sigma = jnp.sum((wk * sigma_flat[dest]).reshape(N, E), axis=1)
        if rgb_flat is None:
            return sigma.astype(pts.dtype)
        rgb = jnp.sum(
            (wk[:, None] * rgb_flat[dest]).reshape(N, E, 3), axis=1
        )
        return rgb.astype(pts.dtype), sigma.astype(pts.dtype)

    if not cfg.bucket_overflow_dense:
        out = bucketed_branch(None)
        return (None, out) if dirs is None else out

    def dense_branch(_):
        rgb_k, sigma_k = _eval_all_experts(params, cfg, statics, pts, dirs)
        wd = routing_weights(statics, cfg, pts)  # (N, K)
        sigma = jnp.sum(wd.T * sigma_k, axis=0).astype(pts.dtype)
        if dirs is None:
            return sigma
        rgb = jnp.einsum("nk,knc->nc", wd, rgb_k).astype(pts.dtype)
        return rgb, sigma

    # overflow detection: per-expert demand vs capacity. Coherent point
    # sets route (almost) everything to one expert; dropping the overflow
    # is silently wrong, so take the exact dense blend instead. The dense
    # branch also restores the full margin support set (top-E truncation),
    # so an overflowing call is exact, not just less wrong.
    counts = jnp.sum(onehot, axis=0)  # (K,)
    overflow = jnp.any(counts > C)
    out = jax.lax.cond(overflow, dense_branch, bucketed_branch, None)
    return (None, out) if dirs is None else out


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
    if cfg.bucketed:
        return _bucketed_eval(params, cfg, statics, pts, None)[1]
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
    if cfg.bucketed:
        return _bucketed_eval(params, cfg, statics, pts, dirs)
    rgb_k, sigma_k = _eval_all_experts(params, cfg, statics, pts, dirs)
    w = routing_weights(statics, cfg, pts)  # (N, K)
    sigma = jnp.sum(w.T * sigma_k, axis=0)  # (N,)
    rgb = jnp.sum(w.T[..., None] * rgb_k, axis=0)  # (N, 3)
    return rgb, sigma


def container_apply_multidir(
    params: Params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    pts: Array,  # (N, 3)
    dirs_m: Array,  # (M, 3) shared direction set, NOT per-point
) -> Tuple[Array, Array]:
    """Routed field at N points under M shared view directions
    -> (rgb (M, N, 3), sigma (N,)).

    Position-heavy work amortized over directions: the xyz encoding (the
    gather-transaction wall, BASELINE.md), sigma trunk, geo head, and
    routing weights are all direction-independent, so they run ONCE; only
    the small color MLP sweeps the M directions. Equivalent to M
    container_apply calls (tests/test_baked.py pins the parity) at ~1/M of
    the encoder cost — the bake_field inner loop (256³ x 32 dirs measured
    1119 s on v5e through container_apply; the encoder dominated).

    Instant-NGP experts on the dense routing path take the fast split;
    anything else (vanilla/SIREN variants, bucketed dispatch) falls back
    to per-direction container_apply — correct, just not amortized.
    """
    n = pts.shape[0]
    if cfg.nerf_variant != "instant" or cfg.bucketed:
        def per_dir(d):
            dd = jnp.broadcast_to(d[None, :], (n, 3))
            return container_apply(params, cfg, statics, pts, dd)

        rgb_m, sigma_m = jax.lax.map(per_dir, dirs_m)
        return rgb_m, sigma_m[0]

    from nerfsys_tpu.models.ngp import ngp_color, ngp_density

    over = over_experts(cfg)

    def per_expert(pb):
        p_k, box = pb
        sigma, geo = ngp_density(p_k, cfg.expert, box, pts,
                                 return_feats=True)

        def per_dir(d):
            dd = jnp.broadcast_to(d[None, :], (n, 3))
            return ngp_color(p_k, cfg.expert, dd, geo)  # (N, 3)

        return jax.lax.map(per_dir, dirs_m), sigma  # (M,N,3), (N,)

    rgb_km, sigma_k = over(
        per_expert, (params["experts"], statics.expert_aabbs)
    )  # (K, M, N, 3), (K, N)
    w = routing_weights(statics, cfg, pts)  # (N, K)
    sigma = jnp.sum(w.T * sigma_k, axis=0)
    rgb = jnp.einsum("nk,kmnc->mnc", w, rgb_km)
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
