"""Occupancy orchestration + occupancy-accelerated MoE rendering.

Counterpart of the reference's occupancy plumbing spread across
MetaNGP (meta_ngp.py:244-443), MetaContainer (meta_container.py:386-454) and
render_rays_occ (ray_rendering.py:348-574). All experts' grids live in ONE
stacked pytree (K, L, R, R, R) so updates vmap across experts and the union
query is a single batched gather — no per-expert Python loops, no packed
samples, no segment-union merge (the dense two-pass sampler integrates over
the union field directly).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.models.container import (
    ContainerConfig,
    ContainerStatics,
    _expert_apply_fn,
    container_apply,
    container_bg_fn,
)
from nerfsys_tpu.ops.occupancy import (
    OccGridConfig,
    init_occ_state,
    mark_invisible_cells,
    occupancy_probe_cdf,
    query_binary,
    sample_tvals_from_cdf,
    update_occ_grid,
)
from nerfsys_tpu.ops.volrend import background_rgb, t_to_points, volume_render

Array = jax.Array


def expert_render_step_sizes(statics: ContainerStatics) -> Array:
    """(K,) default marching step: expert scene diagonal / 1000
    (meta_ngp.py:106-111)."""
    ext = statics.expert_aabbs[:, 1] - statics.expert_aabbs[:, 0]
    return jnp.linalg.norm(ext, axis=-1) / 1000.0


# --------------------------- union occupancy query ---------------------------
def union_binary_fn(occ_state: Dict, statics: ContainerStatics):
    """pts (M, 3) -> (M,) bool: occupied under ANY expert's grid."""

    def query(pts):
        def per_expert(binary_k, aabb_k):
            return query_binary(binary_k, aabb_k, pts)

        occ_k = jax.vmap(per_expert)(occ_state["binary"], statics.expert_aabbs)
        return jnp.any(occ_k, axis=0)

    return query


def expert_binary_fn(occ_state: Dict, statics: ContainerStatics, k: int):
    def query(pts):
        return query_binary(
            occ_state["binary"][k], statics.expert_aabbs[k], pts
        )

    return query


def union_value_fn(occ_state: Dict, statics: ContainerStatics):
    """pts (M, 3) -> (M,) max EMA density over experts (importance weights)."""
    from nerfsys_tpu.ops.occupancy import query_values

    def query(pts):
        def per_expert(occs_k, aabb_k):
            return query_values(occs_k, aabb_k, pts)

        vals = jax.vmap(per_expert)(occ_state["occs"], statics.expert_aabbs)
        return jnp.max(vals, axis=0)

    return query


def expert_value_fn(occ_state: Dict, statics: ContainerStatics, k: int):
    from nerfsys_tpu.ops.occupancy import query_values

    def query(pts):
        return query_values(occ_state["occs"][k], statics.expert_aabbs[k], pts)

    return query


def union_pair_fn(occ_state: Dict, statics: ContainerStatics):
    """pts (M, 3) -> (any-expert occ (M,), max EMA value (M,)) with ONE
    fused 2-wide row per point per expert (query_pair) — half the rows of
    separate binary + value importance probing."""
    from nerfsys_tpu.ops.occupancy import query_pair

    def query(pts):
        def per_expert(occs_k, binary_k, aabb_k):
            return query_pair(occs_k, binary_k, aabb_k, pts)

        occ_k, val_k = jax.vmap(per_expert)(
            occ_state["occs"], occ_state["binary"], statics.expert_aabbs
        )
        return jnp.any(occ_k, axis=0), jnp.max(val_k, axis=0)

    return query


def expert_pair_fn(occ_state: Dict, statics: ContainerStatics, k: int):
    from nerfsys_tpu.ops.occupancy import query_pair

    def query(pts):
        return query_pair(occ_state["occs"][k], occ_state["binary"][k],
                          statics.expert_aabbs[k], pts)

    return query


# --------------------------- updates ------------------------------------------
def premark_invisible_expert_cells(
    occ_state: Dict,
    statics: ContainerStatics,
    occ_cfg: OccGridConfig,
    c2ws: Array,  # (N, 3, 4)
    intrinsics: Array,  # (N, 4)
    wh: Array,  # (N, 2)
    near: float = 0.0,
) -> Dict:
    """Tag cells invisible from every training camera with -1
    (meta_container.py:396-444)."""

    def per_expert(aabb_k):
        return mark_invisible_cells(aabb_k, occ_cfg, c2ws, intrinsics, wh, near)

    occs = jax.vmap(per_expert)(statics.expert_aabbs)
    return {**occ_state, "occs": occs, "binary": jnp.zeros_like(occ_state["binary"])}


def make_occ_update_fn(cfg: ContainerConfig, occ_cfg: OccGridConfig):
    """Jitted: (occ_state, params, statics, step, key) -> occ_state.

    Runs the EMA update for every expert (vmapped) when
    step % update_interval == 0; identity otherwise — so it can be called
    unconditionally from the train loop (maybe_update_expert_occupancies).
    """
    _, density_fn = _expert_apply_fn(cfg)

    def do_update(occ_state, params, statics, step, key):
        steps = expert_render_step_sizes(statics)
        warmup = step < occ_cfg.warmup_steps
        keys = jax.random.split(key, cfg.num_experts)

        # occ_eval_fn = sigma * render_step_size (meta_ngp.py:373-380),
        # folded into the density closure per expert
        def per_expert(occs_k, binary_k, p_k, aabb_k, step_size, kk):
            state_k = {"occs": occs_k, "binary": binary_k}
            fn = lambda x: density_fn(p_k, cfg.expert, aabb_k, x) * step_size
            return update_occ_grid(state_k, aabb_k, fn, 1.0, occ_cfg, kk, warmup)

        from nerfsys_tpu.models.container import over_experts

        # field evals at cell centers: per-expert table gathers fall off
        # the fast path under vmap (see container.over_experts)
        out = over_experts(cfg)(
            lambda a: per_expert(*a),
            (occ_state["occs"], occ_state["binary"], params["experts"],
             statics.expert_aabbs, steps, keys),
        )
        return {
            **occ_state,  # preserve ready_after and any future aux fields
            "occs": out["occs"],
            "binary": out["binary"],
            "num_updates": occ_state["num_updates"] + 1,
        }

    def maybe_update(occ_state, params, statics, step, key):
        due = (step % occ_cfg.update_interval) == 0
        return jax.lax.cond(
            due,
            lambda: do_update(occ_state, params, statics, step, key),
            lambda: occ_state,
        )

    return jax.jit(maybe_update)


def occ_ready(occ_state: Dict, min_updates: int = 1) -> Array:
    """Grid usable for rendering once warmup-many updates have run AND any
    cell is occupied (reference occ_ready flag semantics; the warmup gate is
    ours — switching to a reduced sample budget on a half-trained grid costs
    ~2 dB early in training)."""
    thresh = occ_state.get("ready_after", jnp.asarray(min_updates, jnp.int32))
    return (occ_state["num_updates"] >= thresh) & jnp.any(
        occ_state["binary"]
    )


# --------------------------- union probe grid ---------------------------------
def build_union_probe_grid(
    occ_state: Dict,
    statics: ContainerStatics,
    res: int = 128,
    importance: bool = False,
    dilate: int = 1,
) -> Dict:
    """Resample the K experts' occupancy union into ONE single-level grid
    over the global aabb, for PROBING only.

    The MoE probe pass queries every expert's every level per probe point
    (K x L grid-row gathers; at K=4 L=2 P=128 that is 1024 transaction-
    bound rows per ray — comparable to the field eval itself). Probing one
    resampled grid instead costs 1 row per probe point.

    APPROXIMATION, stated honestly: sample placement coarsens, and so does
    the dead-ray gate — a ray whose occupied probes exist only under the
    exact union but not this grid is classed dead and renders to pure
    background (the hard sigma mask stays exact only for rays that remain
    alive). Marking samples each cell at its center AND its 8 corners and
    then dilates the marked set by `dilate` cells, so deletion requires
    occupied geometry more than `dilate` cells away from any marked
    lattice point — rare for EMA-trained grids, but possible for sub-cell
    slivers; keep res high relative to scene extent and A/B eval PSNR
    before trusting a new configuration.

    Returns {"binary": (1, res, res, res), "values": (..., or None),
    "aabb": (2, 3)} queried with query_binary/query_values against the
    returned aabb — the enclosing box of every expert's every LEVEL (the
    2^l-scaled halos extend beyond statics.global_aabb; resampling only the
    global box would misclassify rays whose occupied probes sit in a halo
    as dead), unioned with the global box.
    """
    from nerfsys_tpu.ops.occupancy import level_aabbs

    L = occ_state["binary"].shape[1]
    la = jax.vmap(lambda a: level_aabbs(a, L))(statics.expert_aabbs)
    lo = jnp.minimum(jnp.min(la[:, :, 0], axis=(0, 1)),
                     statics.global_aabb[0])
    hi = jnp.maximum(jnp.max(la[:, :, 1], axis=(0, 1)),
                     statics.global_aabb[1])
    aabb = jnp.stack([lo, hi])
    bin_fn = union_binary_fn(occ_state, statics)

    def grid_pts(n, offset_half):
        # corner lattice (n+1 per axis) or cell centers (n per axis)
        if offset_half:
            xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        else:
            xs = jnp.arange(n + 1, dtype=jnp.float32) / n
        gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
        rel = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        return aabb[0] + rel * (aabb[1] - aabb[0])

    def chunked(fn, pts):
        n_pts = pts.shape[0]
        chunk = min(131072, n_pts)
        pad = (-n_pts) % chunk
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        out = jax.lax.map(fn, pts.reshape(-1, chunk, 3))
        return out.reshape(-1)[:n_pts]

    occ_corner = chunked(bin_fn, grid_pts(res, False)).reshape(
        res + 1, res + 1, res + 1
    )
    occ_center = chunked(bin_fn, grid_pts(res, True)).reshape(res, res, res)
    c = occ_corner
    cell = (
        occ_center
        | c[:-1, :-1, :-1] | c[1:, :-1, :-1] | c[:-1, 1:, :-1]
        | c[:-1, :-1, 1:] | c[1:, 1:, :-1] | c[1:, :-1, 1:]
        | c[:-1, 1:, 1:] | c[1:, 1:, 1:]
    )
    for _ in range(max(int(dilate), 0)):
        p = jnp.pad(cell, 1)
        cell = jnp.zeros_like(cell)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    cell = cell | p[dx:dx + res, dy:dy + res, dz:dz + res]
    out = {"binary": cell[None], "values": None, "aabb": aabb}
    if importance:
        val_fn = union_value_fn(occ_state, statics)
        vals = chunked(val_fn, grid_pts(res, True)).reshape(res, res, res)
        out["values"] = vals[None]
    return out


def union_probe_fns(probe_grid: Dict):
    """(bin_fn, val_fn) querying a build_union_probe_grid result."""
    from nerfsys_tpu.ops.occupancy import query_values

    aabb = probe_grid["aabb"]

    def bin_fn(pts):
        return query_binary(probe_grid["binary"], aabb, pts)

    val_fn = None
    if probe_grid.get("values") is not None:
        def val_fn(pts):  # noqa: E306
            return query_values(probe_grid["values"], aabb, pts)

    return bin_fn, val_fn


# --------------------------- occupancy renderer -------------------------------
def _ray_validity(rays: Array) -> Tuple[Array, Array, Array]:
    """(valid, near_s, far_s) — shared by the probe/render/dead paths so all
    three see identical sanitized ray bounds."""
    near, far = rays[:, 6], rays[:, 7]
    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    return valid, jnp.where(valid, near, 0.0), jnp.where(valid, far, 1.0)


def _occ_query_fns(
    occ_state: Dict,
    statics: ContainerStatics,
    active_expert: Optional[int],
    importance: bool,
):
    if active_expert is not None:
        bin_fn = expert_binary_fn(occ_state, statics, active_expert)
        val_fn = (expert_value_fn(occ_state, statics, active_expert)
                  if importance else None)
    else:
        bin_fn = union_binary_fn(occ_state, statics)
        val_fn = union_value_fn(occ_state, statics) if importance else None
    return bin_fn, val_fn


def _occ_pair_fn(
    occ_state: Dict,
    statics: ContainerStatics,
    active_expert: Optional[int],
    importance: bool,
):
    """Fused (occ, value) probe for importance probing, else None."""
    if not importance:
        return None
    if active_expert is not None:
        return expert_pair_fn(occ_state, statics, active_expert)
    return union_pair_fn(occ_state, statics)


def probe_rays_occ(
    statics: ContainerStatics,
    occ_state: Dict,
    rays: Array,  # (N, 8)
    *,
    n_probes: int = 128,
    active_expert: Optional[int] = None,
    importance: bool = False,
    uniform_frac: float = 0.25,
    probe_fns=None,  # (bin_fn, val_fn) override, e.g. union_probe_fns
    ray_floor: float = 0.0,  # MUST match the consuming render's floor:
    # hard-mask renders use 0.0; a soft render (hard_mask=False) consuming
    # this cdf_state needs the same whole-ray floor it would build itself
) -> Tuple[Dict, Array]:
    """Wave-1 of chunked occupancy rendering: the probe/CDF pass alone.

    Returns (cdf_state, chunk_alive) where chunk_alive is a scalar bool —
    True iff ANY valid ray hit occupied space. A False chunk renders to
    exactly the background (render_rays_occ zeroes sigma on dead/invalid
    rays), so the caller can skip the field eval entirely for it
    (render_rays_occ_dead) and feed cdf_state to render_rays_occ for the
    alive ones — zero duplicated probe work, identical math."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    valid, near_s, far_s = _ray_validity(rays)
    if probe_fns is not None:
        bin_fn, val_fn = probe_fns
        pair_fn = None
    else:
        bin_fn, val_fn = _occ_query_fns(
            occ_state, statics, active_expert, importance
        )
        pair_fn = _occ_pair_fn(occ_state, statics, active_expert, importance)
    state = occupancy_probe_cdf(
        bin_fn, o, d, near_s, far_s, n_probes,
        weight_fn=val_fn, uniform_frac=uniform_frac, ray_floor=ray_floor,
        pair_fn=pair_fn,
    )
    # per-ray alive & valid, computed HERE so host-side dispatch (chunk
    # skipping / ray packing) shares the device's validity predicate
    # instead of re-implementing it in numpy
    state = {**state, "alive_valid": state["alive"] & valid}
    return state, jnp.any(state["alive_valid"])


def render_rays_occ_dead(
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    rays: Array,  # (N, 8)
    n_samples: int,
    *,
    n_probes: int = 128,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    sigma_scale: float = 1.0,
) -> Tuple[Array, Array, Array, Array]:
    """Exact render_rays_occ output for a chunk with NO alive ray — no grid
    probes, no field eval.

    A dead ray's probe weights are exactly 1e-12 everywhere (zero occupancy
    mass + the all-zero-cdf guard in occupancy_probe_cdf), its sigma is
    zeroed by the alive mask, and the composited color reduces to the
    background. This rebuilds that uniform CDF with the same float ops and
    runs the same sampler + compositor on zero rgb/sigma, so outputs match
    the full program bit-for-bit. Only background policies that do not read
    field colors qualify (white/black/none or the learned bg MLP) — callers
    gate on that (make_chunk_renderer)."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    n_rays = o.shape[0]
    valid, near_s, far_s = _ray_validity(rays)

    # dead-ray CDF from THE probe builder itself with a constant-False
    # occupancy (XLA folds the probe-point work away): structurally
    # identical float pipeline to the full program's dead rays, so the
    # bit-exactness contract can't drift if the weight math changes
    state = occupancy_probe_cdf(
        lambda pts: jnp.zeros(pts.shape[:-1], bool),
        o, d, near_s, far_s, n_probes,
    )
    t_vals, _ = sample_tvals_from_cdf(state, near_s, far_s, n_samples)

    rgb = jnp.zeros((n_rays, n_samples, 3), o.dtype)
    sigma = jnp.zeros((n_rays, n_samples), o.dtype)
    if use_bg_fn and cfg.use_bg_nerf and "bg" in params:
        bg = container_bg_fn(params, cfg)(d)
    else:
        bg = background_rgb(bg_policy, n_rays, dtype=rgb.dtype)
    rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
    return volume_render(rgb_sigma, t_vals, bg_rgb=bg, sigma_scale=sigma_scale)


def render_rays_occ(
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    occ_state: Dict,
    rays: Array,  # (N, 8)
    n_samples: int,
    key: Optional[jax.Array] = None,
    *,
    randomized: bool = False,
    n_probes: int = 128,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    active_expert: Optional[int] = None,
    sigma_scale: float = 1.0,
    importance: bool = False,
    uniform_frac: float = 0.25,
    cdf_state: Optional[Dict] = None,  # precomputed probe_rays_occ wave-1
    probe_fns=None,  # (bin_fn, val_fn) probe override (union_probe_fns);
    # the hard sigma mask below always uses the EXACT per-expert union
    hard_mask: bool = True,
    ray_floor: Optional[float] = None,  # soft mode: whole-ray pdf floor
    mask_from_probes: bool = False,  # interval-bit masking, no grid re-query
    field_expert: Optional[Array] = None,  # FIELD eval through this expert
    # only (may be TRACED), while probing/masking keep the active_expert
    # semantics (None = union) — the coherent-dispatch contract: identical
    # sample placement and sigma mask to the full program, 1/K field evals
) -> Tuple[Array, Array, Array, Array]:
    """Dense occupancy-guided MoE render (reference render_rays_occ,
    ray_rendering.py:348-558, without packed samples or segment unions).

    Samples concentrate inside the union of expert occupancy fields; with
    hard_mask, sigma is additionally zeroed outside the union at the final
    sample positions, so empty space contributes exactly zero regardless of
    probe aliasing. hard_mask=False is the SOFT mode matching soft-trained
    checkpoints (--occ_no_hard_mask): the grid only steers sample placement
    (with a whole-ray pdf floor keeping unmarked space reachable) and the
    field's density is never deleted — dead rays then still composite the
    field, so empty-chunk skipping does not apply.

    `cdf_state` skips the probe pass and samples from a CDF already computed
    by probe_rays_occ on the SAME rays/grid — the render-path analogue of the
    training loop's per-task probe hoist (meta_core.task_adapt).
    """
    o, d = rays[:, 0:3], rays[:, 3:6]
    n_rays = o.shape[0]
    valid, near_s, far_s = _ray_validity(rays)

    bin_fn, val_fn = _occ_query_fns(occ_state, statics, active_expert,
                                    importance)

    k_samp = k_bg = None
    if key is not None:
        k_samp, k_bg = jax.random.split(key)
    if ray_floor is None:
        # mirrors ops.occupancy.render_rays_occ_field: hard mode would zero
        # floor-placed samples anyway, soft mode needs them reachable
        ray_floor = 0.0 if hard_mask else 0.25
    if cdf_state is None:
        p_bin, p_val = (probe_fns if probe_fns is not None
                        else (bin_fn, val_fn))
        p_pair = (None if probe_fns is not None else
                  _occ_pair_fn(occ_state, statics, active_expert, importance))
        cdf_state = occupancy_probe_cdf(
            p_bin, o, d, near_s, far_s, n_probes,
            weight_fn=p_val, uniform_frac=uniform_frac,
            ray_floor=ray_floor, pair_fn=p_pair,
        )
    occ_bits = None
    if mask_from_probes and hard_mask:
        t_vals, alive, occ_bits = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples, key=k_samp,
            randomized=randomized, with_mask=True,
        )
    else:
        t_vals, alive = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples, key=k_samp,
            randomized=randomized,
        )
    pts = t_to_points(o, d, t_vals)  # (N, S, 3)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)

    flat_pts = pts.reshape(-1, 3)
    flat_dirs = dirs.reshape(-1, 3)
    rgb, sigma = container_apply(
        params, cfg, statics, flat_pts, flat_dirs,
        active_expert if field_expert is None else field_expert,
    )
    rgb = rgb.reshape(n_rays, n_samples, 3)
    sigma = sigma.reshape(n_rays, n_samples)

    if hard_mask:
        if occ_bits is not None:
            # interval-resolution masking: each sample inherits its probe
            # interval's occupancy bit — zero grid re-gathers, strictly
            # MORE conservative than point masking (a sample in an occupied
            # interval keeps its sigma). Under union probing the bit comes
            # from the resampled grid, a further coarsening.
            occ_mask = occ_bits
        else:
            # point-exact masking: one grid row per sample point per
            # expert per level
            occ_mask = bin_fn(flat_pts).reshape(n_rays, n_samples)
        keep = occ_mask & alive[:, None] & valid[:, None]
    else:
        # soft: the grid steered placement only; density is never deleted
        keep = valid[:, None] & jnp.ones_like(sigma, bool)
    sigma = jnp.where(keep, sigma, 0.0)

    bg = None
    if use_bg_fn and cfg.use_bg_nerf and "bg" in params:
        bg = container_bg_fn(params, cfg)(d)
    else:
        bg = background_rgb(
            bg_policy, n_rays, key=k_bg, last_sample_rgb=rgb[:, -1, :],
            dtype=rgb.dtype,
        )

    rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
    return volume_render(rgb_sigma, t_vals, bg_rgb=bg, sigma_scale=sigma_scale)


def occ_sample_positions(
    occ_state: Dict,
    statics,
    rays: Array,  # (N, 8)
    n_samples: int,
    *,
    active_expert: Optional[int] = None,
    importance: bool = False,
    hard_mask: bool = True,
    n_probes: int = 128,
    uniform_frac: float = 0.25,
    probe_fns=None,  # (bin_fn, val_fn) override (union_probe_fns) — MUST
    # match the render programs' probe_fns or placement diverges
) -> Tuple[Array, Array, Array]:
    """Deterministic occupancy sample positions -> (pts (N,S,3), t_vals,
    alive), WITHOUT evaluating the field.

    Exactly render_rays_occ's randomized=False placement (same probe fns,
    ray_floor policy, CDF sampler) — the coherent dispatcher probes the
    routing at these positions so its exactness contract holds under
    occupancy-guided sampling too (the single-expert program then re-runs
    the same union probe for placement and evaluates only its expert;
    runtime_adapt.make_coherent_renderer occ mode). The CDF comes from
    probe_rays_occ — ONE construction shared with the render path — so
    only the scalar defaults (n_probes/uniform_frac/ray_floor policy)
    must stay in lock-step with render_rays_occ; drift is pinned by
    tests/test_coherent.py's occ bit-exactness test."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    _, near_s, far_s = _ray_validity(rays)
    cdf_state, _ = probe_rays_occ(
        statics, occ_state, rays, n_probes=n_probes,
        active_expert=active_expert, importance=importance,
        uniform_frac=uniform_frac, probe_fns=probe_fns,
        ray_floor=0.0 if hard_mask else 0.25,  # render_rays_occ's policy
    )
    t_vals, alive = sample_tvals_from_cdf(
        cdf_state, near_s, far_s, n_samples, key=None, randomized=False,
    )
    return t_to_points(o, d, t_vals), t_vals, alive


# --------------------------- early ray termination ----------------------------
# The reference's occupancy renderer terminates rays whose transmittance has
# decayed below early_stop_eps (nerfacc OccGridEstimator.sampling,
# meta_ngp.py:430-443) — opaque rays stop paying for samples behind the first
# surface. A fixed-shape TPU program cannot skip work per ray, so the split
# is: a PARTIAL program composites the first seg_samples for every ray of the
# chunk and reports per-ray transmittance; the host compacts still-alive rays
# and a RESUME program finishes only those (pipelines/online/runtime_adapt
# early-stop dispatch). All sample positions come from ONE
# sample_tvals_from_cdf call whose full-sample step sizes (ops.volrend
# full_dists) are sliced per segment, so eps=0 reproduces render_rays_occ up
# to cumprod reassociation (tests/test_early_stop.py).


def _occ_keep_mask(bin_fn, pts_flat, occ_bits_seg, alive, valid, hard_mask,
                   n_rays, s):
    """The sigma keep-mask of render_rays_occ, for one sample segment."""
    if hard_mask:
        if occ_bits_seg is not None:
            occ_mask = occ_bits_seg
        else:
            occ_mask = bin_fn(pts_flat).reshape(n_rays, s)
        return occ_mask & alive[:, None] & valid[:, None]
    return jnp.broadcast_to(valid[:, None], (n_rays, s))


def render_rays_occ_et_partial(
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    occ_state: Dict,
    rays: Array,  # (N, 8)
    n_samples: int,
    *,
    seg_samples: int,
    n_probes: int = 128,
    bg_policy: str = "white",
    use_bg_fn: bool = True,
    active_expert: Optional[int] = None,
    sigma_scale: float = 1.0,
    importance: bool = False,
    uniform_frac: float = 0.25,
    cdf_state: Optional[Dict] = None,
    probe_fns=None,
    hard_mask: bool = True,
    ray_floor: Optional[float] = None,
    mask_from_probes: bool = False,
    early_stop_eps: float = 1e-4,
    fog: bool = False,
) -> Tuple[Tuple[Array, ...], Array, Dict]:
    """Wave A of early-stop occupancy rendering: first seg_samples samples.

    Returns (outputs, et_alive, resume_state):
      outputs — (rgb, depth, acc[, wmax, entropy]) finalized AS IF every ray
        terminated here (exact for rays whose remaining transmittance is
        below early_stop_eps, up to that eps);
      et_alive — (N,) bool: ray still needs the remaining samples;
      resume_state — device pytree render_rays_occ_et_resume consumes
        (per-ray carry, remaining t_vals/dists, masks, background).

    Background policies that read field colors ('last_sample') or need a key
    ('random') are not supported — the caller gates on that, same as the
    two-wave dead program."""
    if bg_policy in ("last_sample", "random"):
        raise ValueError(
            f"early-stop rendering does not support bg_policy={bg_policy!r}"
        )
    o, d = rays[:, 0:3], rays[:, 3:6]
    n_rays = o.shape[0]
    valid, near_s, far_s = _ray_validity(rays)
    bin_fn, val_fn = _occ_query_fns(occ_state, statics, active_expert,
                                    importance)
    if ray_floor is None:
        ray_floor = 0.0 if hard_mask else 0.25
    if cdf_state is None:
        p_bin, p_val = (probe_fns if probe_fns is not None
                        else (bin_fn, val_fn))
        p_pair = (None if probe_fns is not None else
                  _occ_pair_fn(occ_state, statics, active_expert, importance))
        cdf_state = occupancy_probe_cdf(
            p_bin, o, d, near_s, far_s, n_probes,
            weight_fn=p_val, uniform_frac=uniform_frac,
            ray_floor=ray_floor, pair_fn=p_pair,
        )
    occ_bits = None
    if mask_from_probes and hard_mask:
        t_vals, alive, occ_bits = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples, with_mask=True
        )
    else:
        t_vals, alive = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples
        )
    from nerfsys_tpu.ops.volrend import (
        composite_finalize,
        composite_init,
        composite_segment,
        full_dists,
    )

    dists = full_dists(t_vals)
    s1 = int(seg_samples)
    t_seg, d_seg = t_vals[:, :s1], dists[:, :s1]
    pts = t_to_points(o, d, t_seg)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    rgb, sigma = container_apply(
        params, cfg, statics, pts.reshape(-1, 3), dirs.reshape(-1, 3),
        active_expert,
    )
    rgb = rgb.reshape(n_rays, s1, 3)
    sigma = sigma.reshape(n_rays, s1)
    keep = _occ_keep_mask(
        bin_fn, pts.reshape(-1, 3),
        None if occ_bits is None else occ_bits[:, :s1],
        alive, valid, hard_mask, n_rays, s1,
    )
    sigma = jnp.maximum(jnp.where(keep, sigma, 0.0), 0.0)
    if sigma_scale != 1.0:
        sigma = sigma * float(sigma_scale)

    carry = composite_segment(
        composite_init(n_rays, t_vals.dtype, fog=fog),
        jnp.clip(rgb, 0.0, 1.0), sigma, t_seg, d_seg,
    )

    if use_bg_fn and cfg.use_bg_nerf and "bg" in params:
        bg = container_bg_fn(params, cfg)(d)
    else:
        bg = background_rgb(bg_policy, n_rays, dtype=rgb.dtype)

    outputs = composite_finalize(carry, bg)
    # a ray already fully masked by occupancy (hard mode) keeps trans == 1
    # but all its remaining sigma is zeroed too — its partial IS final
    needs_more = carry["trans"] > early_stop_eps
    if hard_mask:
        needs_more = needs_more & alive
    et_alive = needs_more & valid
    state = {
        "o": o,
        "d": d,
        "t_rest": t_vals[:, s1:],
        "d_rest": dists[:, s1:],
        "alive": alive,
        "valid": valid,
        "carry": carry,
        # absence encoded by a zero-length array: shapes are static under
        # tracing, unlike a bool leaf
        "bg": bg if bg is not None else jnp.zeros((0, 3)),
    }
    if occ_bits is not None:
        state["occ_rest"] = occ_bits[:, s1:]
    return outputs, et_alive, state


def render_rays_occ_et_resume(
    params,
    cfg: ContainerConfig,
    statics: ContainerStatics,
    occ_state: Dict,
    state: Dict,  # resume_state from render_rays_occ_et_partial (device)
    ids: Array,  # (cap,) int32 row indices into the partial chunk
    *,
    active_expert: Optional[int] = None,
    sigma_scale: float = 1.0,
    importance: bool = False,
    hard_mask: bool = True,
) -> Tuple[Array, ...]:
    """Wave B: finish the remaining samples for the gathered rays.

    Row `i` of every output corresponds to ids[i]; padded (duplicate) ids
    compute rows the dispatcher discards."""
    from nerfsys_tpu.ops.gather import row_gather
    from nerfsys_tpu.ops.volrend import composite_finalize, composite_segment

    def take(a):
        if a.ndim == 1:
            return row_gather(a[:, None], ids)[:, 0]
        if a.ndim == 2:
            return row_gather(a, ids)
        flat = row_gather(a.reshape(a.shape[0], -1), ids)
        return flat.reshape((ids.shape[0],) + a.shape[1:])

    o, d = take(state["o"]), take(state["d"])
    t_rest, d_rest = take(state["t_rest"]), take(state["d_rest"])
    alive, valid = take(state["alive"]), take(state["valid"])
    carry = jax.tree_util.tree_map(take, state["carry"])
    n_rays, s2 = t_rest.shape

    bin_fn, _ = _occ_query_fns(occ_state, statics, active_expert, importance)
    pts = t_to_points(o, d, t_rest)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    rgb, sigma = container_apply(
        params, cfg, statics, pts.reshape(-1, 3), dirs.reshape(-1, 3),
        active_expert,
    )
    rgb = rgb.reshape(n_rays, s2, 3)
    sigma = sigma.reshape(n_rays, s2)
    occ_rest = take(state["occ_rest"]) if "occ_rest" in state else None
    keep = _occ_keep_mask(bin_fn, pts.reshape(-1, 3), occ_rest, alive, valid,
                          hard_mask, n_rays, s2)
    sigma = jnp.maximum(jnp.where(keep, sigma, 0.0), 0.0)
    if sigma_scale != 1.0:
        sigma = sigma * float(sigma_scale)

    carry = composite_segment(carry, jnp.clip(rgb, 0.0, 1.0), sigma, t_rest,
                              d_rest)
    bg = take(state["bg"]) if state["bg"].shape[0] else None
    return composite_finalize(carry, bg)


def make_render_rays(
    cfg: ContainerConfig,
    *,
    ray_samples: int,
    bg_policy: str = "white",
    active_expert: Optional[int] = None,
    n_probes: int = 128,
    importance: bool = False,
):
    """render_rays dispatch (ray_rendering.py:564-574): occupancy path when
    the grid is ready, stratified warmup path otherwise — as one jittable
    function of (params, statics, occ_state, rays, key, use_occ)."""
    from nerfsys_tpu.models.container import container_field_fn
    from nerfsys_tpu.ops.volrend import render_rays_stratified

    def render(params, statics, occ_state, rays, key, randomized=False):
        def occ_path():
            return render_rays_occ(
                params, cfg, statics, occ_state, rays, ray_samples, key,
                randomized=randomized, n_probes=n_probes, bg_policy=bg_policy,
                active_expert=active_expert, importance=importance,
            )

        def strat_path():
            field = container_field_fn(params, cfg, statics, active_expert)
            return render_rays_stratified(
                field, rays, ray_samples, key, randomized=randomized,
                bg_policy=bg_policy, bg_fn=container_bg_fn(params, cfg),
            )

        return jax.lax.cond(occ_ready(occ_state), occ_path, strat_path)

    return render
