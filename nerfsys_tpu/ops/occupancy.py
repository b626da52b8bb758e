"""Multi-level occupancy grids with dense, static-shape TPU sampling.

TPU-native replacement for nerfacc's OccGridEstimator
(/root/reference/adaptive_nerf/models/inr/meta_ngp.py:126-443 and the CUDA
kernels behind it). nerfacc's ray marching emits variable-length packed
samples — hostile to XLA. The redesign keeps every shape static:

  - The grid itself is dense: occs (levels, R, R, R) float EMA values plus a
    derived binary field. Level l covers the roi AABB scaled by 2^l about its
    center (nerfacc multi-level convention).
  - EMA update = vmapped density eval at jittered cell centers:
    occ <- max(occ * decay, sigma * render_step_size), binary = occ >
    min(occ_thre, mean(occ)) — nerfacc's exact update rule.
  - Camera-visibility premark: project all cell centers into all cameras
    (one batched matmul); never-visible cells are tagged -1 and can never
    become occupied (mark_invisible_cells semantics, meta_ngp.py:283-353).
  - Marching is replaced by TWO-PASS IMPORTANCE SAMPLING with fixed sample
    counts: pass 1 probes P uniform points per ray against the binary grid;
    pass 2 places the S render samples by inverse-CDF over the occupied
    probe indicator. Rays hitting nothing keep zero weight. Empty space thus
    costs probe lookups (cheap gathers), not MLP evals — recovering
    nerfacc's speed win with a single compiled program.

Alpha-threshold annealing (meta_ngp.py:244-258) is reproduced for the update
schedule; sample-level alpha culling happens implicitly because unoccupied
probes get zero CDF mass.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.gather import row_gather

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    """Static occupancy-grid hyperparameters (reference occ_conf,
    nerf_runner.py:125-149)."""

    resolution: int = 128
    levels: int = 4
    ema_decay: float = 0.95
    occ_thre: float = 1e-2
    alpha_thre: float = 1e-2
    alpha_thre_start: float = 0.0
    alpha_thre_end: float = 1e-2
    cosine_anneal: bool = True
    warmup_steps: int = 256
    update_interval: int = 16
    cone_angle: float = 0.004
    # fraction of cells re-evaluated per update (nerfacc updates all during
    # warmup, a random half afterwards)
    sample_fraction: float = 0.5
    # conservative box dilation of the binary field (passes of 3^3 max-pool)
    # applied after each update: nerfacc's marching touches every occupied
    # cell a ray INTERSECTS, while our P-probe pass can step over thin
    # occupied cells (probe aliasing) and the hard sigma-zeroing then deletes
    # that geometry. One pass (~1 cell margin) is the conservative default
    # counterweight; 0 disables.
    dilate: int = 0


def init_occ_state(cfg: OccGridConfig, num_experts: int) -> dict:
    """Occupancy state pytree for K stacked experts.

    occs:   (K, L, R, R, R) float32 EMA densities; -1 marks invisible cells.
    binary: (K, L, R, R, R) bool occupancy field used by sampling.
    """
    R, L = cfg.resolution, cfg.levels
    shape = (num_experts, L, R, R, R)
    return {
        "occs": jnp.zeros(shape, jnp.float32),
        "binary": jnp.zeros(shape, jnp.bool_),
        "num_updates": jnp.zeros((), jnp.int32),
        # renderers switch to occupancy-guided sampling only after the grid
        # has seen a full warmup's worth of EMA updates: a half-trained grid
        # plus a reduced sample budget costs ~2 dB early in training
        "ready_after": jnp.asarray(
            max(1, cfg.warmup_steps // max(cfg.update_interval, 1)), jnp.int32
        ),
    }


def level_aabbs(aabb: Array, levels: int) -> Array:
    """(levels, 2, 3): level l = roi aabb scaled by 2^l about its center."""
    center = 0.5 * (aabb[0] + aabb[1])
    half = 0.5 * (aabb[1] - aabb[0])
    scales = 2.0 ** jnp.arange(levels, dtype=aabb.dtype)
    los = center - half * scales[:, None]
    his = center + half * scales[:, None]
    return jnp.stack([los, his], axis=1)


def cell_centers(aabb: Array, cfg: OccGridConfig) -> Array:
    """(L, R^3, 3) world-space cell centers for every level."""
    R = cfg.resolution
    idx = jnp.stack(
        jnp.meshgrid(*([jnp.arange(R)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (R^3, 3)
    frac = (idx.astype(jnp.float32) + 0.5) / R  # (R^3, 3) in (0,1)
    la = level_aabbs(aabb, cfg.levels)  # (L, 2, 3)
    return la[:, 0][:, None, :] + frac[None] * (la[:, 1] - la[:, 0])[:, None, :]


def anneal_alpha_thre(cfg: OccGridConfig, step) -> Array:
    """Cosine ramp of the alpha threshold over warmup (meta_ngp.py:244-258)."""
    if not cfg.cosine_anneal:
        return jnp.asarray(cfg.alpha_thre, jnp.float32)
    t = jnp.clip(step / max(cfg.warmup_steps, 1), 0.0, 1.0)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * t))
    return cfg.alpha_thre_start + w * (cfg.alpha_thre_end - cfg.alpha_thre_start)


# ------------------------------ queries --------------------------------------
def _finest_level_index(
    aabb: Array,  # (2, 3) roi
    L: int,
    R: int,
    pts: Array,  # (..., 3)
) -> Tuple[Array, Array]:
    """(decided (...,) bool, flat_idx (...,) int32 into the (L*R^3,) table).

    Level membership is pure arithmetic (levels are the roi scaled 2^l about
    its center), so the finest containing level can be SELECTED before
    touching the grid — one transaction-bound gather row per point instead
    of one per level. `flat_idx` addresses the deciding level's cell in the
    level-concatenated flat table; points outside all levels get level 0's
    clamped cell (callers mask via `decided`). Selection reproduces the
    per-level formula bit-for-bit: the deciding level's rel is the same
    float expression the L-gather layout evaluated.
    """
    la = level_aabbs(aabb, L)  # (L, 2, 3)
    inside = []
    rels = []
    for l in range(L):  # finest first (level 0 = innermost aabb)
        lo, hi = la[l, 0], la[l, 1]
        rel = (pts - lo) / (hi - lo)  # (..., 3)
        inside.append(jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1))
        rels.append(rel)
    decided = inside[0]
    level = jnp.zeros(pts.shape[:-1], jnp.int32)
    rel_sel = rels[0]
    for l in range(1, L):
        take = inside[l] & ~decided
        level = jnp.where(take, l, level)
        rel_sel = jnp.where(take[..., None], rels[l], rel_sel)
        decided = decided | inside[l]
    ijk = jnp.clip((rel_sel * R).astype(jnp.int32), 0, R - 1)
    flat_idx = ((level * R + ijk[..., 0]) * R + ijk[..., 1]) * R + ijk[..., 2]
    return decided, flat_idx


def query_binary(
    binary: Array,  # (L, R, R, R) one expert's field
    aabb: Array,  # (2, 3) roi
    pts: Array,  # (..., 3)
    levels: Optional[int] = None,
) -> Array:
    """Occupancy at world points: the FINEST level containing each point
    decides (nerfacc query convention). Points outside all levels -> False.

    Laid out TPU-first twice over: flat (M,) gathers (a small trailing axis
    lane-pads 32x — a 512MB index tensor became 16GB and OOM'd HBM), and ONE
    gather into the level-concatenated table instead of one per level
    (random gathers are transaction-rate bound; level selection is free
    arithmetic, so L gather rows per point were pure waste)."""
    L, R = binary.shape[0], binary.shape[1]
    decided, flat_idx = _finest_level_index(aabb, L, R, pts)
    occ = row_gather(binary.reshape(-1), flat_idx)
    return occ & decided


def query_values(
    occs: Array,  # (L, R, R, R) one expert's EMA density field
    aabb: Array,  # (2, 3) roi
    pts: Array,  # (..., 3)
) -> Array:
    """EMA occupancy VALUE (sigma * step, clamped >= 0) at world points from
    the finest containing level; 0 outside all levels. Same layout rules as
    query_binary (one gather row per point, level-concatenated table). This
    is the free importance signal for density-proportional sampling: no MLP
    evals, one row gather per point."""
    L, R = occs.shape[0], occs.shape[1]
    decided, flat_idx = _finest_level_index(aabb, L, R, pts)
    val = row_gather(occs.reshape(-1), flat_idx)
    val = jnp.where(decided, val, 0.0)
    return jnp.maximum(val, 0.0)  # -1 invisible tags -> 0


def query_pair(
    occs: Array,  # (L, R, R, R) EMA densities
    binary: Array,  # (L, R, R, R) bool field
    aabb: Array,  # (2, 3) roi
    pts: Array,  # (..., 3)
) -> Tuple[Array, Array]:
    """(occ (...,) bool, value (...,) >= 0) in ONE 2-wide row gather.

    Importance probing needs BOTH the binary bit and the EMA value at every
    probe point; fetched separately that is two transaction-bound rows per
    point. Transactions count rows, not bytes — fusing [binary, value] into
    one (L*R^3, 2) table halves the probe traffic. Exact: component 0
    reproduces query_binary, component 1 query_values (XLA hoists the fused
    table build out of scans; it is one elementwise pass over the grid)."""
    L, R = occs.shape[0], occs.shape[1]
    decided, flat_idx = _finest_level_index(aabb, L, R, pts)
    fused = jnp.stack(
        [binary.reshape(-1).astype(occs.dtype), occs.reshape(-1)], axis=-1
    )  # (L*R^3, 2)
    row = row_gather(fused, flat_idx)  # (..., 2)
    occ = (row[..., 0] > 0.5) & decided
    val = jnp.where(decided, row[..., 1], 0.0)
    return occ, jnp.maximum(val, 0.0)


def dilate_binary(binary: Array, passes: int = 1) -> Array:
    """(L, R, R, R) bool -> box-dilated by `passes` cells (edge-clamped).

    Sequential axis-wise 1-step dilation composes to the full 3^3 box per
    pass; padding with False keeps edges from wrapping."""
    b = binary
    for _ in range(passes):
        for ax in (1, 2, 3):
            pads = [(0, 0)] * b.ndim
            pads[ax] = (1, 1)
            p = jnp.pad(b, pads)
            n = b.shape[ax]
            fwd = jax.lax.slice_in_dim(p, 0, n, axis=ax)
            bwd = jax.lax.slice_in_dim(p, 2, n + 2, axis=ax)
            b = b | fwd | bwd
    return b


# ------------------------------ updates --------------------------------------
def update_occ_grid(
    occ_state_k: dict,  # one expert's {'occs', 'binary'} (L, R, R, R)
    aabb: Array,
    density_fn: Callable[[Array], Array],  # (M, 3) -> (M,) sigma
    render_step_size: float,
    cfg: OccGridConfig,
    key: jax.Array,
    warmup: Array,  # bool scalar: update all cells (True) or a random subset
) -> dict:
    """One EMA occupancy update for one expert (nerfacc update_every_n_steps
    inner body; meta_ngp.py:355-387 wiring).

    During warmup every cell is re-evaluated (nerfacc). After warmup only
    a sample_fraction subset is — and, unlike a post-hoc write mask, the
    FIELD is only evaluated at that subset (nerfacc's
    _sample_uniform_and_occupied_cells evaluates only sampled cells; a
    full-grid eval masked afterwards pays 1/sample_fraction x the field
    rows for the same update). Static shapes force a deliberate
    divergence from nerfacc's iid cell draw: the subset is a random-phase
    stride (ceil(1/fraction) interleaved lattices), which covers every
    cell once per 1/fraction updates — same refresh rate, bounded
    staleness, fixed shape."""
    R, L = cfg.resolution, cfg.levels
    occs = occ_state_k["occs"]  # (L, R, R, R)
    flat = occs.reshape(L, -1)
    n_cells = flat.shape[1]

    k1, k2 = jax.random.split(key)
    la = level_aabbs(aabb, L)
    cell_size = (la[:, 1] - la[:, 0]) / R  # (L, 3)

    def eval_new_vals(idx):  # (L, M) cell indices -> (L, M) sigma * step
        i = idx // (R * R)
        j = (idx // R) % R
        k = idx % R
        frac = (jnp.stack([i, j, k], axis=-1).astype(jnp.float32) + 0.5) / R
        centers = (la[:, 0][:, None, :]
                   + frac * (la[:, 1] - la[:, 0])[:, None, :])  # (L, M, 3)
        # jitter inside the cell (nerfacc samples uniformly within cells)
        jitter = (jax.random.uniform(k1, centers.shape) - 0.5) \
            * cell_size[:, None, :]
        pts = centers + jitter
        # Chunked density eval: L*R^3 cells (8.4M at defaults) in one
        # vmapped call would materialize tens of GB of encode
        # intermediates; lax.map keeps the live set to one chunk.
        flat_pts = pts.reshape(-1, 3)
        n_pts = flat_pts.shape[0]
        chunk = min(131072, n_pts)
        pad = (-n_pts) % chunk
        if pad:
            flat_pts = jnp.concatenate(
                [flat_pts, jnp.zeros((pad, 3), flat_pts.dtype)], axis=0
            )
        sigma = jax.lax.map(density_fn, flat_pts.reshape(-1, chunk, 3))
        return sigma.reshape(-1)[:n_pts].reshape(L, -1) * render_step_size

    invisible = flat < 0.0  # premarked cells stay -1 forever

    def full_update():
        idx = jnp.broadcast_to(jnp.arange(n_cells), (L, n_cells))
        new_val = eval_new_vals(idx)
        ema = jnp.maximum(flat * cfg.ema_decay, new_val)
        return jnp.where(~invisible, ema, flat)

    def subset_update():
        import math

        m = max(1, math.ceil(1.0 / max(cfg.sample_fraction, 1e-6) - 1e-9))
        # ceil so the lattice REACHES the last cells when m does not divide
        # n_cells; overshoot wraps to the front (distinct residue class ->
        # still unique within a call, every cell covered across phases)
        n_sub = max(1, -(-n_cells // m))
        phase = jax.random.randint(k2, (), 0, m)
        idx1 = (jnp.arange(n_sub) * m + phase) % n_cells  # unique
        idx = jnp.broadcast_to(idx1, (L, n_sub))
        new_val = eval_new_vals(idx)
        cur = jnp.take_along_axis(flat, idx, axis=1)  # (L, n_sub)
        upd = jnp.where(cur < 0.0, cur,
                        jnp.maximum(cur * cfg.ema_decay, new_val))
        # one flat 1-D scatter-set (unique rows; vmapped scatters fall off
        # the TPU fast path)
        gidx = (jnp.arange(L) * n_cells)[:, None] + idx
        return flat.reshape(-1).at[gidx.reshape(-1)].set(
            upd.reshape(-1), unique_indices=True
        ).reshape(L, n_cells)

    updated = jax.lax.cond(warmup, full_update, subset_update)

    # binary = occ > min(occ_thre, mean of non-negative occs)
    visible_vals = jnp.where(invisible, 0.0, updated)
    mean_occ = visible_vals.sum() / jnp.maximum((~invisible).sum(), 1)
    thre = jnp.minimum(cfg.occ_thre, mean_occ)
    binary = (updated > thre) & ~invisible
    if cfg.dilate > 0:
        binary = dilate_binary(binary.reshape(occs.shape), cfg.dilate)
        binary = binary.reshape(L, -1)

    return {
        "occs": updated.reshape(occs.shape),
        "binary": binary.reshape(occs.shape),
    }


def mark_invisible_cells(
    aabb: Array,
    cfg: OccGridConfig,
    c2ws: Array,  # (N, 3, 4) camera-to-world, RUB camera frame
    intrinsics: Array,  # (N, 4) fx fy cx cy
    wh: Array,  # (N, 2) W, H
    near: float = 0.0,
) -> Array:
    """occs init with -1 for cells seen by NO camera (meta_ngp.py:283-353).

    A cell center is visible from a camera if it projects inside the image
    and lies in front of it. One batched matmul over (L*R^3) x N cameras.
    Returns occs (L, R, R, R) of {0.0, -1.0}.
    """
    centers = cell_centers(aabb, cfg)  # (L, R^3, 3)
    L = cfg.levels
    pts = centers.reshape(-1, 3)  # (M, 3)

    R_w2c = jnp.swapaxes(c2ws[:, :3, :3], 1, 2)  # (N, 3, 3) world->cam
    t = c2ws[:, :3, 3]  # (N, 3)
    fx, fy, cx, cy = (
        intrinsics[:, 0:1], intrinsics[:, 1:2], intrinsics[:, 2:3],
        intrinsics[:, 3:4],
    )
    W, H = wh[:, 0:1], wh[:, 1:2]

    def visible_chunk(p):  # (C, 3) -> (C,) bool
        rel = p[None, :, :] - t[:, None, :]  # (N, C, 3)
        cam = jnp.einsum("nij,ncj->nci", R_w2c, rel)  # RUB frame
        z = -cam[..., 2]  # RUB: forward is -z
        in_front = z > near
        x = cam[..., 0] / jnp.maximum(z, 1e-8)
        y = cam[..., 1] / jnp.maximum(z, 1e-8)
        u = fx * x + cx
        v = -fy * y + cy  # image v grows downward; camera y is up
        in_img = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        return jnp.any(in_front & in_img, axis=0)

    # chunk over cells: (N_cams, L*R^3, 3) at once is GBs of HBM
    n_pts = pts.shape[0]
    chunk = min(131072, n_pts)
    pad = (-n_pts) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
    visible = jax.lax.map(visible_chunk, pts.reshape(-1, chunk, 3))
    visible = visible.reshape(-1)[:n_pts]
    occs = jnp.where(visible, 0.0, -1.0)
    return occs.reshape(L, cfg.resolution, cfg.resolution, cfg.resolution)


# ------------------------------ sampling --------------------------------------
def occupancy_probe_cdf(
    binary_any: Callable[[Array], Array],
    rays_o: Array,  # (N, 3)
    rays_d: Array,  # (N, 3)
    near: Array,  # (N,)
    far: Array,  # (N,)
    n_probes: int = 128,
    weight_fn: Optional[Callable[[Array], Array]] = None,
    uniform_frac: float = 0.25,
    ray_floor: float = 0.0,
    pair_fn: Optional[Callable[[Array], Tuple[Array, Array]]] = None,
) -> dict:
    """Pass 1 of occupancy sampling: probe the grid along each ray and build
    the per-ray inverse-CDF state {cdf (N, P+1), alive (N,)}.

    `pair_fn` (pts -> (occ bool, value)) replaces the separate
    binary_any/weight_fn probes with ONE fused 2-wide gather per point
    (query_pair) — half the transaction rows of importance probing.
    binary_any is ignored when it is given.

    `uniform_frac` mixes uniform-over-OCCUPIED-probes into the importance
    pdf (keeps every marked cell reachable). `ray_floor` additionally mixes
    uniform-over-the-WHOLE-ray mass, so UNMARKED space stays reachable —
    required by the soft (no-hard-mask) mode, where the grid only steers
    placement and field density outside the grid must still receive samples
    (and gradient) to be correctable.

    Split out so callers with FIXED rays and a FIXED grid (the meta inner
    loop: support rays are constant across all inner iterations) can probe
    ONCE per task and draw fresh randomized samples every iteration — the
    probe pass is the dominant cost of occupancy sampling at small ray
    counts (P probes x levels x experts of grid gathers per ray).
    """
    N, P = rays_o.shape[0], n_probes
    edges = jnp.linspace(0.0, 1.0, P + 1, dtype=rays_o.dtype)
    mids = 0.5 * (edges[:-1] + edges[1:])  # (P,)
    t_probe = near[:, None] + (far - near)[:, None] * mids[None, :]  # (N, P)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_probe[..., None]
    val = None
    if pair_fn is not None:
        occ, val = pair_fn(pts.reshape(-1, 3))
        occ = occ.reshape(N, P)
        val = val.reshape(N, P)
    else:
        occ = binary_any(pts.reshape(-1, 3)).reshape(N, P)  # (N, P) bool

    alive = jnp.any(occ, axis=1)
    occf = occ.astype(rays_o.dtype)
    if weight_fn is not None and val is None:
        val = weight_fn(pts.reshape(-1, 3)).reshape(N, P)
    if val is not None:
        val = jnp.maximum(val, 0.0).astype(rays_o.dtype) * occf
        # normalize both components per ray, then mix: a uniform_frac floor
        # keeps every occupied probe reachable even where the EMA is tiny
        vsum = jnp.sum(val, axis=1, keepdims=True)
        osum = jnp.maximum(jnp.sum(occf, axis=1, keepdims=True), 1e-12)
        uni = occf / osum
        imp = jnp.where(vsum > 1e-12, val / jnp.maximum(vsum, 1e-12), uni)
        w = (1.0 - uniform_frac) * imp + uniform_frac * uni
    else:
        w = occf
    if ray_floor > 0.0:
        wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        w = (1.0 - ray_floor) * (w / wsum) + ray_floor / P
    w = w + 1e-12  # avoid all-zero cdf
    cdf = jnp.cumsum(w, axis=1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=1)
    # probe occupancy kept for interval-resolution sample masking
    # (mask_from_probes): samples inherit their probe interval's bit, so
    # the hard sigma-zeroing needs NO per-sample grid re-query
    return {"cdf": cdf, "alive": alive, "occ": occ}


def sample_tvals_from_cdf(
    cdf_state: dict,
    near: Array,
    far: Array,
    n_samples: int,
    key: Optional[jax.Array] = None,
    randomized: bool = False,
    with_mask: bool = False,
) -> Tuple[Array, ...]:
    """Pass 2: place S samples by inverse-CDF over the probe intervals.

    with_mask=True additionally returns each sample's probe-interval
    occupancy bit (N, S) — the grid-gather-free alternative to re-querying
    the binary field at every sample point (interval-resolution masking is
    strictly more conservative than point masking: a sample inside an
    occupied probe interval keeps its sigma)."""
    cdf, alive = cdf_state["cdf"], cdf_state["alive"]
    N, P = cdf.shape[0], cdf.shape[1] - 1
    dtype = cdf.dtype
    edges = jnp.linspace(0.0, 1.0, P + 1, dtype=dtype)

    u = (jnp.arange(n_samples, dtype=dtype) + 0.5) / n_samples
    u = jnp.broadcast_to(u, (N, n_samples))
    if randomized:
        if key is None:
            raise ValueError("randomized occupancy sampling requires a key")
        jit = (jax.random.uniform(key, (N, n_samples)) - 0.5) / n_samples
        u = jnp.clip(u + jit, 0.0, 1.0 - 1e-6)

    # inverse CDF: interval index via batched comparison-sum (searchsorted
    # has no batch axis), then linear interp inside the interval
    idx = jnp.sum(cdf[:, None, 1:] <= u[:, :, None], axis=-1)
    idx = jnp.clip(idx, 0, P - 1)

    cdf_lo = jnp.take_along_axis(cdf, idx, axis=1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, axis=1)
    frac = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-12)
    e_lo = jnp.take_along_axis(jnp.broadcast_to(edges[None, :-1], (N, P)), idx, 1)
    width = (edges[1] - edges[0])
    s = e_lo + frac * width  # normalized position in [0,1)
    t_vals = near[:, None] + (far - near)[:, None] * s
    if not with_mask:
        return jnp.sort(t_vals, axis=1), alive
    order = jnp.argsort(t_vals, axis=1)
    t_vals = jnp.take_along_axis(t_vals, order, axis=1)
    occ = cdf_state["occ"]
    mask = jnp.take_along_axis(occ, jnp.take_along_axis(idx, order, axis=1),
                               axis=1)
    return t_vals, alive, mask


def occupancy_sample_tvals(
    binary_any: Callable[[Array], Array],  # (..., 3) -> (...,) bool union-occ
    rays_o: Array,  # (N, 3)
    rays_d: Array,  # (N, 3)
    near: Array,  # (N,)
    far: Array,  # (N,)
    n_samples: int,
    n_probes: int = 128,
    key: Optional[jax.Array] = None,
    randomized: bool = False,
    weight_fn: Optional[Callable[[Array], Array]] = None,
    uniform_frac: float = 0.25,
) -> Tuple[Array, Array]:
    """Two-pass occupancy-guided sampling with static shapes.

    Pass 1: probe P uniform points per ray, query the (union) binary field.
    Pass 2: distribute S samples by inverse-CDF over the occupied-probe
    indicator (piecewise-constant pdf over probe intervals).

    With weight_fn ((..., 3) -> (...,) nonneg, typically the grid's EMA
    density via query_values), the pdf inside the occupied region becomes
    density-proportional IMPORTANCE sampling mixed with a uniform_frac
    uniform floor — samples concentrate near surfaces at no extra MLP cost
    (the quadrature stays exact: volume_render uses the actual t deltas).

    Returns (t_vals (N, S), ray_alive (N,) bool). Rays with zero occupied
    probes get uniform t_vals and ray_alive=False (callers zero their sigma).
    """
    state = occupancy_probe_cdf(
        binary_any, rays_o, rays_d, near, far, n_probes,
        weight_fn=weight_fn, uniform_frac=uniform_frac,
    )
    return sample_tvals_from_cdf(
        state, near, far, n_samples, key=key, randomized=randomized
    )


def render_rays_occ_field(
    field_fn,  # (pts (M,3), dirs (M,3)) -> (rgb (M,3), sigma (M,))
    binary_fn,  # (pts (M,3)) -> (M,) bool occupancy
    rays,  # (N, 8)
    n_samples: int,
    key=None,
    *,
    randomized: bool = False,
    n_probes: int = 128,
    bg_policy: str = "white",
    bg_fn=None,
    sigma_scale: float = 1.0,
    value_fn=None,  # (pts (M,3)) -> (M,) EMA density: importance sampling
    uniform_frac: float = 0.25,
    cdf_state=None,  # precomputed occupancy_probe_cdf (fixed rays + grid)
    mask_from_probes: bool = False,  # interval-bit masking, no grid re-query
    hard_mask: bool = True,  # False: pure importance sampling, no zeroing
    ray_floor=None,  # whole-ray uniform pdf floor; default 0.25 when soft
    pair_fn=None,  # fused (occ, value) probe: one 2-wide row per point
):
    """Occupancy-guided dense render of ONE field (no MoE routing).

    The single-expert analogue of models.occupancy.render_rays_occ — used by
    the meta inner loop, which always trains the active expert in isolation
    (reference render path via occupancy_marching, meta_ngp.py:389-443).
    Samples concentrate in occupied space; sigma is hard-zeroed outside the
    occupancy field so empty space contributes exactly zero.
    """
    from nerfsys_tpu.ops.volrend import (
        background_rgb,
        t_to_points,
        volume_render,
    )

    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n_rays = o.shape[0]

    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    near_s = jnp.where(valid, near, 0.0)
    far_s = jnp.where(valid, far, 1.0)

    k_samp = k_bg = None
    if key is not None:
        k_samp, k_bg = jax.random.split(key)
    if ray_floor is None:
        # soft mode needs unmarked space reachable; hard mode would zero
        # those samples anyway, so a floor would only waste them
        ray_floor = 0.0 if hard_mask else 0.25
    if cdf_state is None:
        cdf_state = occupancy_probe_cdf(
            binary_fn, o, d, near_s, far_s, n_probes,
            weight_fn=value_fn, uniform_frac=uniform_frac,
            ray_floor=ray_floor, pair_fn=pair_fn,
        )
    if mask_from_probes and hard_mask:
        t_vals, alive, occ_mask = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples, key=k_samp,
            randomized=randomized, with_mask=True,
        )
    else:
        t_vals, alive = sample_tvals_from_cdf(
            cdf_state, near_s, far_s, n_samples, key=k_samp,
            randomized=randomized,
        )
    pts = t_to_points(o, d, t_vals)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)

    flat_pts = pts.reshape(-1, 3)
    rgb, sigma = field_fn(flat_pts, dirs.reshape(-1, 3))
    rgb = rgb.reshape(n_rays, n_samples, 3)
    sigma = sigma.reshape(n_rays, n_samples)
    if hard_mask:
        if not mask_from_probes:
            # point-exact masking: one binary-grid gather per sample point
            occ_mask = binary_fn(flat_pts).reshape(n_rays, n_samples)
        keep = occ_mask & alive[:, None] & valid[:, None]
    else:
        # pure importance sampling: the grid only steers sample PLACEMENT;
        # density is never deleted, so grid imperfections (probe aliasing,
        # stale cells) cannot erase geometry — only waste a few samples
        keep = valid[:, None] & jnp.ones_like(sigma, bool)
    sigma = jnp.where(keep, sigma, 0.0)

    if bg_fn is not None:
        bg = bg_fn(d)
    else:
        bg = background_rgb(
            bg_policy, n_rays, key=k_bg, last_sample_rgb=rgb[:, -1, :],
            dtype=rgb.dtype,
        )
    rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
    return volume_render(rgb_sigma, t_vals, bg_rgb=bg, sigma_scale=sigma_scale)
