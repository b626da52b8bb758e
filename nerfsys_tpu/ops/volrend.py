"""Dense volume rendering core, TPU-first.

JAX counterpart of /root/reference/adaptive_nerf/nerfs/ray_rendering.py's math
(volume_render at :114-165, stratified_t_vals at :262-287), redesigned around
fixed shapes: every ray carries exactly S samples laid out as (N, S) so the
whole pipeline is one fused XLA program (no packed/CSR sample lists like
nerfacc). Empty space is handled by masking sample contributions (sigma = 0
where masked), which XLA folds into the same fused elementwise pass.

All functions are pure and differentiable; the compositing uses exclusive
cumprod transmittance exactly as the reference dense spec does.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.activations import trunc_exp

Array = jax.Array


# --------------------------- sampling ---------------------------------------
def stratified_t_vals(
    key: Optional[jax.Array],
    near: Array,  # (N,)
    far: Array,  # (N,)
    ray_samples: int,
    randomized: bool = True,
) -> Array:
    """Uniformly place S samples per ray in [near, far], with optional
    stratified jitter (training). Mirrors reference ray_rendering.py:262-287.

    Returns t_vals (N, S).
    """
    t_lin = jnp.linspace(0.0, 1.0, ray_samples, dtype=near.dtype)[None, :]
    t_vals = near[:, None] * (1.0 - t_lin) + far[:, None] * t_lin
    if randomized:
        if key is None:
            raise ValueError("randomized sampling requires a PRNG key")
        mids = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
        low = jnp.concatenate([t_vals[:, :1], mids], axis=1)
        high = jnp.concatenate([mids, t_vals[:, -1:]], axis=1)
        u = jax.random.uniform(key, t_vals.shape, dtype=t_vals.dtype)
        t_vals = low + (high - low) * u
    return t_vals


def t_to_points(rays_o: Array, rays_d: Array, t_vals: Array) -> Array:
    """(N,3),(N,3),(N,S) -> sample positions (N,S,3)."""
    return rays_o[:, None, :] + rays_d[:, None, :] * t_vals[..., None]


# --------------------------- compositing ------------------------------------
def render_weights(
    sigma: Array,  # (N, S) nonnegative densities
    t_vals: Array,  # (N, S)
    *,
    dists: Optional[Array] = None,  # (N, S) override per-sample step sizes
) -> Tuple[Array, Array, Array]:
    """Alpha/transmittance weights from densities.

    Returns (weights, alpha, trans) each (N, S). Matches the reference dense
    spec: dists clamped to >= 1e-4 with the last interval repeated; alpha
    clamped to [0, 1 - 1e-7]; T = exclusive cumprod of (1 - alpha + 1e-10).
    """
    if dists is None:
        d = jnp.maximum(t_vals[:, 1:] - t_vals[:, :-1], 1e-4)
        dists = jnp.concatenate([d, d[:, -1:]], axis=1)
    alpha = jnp.clip(1.0 - jnp.exp(-sigma * dists), 0.0, 1.0 - 1e-7)
    one_m = 1.0 - alpha + 1e-10
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), one_m], axis=1), axis=1
    )[:, :-1]
    weights = alpha * trans
    return weights, alpha, trans


def volume_render(
    rgb_sigma: Array,  # (N, S, 4): [rgb in 0..1, sigma >= 0] unless raw_*
    t_vals: Array,  # (N, S)
    bg_rgb: Optional[Array] = None,  # (N, 3) or None
    *,
    raw_rgb: bool = False,
    raw_sigma: bool = False,
    sigma_scale: float = 1.0,
    dists: Optional[Array] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Standard NeRF compositing over dense (N, S) samples.

    Returns (rgb_map (N,3), depth_map (N,), weights (N,S), acc_map (N,)).
    Spec: reference ray_rendering.py:114-165.
    """
    rgb_raw = rgb_sigma[..., :3]
    sigma_in = rgb_sigma[..., 3]

    rgb = jax.nn.sigmoid(rgb_raw) if raw_rgb else jnp.clip(rgb_raw, 0.0, 1.0)
    sigma = trunc_exp(sigma_in) if raw_sigma else jnp.maximum(sigma_in, 0.0)
    if sigma_scale != 1.0:
        sigma = sigma * float(sigma_scale)

    weights, _, _ = render_weights(sigma, t_vals, dists=dists)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_map = jnp.sum(weights * t_vals, axis=1)
    acc_map = jnp.sum(weights, axis=1)

    if bg_rgb is not None:
        rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bg_rgb.astype(rgb_map.dtype)

    return rgb_map, depth_map, weights, acc_map


# --------------------------- segmented compositing --------------------------
# Early-ray-termination support: volume_render factored so samples can be
# composited in ray-direction segments with a carried transmittance. The
# reference's occupancy renderer inherits this from nerfacc (early_stop_eps
# in OccGridEstimator.sampling, meta_ngp.py:430-443): rays stop paying for
# samples once transmittance is negligible. On TPU the analogous win needs
# host-side compaction (a fixed-shape program still issues gathers for dead
# rays), so the split lives at the chunk-renderer level (see
# pipelines/online/runtime_adapt.make_chunk_renderer early_stop_eps); this
# module only provides the exact segment math.
#
# Factorization: with T_carry = prod over all earlier segments of
# (1 - alpha + 1e-10), the weights of segment samples are
# alpha * T_carry * exclusive_cumprod_within_segment — identical products in
# the same left-to-right order as the one-shot cumprod up to XLA's scan
# reassociation (tests pin allclose, not bit equality).


def composite_init(n_rays: int, dtype=jnp.float32, fog: bool = False) -> dict:
    """Fresh per-ray compositing carry.

    fog=True additionally carries sufficient statistics for the video
    path's haze signals (wmax and weight entropy): entropy over the full
    sample set decomposes as -(sum w*log w)/W + log W with W = sum w, both
    plain sums over segments."""
    carry = {
        "rgb": jnp.zeros((n_rays, 3), dtype),
        "depth": jnp.zeros((n_rays,), dtype),
        "acc": jnp.zeros((n_rays,), dtype),
        "trans": jnp.ones((n_rays,), dtype),
    }
    if fog:
        carry["wmax"] = jnp.zeros((n_rays,), dtype)
        carry["wlogw"] = jnp.zeros((n_rays,), dtype)
    return carry


def composite_segment(
    carry: dict,
    rgb: Array,  # (N, s, 3) in [0, 1]
    sigma: Array,  # (N, s) >= 0 (already masked/scaled by the caller)
    t_seg: Array,  # (N, s) this segment's sample positions
    dists_seg: Array,  # (N, s) this segment's step sizes (from the FULL
    # t_vals' consecutive diffs — NOT recomputed per segment, or the
    # segment-boundary interval would repeat instead of spanning)
) -> dict:
    """Composite one sample segment into the carry (volume_render math)."""
    alpha = jnp.clip(1.0 - jnp.exp(-sigma * dists_seg), 0.0, 1.0 - 1e-7)
    one_m = 1.0 - alpha + 1e-10
    trans_local = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), one_m], axis=1), axis=1
    )[:, :-1]
    w = alpha * trans_local * carry["trans"][:, None]
    out = {
        "rgb": carry["rgb"] + jnp.sum(w[..., None] * rgb, axis=1),
        "depth": carry["depth"] + jnp.sum(w * t_seg, axis=1),
        "acc": carry["acc"] + jnp.sum(w, axis=1),
        "trans": carry["trans"] * jnp.prod(one_m, axis=1),
    }
    if "wmax" in carry:
        out["wmax"] = jnp.maximum(carry["wmax"], jnp.max(w, axis=1))
        out["wlogw"] = carry["wlogw"] + jnp.sum(
            w * jnp.log(jnp.maximum(w, 1e-12)), axis=1
        )
    return out


def composite_finalize(
    carry: dict, bg_rgb: Optional[Array]
) -> Tuple[Array, ...]:
    """(rgb_map, depth_map, acc_map[, wmax, entropy]) from a carry.

    Matches volume_render's background blend; for a ray terminated early the
    dropped tail radiance and the bg-weight difference are both bounded by
    the carried transmittance (the early-stop eps)."""
    rgb_map = carry["rgb"]
    if bg_rgb is not None:
        rgb_map = rgb_map + (1.0 - carry["acc"][..., None]) * bg_rgb.astype(
            rgb_map.dtype
        )
    if "wmax" not in carry:
        return rgb_map, carry["depth"], carry["acc"]
    # entropy of p = w / W: -(sum w log w)/W + log W (W = acc); a ray with
    # (near-)zero accumulated weight has no weight distribution — report 0
    # like _fog_stats does (its p = w / max(W, 1e-12) collapses to zeros)
    wsum = jnp.maximum(carry["acc"], 1e-12)
    entropy = -carry["wlogw"] / wsum + jnp.log(wsum)
    entropy = jnp.where(carry["acc"] > 1e-9, entropy, 0.0)
    return rgb_map, carry["depth"], carry["acc"], carry["wmax"], entropy


def full_dists(t_vals: Array) -> Array:
    """The (N, S) per-sample step sizes volume_render derives from t_vals
    (consecutive diffs clamped >= 1e-4, last repeated) — computed ONCE over
    the full sample set so segment slices see the true boundary intervals."""
    d = jnp.maximum(t_vals[:, 1:] - t_vals[:, :-1], 1e-4)
    return jnp.concatenate([d, d[:, -1:]], axis=1)


# --------------------------- background policies ----------------------------
def background_rgb(
    policy: str,
    n_rays: int,
    key: Optional[jax.Array] = None,
    last_sample_rgb: Optional[Array] = None,  # (N, 3)
    dtype=jnp.float32,
) -> Optional[Array]:
    """Constant background policies (reference ray_rendering.py:23-108).

    policy in {'white', 'black', 'random', 'last_sample', 'none'}.
    Returns (N, 3) or None for 'none'. The learned bg-NeRF path is handled by
    the model container, not here.
    """
    p = str(policy).lower()
    if p == "white":
        return jnp.ones((n_rays, 3), dtype=dtype)
    if p == "black":
        return jnp.zeros((n_rays, 3), dtype=dtype)
    if p == "random":
        if key is None:
            raise ValueError("random background requires a PRNG key")
        return jax.random.uniform(key, (n_rays, 3), dtype=dtype)
    if p == "last_sample":
        if last_sample_rgb is None:
            raise ValueError("last_sample background requires sample colors")
        return last_sample_rgb
    if p == "none":
        return None
    raise ValueError(f"Unknown background policy: {policy!r}")


# --------------------------- full stratified renderer -----------------------
FieldFn = Callable[[Array, Array], Tuple[Array, Array]]
# FieldFn(points (M,3), dirs (M,3)) -> (rgb (M,3) in [0,1], sigma (M,) >= 0)


def render_rays_stratified(
    field_fn: FieldFn,
    rays: Array,  # (N, 8) packed
    ray_samples: int,
    key: Optional[jax.Array] = None,
    *,
    randomized: bool = False,
    bg_policy: str = "white",
    bg_fn: Optional[Callable[[Array], Array]] = None,  # dirs (N,3) -> (N,3)
    sigma_scale: float = 1.0,
) -> Tuple[Array, Array, Array, Array]:
    """Dense stratified renderer (reference ray_rendering.py:290-345).

    field_fn evaluates the (already parameter-bound) radiance field on flat
    points; bg_fn, if given, is a learned background model queried at the
    per-ray direction and overrides bg_policy.

    Invalid rays (near/far tagged inf or >= 1e9) render to the background with
    zero weights.
    """
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n_rays = o.shape[0]

    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    near_s = jnp.where(valid, near, 0.0)
    far_s = jnp.where(valid, far, 1.0)

    skey = bkey = None
    if key is not None:
        skey, bkey = jax.random.split(key)
    t_vals = stratified_t_vals(skey, near_s, far_s, ray_samples, randomized)
    pts = t_to_points(o, d, t_vals)  # (N, S, 3)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)

    rgb, sigma = field_fn(pts.reshape(-1, 3), dirs.reshape(-1, 3))
    rgb = rgb.reshape(n_rays, ray_samples, 3)
    sigma = sigma.reshape(n_rays, ray_samples)
    sigma = jnp.where(valid[:, None], sigma, 0.0)

    if bg_fn is not None:
        bg = bg_fn(d)
    else:
        bg = background_rgb(
            bg_policy, n_rays, key=bkey, last_sample_rgb=rgb[:, -1, :],
            dtype=rgb.dtype,
        )

    rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
    return volume_render(rgb_sigma, t_vals, bg_rgb=bg, sigma_scale=sigma_scale)


# --------------------------- hierarchical sampling ---------------------------
def sample_pdf(
    key: Optional[jax.Array],
    bins: Array,  # (N, B+1) sorted bin edges
    weights: Array,  # (N, B) nonnegative
    n_samples: int,
    randomized: bool = True,
    eps: float = 1e-5,
) -> Array:
    """Inverse-CDF sampling of the piecewise-constant pdf over `bins`.

    The classic NeRF fine-sampling step (BASELINE.json north star: "inverse-CDF
    hierarchical sampling"). TPU-first: static shapes, one vectorized
    searchsorted over the (B+1)-long CDF per ray — no per-ray Python. The
    result carries stop_gradient (sample PLACEMENT is not differentiated, as
    in the original NeRF).

    Returns t samples (N, n_samples), sorted along the last axis.
    """
    w = weights + eps  # avoid nans and keep every bin reachable
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    n_rays = bins.shape[0]
    if randomized:
        if key is None:
            raise ValueError("randomized sample_pdf requires a PRNG key")
        u = jax.random.uniform(key, (n_rays, n_samples), dtype=bins.dtype)
    else:
        u = jnp.linspace(0.0, 1.0 - 1e-6, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_samples))

    # searchsorted over the row-wise CDF: index of the bin containing u
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 2)
    above = jnp.clip(idx, 1, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, below, axis=-1)
    bin_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = jnp.where(cdf_hi - cdf_lo < 1e-10, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    samples = bin_lo + t * (bin_hi - bin_lo)
    return jax.lax.stop_gradient(jnp.sort(samples, axis=-1))


def render_rays_hierarchical(
    coarse_field_fn: FieldFn,
    fine_field_fn: Optional[FieldFn],
    rays: Array,  # (N, 8) packed
    n_coarse: int,
    n_fine: int,
    key: Optional[jax.Array] = None,
    *,
    randomized: bool = False,
    bg_policy: str = "white",
    sigma_scale: float = 1.0,
) -> Tuple[Tuple[Array, Array, Array, Array], Tuple[Array, Array, Array, Array]]:
    """Classic NeRF coarse-to-fine rendering (BASELINE.json "64+128
    coarse/fine hierarchical sampling").

    Pass 1 renders `n_coarse` stratified samples through `coarse_field_fn`;
    its compositing weights drive inverse-CDF placement of `n_fine` extra
    samples, and pass 2 renders the UNION of both sample sets (sorted,
    n_coarse + n_fine per ray — one fixed-shape program) through
    `fine_field_fn` (or the coarse field when None, the mip-NeRF
    single-network arrangement).

    Returns ((rgb, depth, weights, acc) coarse, (same) fine).
    """
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n_rays = o.shape[0]

    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    near_s = jnp.where(valid, near, 0.0)
    far_s = jnp.where(valid, far, 1.0)

    k_strat = k_pdf = k_bg = None
    if key is not None:
        k_strat, k_pdf, k_bg = jax.random.split(key, 3)

    t_c = stratified_t_vals(k_strat, near_s, far_s, n_coarse, randomized)

    def run(field_fn, t_vals, n_s):
        pts = t_to_points(o, d, t_vals)
        dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
        rgb, sigma = field_fn(pts.reshape(-1, 3), dirs.reshape(-1, 3))
        rgb = rgb.reshape(n_rays, n_s, 3)
        sigma = jnp.where(valid[:, None], sigma.reshape(n_rays, n_s), 0.0)
        bg = background_rgb(bg_policy, n_rays, key=k_bg,
                            last_sample_rgb=rgb[:, -1, :], dtype=rgb.dtype)
        rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
        return volume_render(rgb_sigma, t_vals, bg_rgb=bg,
                             sigma_scale=sigma_scale)

    coarse_out = run(coarse_field_fn, t_c, n_coarse)
    weights_c = coarse_out[2]

    mids = 0.5 * (t_c[:, 1:] + t_c[:, :-1])  # (N, Sc-1) interior edges
    t_f = sample_pdf(k_pdf, mids, weights_c[:, 1:-1], n_fine,
                     randomized=randomized)
    t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)

    fine_out = run(fine_field_fn or coarse_field_fn, t_all, n_coarse + n_fine)
    return coarse_out, fine_out
