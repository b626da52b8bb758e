"""Mip-NeRF: conical-frustum (integrated) positional encoding, TPU-first.

BASELINE.json north-star config 4: "Mip-NeRF variant: integrated positional
encoding / conical frustum sampling in the same fused kernel". The reference
repo (NeRF-Sys) has no mip path; this module implements the public
mip-NeRF recipe (Barron et al. 2021) natively in JAX:

  - each ray interval [t0, t1] becomes a conical frustum approximated by a
    Gaussian (mean along the ray + diagonal covariance),
  - the positional encoding of that Gaussian is computed in expectation:
    E[sin(2^k x)] = sin(2^k mu) * exp(-0.5 * 4^k var) — high frequencies are
    attenuated where the footprint is wide, which is what removes aliasing,
  - coarse and fine levels share ONE network; the fine level resamples the
    blurred coarse weight histogram (inverse CDF over the interval edges).

Everything is shape-static elementwise math on (N, S) arrays — XLA fuses the
frustum statistics, the encoding, and the MLP input assembly into the
surrounding program; no special kernel is needed on TPU (the op mix is
VPU-bound elementwise + the MLP matmuls on the MXU).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.volrend import (
    background_rgb,
    sample_pdf,
    volume_render,
)

Array = jax.Array


# --------------------------- frustum Gaussians ------------------------------
def conical_frustum_to_gaussian(
    t0: Array,  # (N, S) interval starts
    t1: Array,  # (N, S) interval ends
    base_radius: Array,  # (N, 1) cone radius at t=1 (pixel footprint)
) -> Tuple[Array, Array]:
    """Gaussian approximation of the conical frustum between t0 and t1.

    Returns (t_mean (N,S), (t_var, r_var) each (N,S)) in the stable
    midpoint-parameterized form of the mip-NeRF paper (eq. 7).
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    denom = 3.0 * mu**2 + hw**2
    t_mean = mu + (2.0 * mu * hw**2) / denom
    t_var = hw**2 / 3.0 - (4.0 / 15.0) * (
        hw**4 * (12.0 * mu**2 - hw**2) / denom**2
    )
    r_var = base_radius**2 * (
        mu**2 / 4.0 + (5.0 / 12.0) * hw**2 - (4.0 / 15.0) * hw**4 / denom
    )
    return t_mean, (t_var, r_var)


def lift_gaussian(
    d: Array,  # (N, 3)
    t_mean: Array,  # (N, S)
    t_var: Array,  # (N, S)
    r_var: Array,  # (N, S)
    o: Array,  # (N, 3)
) -> Tuple[Array, Array]:
    """Lift 1-D ray Gaussians to world space (diagonal covariance).

    mean = o + d * t_mean; cov_diag = t_var * d d^T + r_var * (I - d d^T / |d|^2)
    (diagonals only — the IPE uses only the diagonal).
    """
    mean = o[:, None, :] + d[:, None, :] * t_mean[..., None]
    d2 = d**2
    d_norm2 = jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-10)
    d_outer_diag = d2  # (N, 3)
    null_outer_diag = 1.0 - d2 / d_norm2
    cov_diag = (
        t_var[..., None] * d_outer_diag[:, None, :]
        + r_var[..., None] * null_outer_diag[:, None, :]
    )
    return mean, cov_diag


def cast_rays(
    t_edges: Array,  # (N, S+1) interval edges
    o: Array,  # (N, 3)
    d: Array,  # (N, 3)
    base_radius: Array,  # (N, 1)
) -> Tuple[Array, Array]:
    """Interval edges -> per-sample world Gaussians (means (N,S,3),
    cov_diag (N,S,3))."""
    t0, t1 = t_edges[..., :-1], t_edges[..., 1:]
    t_mean, (t_var, r_var) = conical_frustum_to_gaussian(t0, t1, base_radius)
    return lift_gaussian(d, t_mean, t_var, r_var, o)


# --------------------------- integrated PE ----------------------------------
def ipe_encode(
    means: Array,  # (..., 3)
    cov_diag: Array,  # (..., 3)
    min_deg: int = 0,
    max_deg: int = 16,
) -> Array:
    """Integrated positional encoding of a diagonal Gaussian.

    [sin(2^k mu), cos(2^k mu)] * exp(-0.5 * 4^k var) for k in
    [min_deg, max_deg). With cov_diag == 0 this reduces exactly to the plain
    sin/cos frequency encoding (pinned by tests). Output (..., 2 * 3 * L).
    """
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=means.dtype)
    y = means[..., None, :] * scales[:, None]  # (..., L, 3)
    y_var = cov_diag[..., None, :] * scales[:, None] ** 2
    shape = means.shape[:-1] + (-1,)
    y = y.reshape(shape)
    y_var = y_var.reshape(shape)
    atten = jnp.exp(-0.5 * y_var)
    return jnp.concatenate([jnp.sin(y) * atten, jnp.cos(y) * atten], axis=-1)


def ipe_out_dim(min_deg: int = 0, max_deg: int = 16) -> int:
    return 2 * 3 * (max_deg - min_deg)


# --------------------------- level resampling -------------------------------
def resample_edges(
    key: Optional[jax.Array],
    t_edges: Array,  # (N, S+1)
    weights: Array,  # (N, S) coarse compositing weights
    n_samples: int,
    randomized: bool = True,
    blur_padding: float = 0.01,
) -> Array:
    """Mip-NeRF fine-level edge resampling.

    The coarse weight histogram is max-blurred with its neighbors and padded
    so the fine pdf never collapses onto knife-edge bins, then inverse-CDF
    sampled over the interval EDGES (mip-NeRF samples edges, not midpoints).
    Returns new edges (N, n_samples + 1), sorted.
    """
    w_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1
    )
    w_max = jnp.maximum(w_pad[..., :-1], w_pad[..., 1:])
    w_blur = 0.5 * (w_max[..., :-1] + w_max[..., 1:]) + blur_padding
    return sample_pdf(key, t_edges, w_blur, n_samples + 1,
                      randomized=randomized)


# --------------------------- renderer ---------------------------------------
MipFieldFn = Callable[[Array, Array, Array], Tuple[Array, Array]]
# MipFieldFn(means (M,3), cov_diag (M,3), dirs (M,3)) -> (rgb (M,3), sigma (M,))


def render_rays_mip(
    field_fn: MipFieldFn,
    rays: Array,  # (N, 8) packed
    base_radius: Array,  # (N, 1) cone radius at unit distance
    n_samples: int,
    key: Optional[jax.Array] = None,
    *,
    n_levels: int = 2,
    randomized: bool = False,
    bg_policy: str = "white",
) -> Tuple[Tuple[Array, Array, Array, Array], ...]:
    """Two-level mip-NeRF rendering through ONE shared network.

    Level 0 places n_samples stratified intervals in [near, far]; each further
    level resamples the previous level's blurred weights. Every level returns
    the full (rgb, depth, weights, acc) tuple; the LAST entry is the rendered
    output, all levels are supervised during training (mip-NeRF trains
    coarse + fine with equal data through the shared MLP).
    """
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n_rays = o.shape[0]

    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near) & (far < 1e9)
    near_s = jnp.where(valid, near, 0.0)
    far_s = jnp.where(valid, far, 1.0)

    keys = (
        list(jax.random.split(key, 2 * n_levels)) if key is not None
        else [None] * (2 * n_levels)
    )

    # level-0 stratified EDGES (S+1 per ray)
    lin = jnp.linspace(0.0, 1.0, n_samples + 1, dtype=o.dtype)[None, :]
    edges = near_s[:, None] * (1.0 - lin) + far_s[:, None] * lin
    if randomized:
        if keys[0] is None:
            raise ValueError("randomized mip rendering requires a PRNG key")
        # per-edge stratified jitter BOUNDED to [near, far] (the mip-NeRF
        # scheme: each edge moves within the bracket of its neighbors'
        # midpoints, endpoints stay inside their half-bins) — a whole-
        # lattice shift would push the last interval past far
        mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
        upper = jnp.concatenate([mids, edges[:, -1:]], axis=1)
        lower = jnp.concatenate([edges[:, :1], mids], axis=1)
        u = jax.random.uniform(keys[0], (n_rays, n_samples + 1),
                               dtype=o.dtype)
        edges = lower + (upper - lower) * u

    outs = []
    for lvl in range(n_levels):
        if lvl > 0:
            edges = resample_edges(
                keys[2 * lvl], edges, outs[-1][2], n_samples,
                randomized=randomized,
            )
        means, cov_diag = cast_rays(edges, o, d, base_radius)
        dirs = jnp.broadcast_to(d[:, None, :], means.shape)
        rgb, sigma = field_fn(
            means.reshape(-1, 3), cov_diag.reshape(-1, 3), dirs.reshape(-1, 3)
        )
        rgb = rgb.reshape(n_rays, n_samples, 3)
        sigma = jnp.where(valid[:, None], sigma.reshape(n_rays, n_samples), 0.0)
        t_mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
        bg = background_rgb(bg_policy, n_rays, key=keys[2 * lvl + 1],
                            last_sample_rgb=rgb[:, -1, :], dtype=rgb.dtype)
        rgb_sigma = jnp.concatenate([rgb, sigma[..., None]], axis=-1)
        dists = edges[..., 1:] - edges[..., :-1]
        outs.append(
            volume_render(rgb_sigma, t_mids, bg_rgb=bg, dists=dists)
        )
    return tuple(outs)


def pixel_base_radius(fx: float, fy: float) -> float:
    """Cone base radius at unit depth for a pixel footprint: the mip-NeRF
    convention is pixel_width / sqrt(12) (variance-matched disc)."""
    return float(2.0 / (fx + fy) * (2.0 / 12.0**0.5))
