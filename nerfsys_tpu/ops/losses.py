"""Training losses over rendered rays.

Counterpart of /root/reference/adaptive_nerf/nerfs/losses.py: render a packed
ray batch, align prediction/GT color spaces, MSE. Expressed as pure functions
of (field_fn, rays, rgbs) so jax.grad/vmap compose through them — this is the
loss the meta inner loop differentiates.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.color_space import color_space_transformer
from nerfsys_tpu.ops.volrend import render_rays_stratified

Array = jax.Array


def mse(pred: Array, gt: Array) -> Array:
    return jnp.mean(jnp.square(pred - gt))


def psnr_from_mse(m: Array) -> Array:
    """PSNR = -10 log10(mse + 1e-24), reference utils.py:538-539."""
    return -10.0 * jnp.log10(m + 1e-24)


def psnr(pred: Array, gt: Array) -> Array:
    return psnr_from_mse(mse(pred, gt))


def compute_mse_loss(
    field_fn,
    rays: Array,  # (N, 8)
    rgbs: Array,  # (N, 3) GT sRGB in [0,1]
    *,
    ray_samples: int,
    key: Optional[jax.Array] = None,
    randomized: bool = False,
    color_space: str = "srgb",
    bg_policy: str = "white",
    bg_fn=None,
    sigma_scale: float = 1.0,
    binary_fn=None,  # occupancy query (pts (M,3) -> bool); None = stratified
    occ_on=None,  # traced bool: occupancy grid ready (render_rays dispatch)
    value_fn=None,  # EMA density query: importance-weighted occ sampling
    occ_cdf=None,  # precomputed probe CDF (fixed rays+grid: the inner loop)
    occ_probe_mask: bool = False,  # interval-bit masking (no grid re-query)
    occ_hard_mask: bool = True,  # False: pure importance sampling
    occ_ray_floor: float = 0.25,  # whole-ray pdf floor in the soft mode
    n_probes: int = 128,
    pair_fn=None,  # fused (occ, value) probe: one 2-wide row per point
) -> Tuple[Array, dict]:
    """Render support/query rays and compute color-space-aligned MSE.

    Returns (loss, aux) where aux carries rgb_map/psnr for logging.
    Spec: reference losses.py:10-32; when an occupancy field is provided the
    renderer dispatch mirrors reference render_rays (ray_rendering.py:564-574):
    stratified warmup until occ_on, occupancy-guided after.
    """

    def strat():
        return render_rays_stratified(
            field_fn,
            rays,
            ray_samples,
            key=key,
            randomized=randomized,
            bg_policy=bg_policy,
            bg_fn=bg_fn,
            sigma_scale=sigma_scale,
        )

    if binary_fn is None:
        rgb_map, depth, weights, acc = strat()
    else:
        from nerfsys_tpu.ops.occupancy import render_rays_occ_field

        def occ():
            return render_rays_occ_field(
                field_fn, binary_fn, rays, ray_samples, key,
                randomized=randomized, n_probes=n_probes,
                bg_policy=bg_policy, bg_fn=bg_fn, sigma_scale=sigma_scale,
                value_fn=value_fn, cdf_state=occ_cdf,
                mask_from_probes=occ_probe_mask,
                hard_mask=occ_hard_mask,
                ray_floor=0.0 if occ_hard_mask else occ_ray_floor,
                pair_fn=pair_fn,
            )

        if occ_on is None:
            rgb_map, depth, weights, acc = occ()
        else:
            rgb_map, depth, weights, acc = jax.lax.cond(occ_on, occ, strat)
    pred, gt = color_space_transformer(rgb_map, rgbs, color_space)
    loss = mse(pred, gt)
    aux = {
        "rgb_map": rgb_map,
        "depth_map": depth,
        "acc_map": acc,
        "psnr": psnr_from_mse(jax.lax.stop_gradient(loss)),
    }
    return loss, aux
