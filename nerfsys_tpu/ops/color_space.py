"""sRGB <-> linear conversions and loss-space alignment.

JAX counterpart of /root/reference/adaptive_nerf/nerfs/color_space.py. The
renderer predicts linear RGB; 8-bit ground truth is sRGB. The transformer
converts exactly ONE side so loss and metrics are computed in one space.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def linear_to_srgb(x: Array) -> Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(x: Array) -> Array:
    return jnp.where(
        x <= 0.04045,
        x / 12.92,
        jnp.power(jnp.maximum((x + 0.055) / 1.055, 1e-12), 2.4),
    )


def color_space_transformer(
    pred_linear: Array, gt_srgb: Array, color_space: str
) -> Tuple[Array, Array]:
    """Bring (prediction, GT) into the requested common color space.

    pred_linear: prediction in linear space; gt_srgb: GT in sRGB [0,1].
    color_space in {'linear', 'srgb', 'identity'} (reference semantics).
    """
    cs = str(color_space).lower()
    pred32 = pred_linear.astype(jnp.float32)
    gt32 = jnp.clip(gt_srgb.astype(jnp.float32), 0.0, 1.0)

    if cs == "linear":
        pred = jnp.clip(pred32, 0.0, 1.0)
        gt = jnp.clip(srgb_to_linear(gt32), 0.0, 1.0)
    elif cs == "srgb":
        pred = jnp.clip(linear_to_srgb(pred32), 0.0, 1.0)
        gt = gt32
    elif cs == "identity":
        pred = pred32
        gt = gt32
    else:
        raise ValueError(
            f"Invalid color_space={color_space!r}; use 'linear'|'srgb'|'identity'"
        )
    return pred.astype(pred_linear.dtype), gt.astype(pred_linear.dtype)
