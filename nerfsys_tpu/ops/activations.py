"""Numerically hardened activations for NeRF density heads.

`trunc_exp` is the σ activation used by Instant-NGP style fields: an exp whose
input AND gradient are computed at the clamped input, so a runaway logit can
never produce inf in either pass. Counterpart of the reference's custom
autograd Function (/root/reference/adaptive_nerf/models/trunc_exp.py:30-61),
expressed as a `jax.custom_vjp`.

Clamp bounds are dtype-aware (log of the dtype max), matching the reference
table: fp16 -> ~log(65504), bf16/fp32 -> ~log(3.4e38), fp64 -> ~709.78.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# log(dtype max), shaved slightly below the exact bound so exp() rounding can
# never overflow to inf (jnp.exp(88.7228) rounds to inf in float32).
_EXP_MAX = {
    jnp.float16.dtype: 11.089866488,
    jnp.bfloat16.dtype: 88.7,
    jnp.float32.dtype: 88.7,
    jnp.float64.dtype: 709.782712893,
}


def _exp_clamp(x: jax.Array) -> jax.Array:
    m = _EXP_MAX.get(x.dtype, _EXP_MAX[jnp.float32.dtype])
    return jnp.clip(x, -m, m)


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(_exp_clamp(x))


def _trunc_exp_fwd(x):
    xc = _exp_clamp(x)
    y = jnp.exp(xc)
    return y, y  # save exp(xc) as residual


def _trunc_exp_bwd(y, g):
    return (g * y,)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
